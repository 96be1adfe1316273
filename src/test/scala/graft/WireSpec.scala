package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rel.{SqlParser, Wire}

/** Ports the reference's protobuf statement round-trip
  * (rel/sql_proto_test.go): encode → decode must preserve the AST, and
  * a damaged payload must fail loudly instead of decoding to a
  * different query.
  */
class WireSpec extends AnyFunSuite {

  private val statements = Seq(
    "SELECT a, b AS bee FROM t WHERE a > 5 ORDER BY b DESC LIMIT 10",
    "SELECT DISTINCT source FROM documents",
    "SELECT u.user_id, o.price FROM users AS u INNER JOIN orders AS o ON u.user_id = o.user_id",
    "SELECT a FROM t1 CROSS JOIN t2",
    "SELECT count(*) AS ct, source FROM docs GROUP BY source HAVING count(*) > 2",
    "SELECT a FROM t LIMIT 5 OFFSET 10",
    "SELECT a FROM x UNION SELECT a FROM y",
    """FILTER AND (x > 5, y < 2) FROM users LIMIT 10""",
    "DESCRIBE mytable",
    "USE mydb",
    "SET @v = 7",
    "DROP TABLE oldtable")

  test("encode -> decode preserves the AST for every printable statement kind") {
    for (s <- statements) {
      val ast = SqlParser.parse(s)
      val decoded = Wire.decode(Wire.encode(ast))
      assert(decoded == ast, s"wire round-trip diverged for: $s")
    }
  }

  test("decode rejects corruption, truncation, bad magic, and bad version") {
    val good = Wire.encode(SqlParser.parse("SELECT a FROM t WHERE a > 5"))
    // flipped byte inside the SQL body -> content-hash failure
    val corrupt = good.clone()
    corrupt(good.length - 3) = (corrupt(good.length - 3) ^ 0x01).toByte
    intercept[Exception] { Wire.decode(corrupt) }
    // a corrupted LITERAL must fail too — the literal-erased fingerprint
    // alone would accept it (the content hash is what catches it)
    val litFlip = good.clone()
    // search past the 23-byte binary header so a hash byte that
    // happens to equal '5' can never be the one flipped
    val digitAt = litFlip.indexWhere(_ == '5'.toByte, 23)
    assert(digitAt >= 23)
    litFlip(digitAt) = '4'.toByte
    val ex = intercept[IllegalArgumentException] { Wire.decode(litFlip) }
    assert(ex.getMessage.contains("content-hash"), ex.getMessage)
    // truncated payload -> length mismatch
    intercept[IllegalArgumentException] { Wire.decode(good.dropRight(4)) }
    intercept[IllegalArgumentException] { Wire.decode(good.take(3)) }
    // wrong magic
    val badMagic = good.clone(); badMagic(0) = 0x00
    intercept[IllegalArgumentException] { Wire.decode(badMagic) }
    // unsupported version
    val badVer = good.clone(); badVer(2) = 99
    intercept[IllegalArgumentException] { Wire.decode(badVer) }
  }

  test("fingerprint survives literal changes but the payload does not") {
    // two statements with different literals share a fingerprint
    // (literal-erased), yet decode returns each exact statement
    val a = SqlParser.parse("SELECT x FROM t WHERE x > 5")
    val b = SqlParser.parse("SELECT x FROM t WHERE x > 99")
    assert(graft.rel.Fingerprint.id(a) == graft.rel.Fingerprint.id(b))
    assert(Wire.decode(Wire.encode(a)) == a)
    assert(Wire.decode(Wire.encode(b)) == b)
    assert(Wire.decode(Wire.encode(a)) != b)
  }
}
