package graft

import java.sql.DriverManager
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftSession

/** JDBC source coverage — the Spark-native equivalent of the reference's
  * SQLite full-pushdown source (/root/reference/datasource/sqlite/
  * sqlrewrite.go:16-66 rewrites the statement so the WHERE travels to
  * the database; conn.go executes it remotely). Spark's JDBC relation
  * does the same rewriting natively: filters and column pruning are
  * pushed into the generated remote SQL, which the plan records as
  * PushedFilters on the JDBCRelation scan.
  *
  * Uses embedded Derby (ships with Spark's jars) as the database:
  * sqlite-jdbc is unreachable offline, and the pushdown contract under
  * test is driver-agnostic.
  */
class JdbcSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private lazy val url: String = {
    val dbDir = java.nio.file.Files.createTempDirectory("graft-derby").toString
    val u = s"jdbc:derby:$dbDir/db;create=true"
    val c = DriverManager.getConnection(u)
    val st = c.createStatement()
    st.execute("CREATE TABLE users (id INT, name VARCHAR(32), age INT, city VARCHAR(32))")
    val ins = c.prepareStatement("INSERT INTO users VALUES (?, ?, ?, ?)")
    val rows = Seq((1, "aaron", 22, "sf"), (2, "bella", 40, "nyc"),
      (3, "carl", 31, "sf"), (4, "dana", 17, "la"), (5, "emma", 55, "nyc"))
    rows.foreach { case (i, n, a, ct) =>
      ins.setInt(1, i); ins.setString(2, n); ins.setInt(3, a); ins.setString(4, ct)
      ins.executeUpdate()
    }
    c.close()
    u
  }

  private lazy val gs: GraftSession = {
    val s = new GraftSession(spark)
    s.registerJdbc("users", url, "users")
    s
  }

  test("jdbc source answers engine-dialect SQL") {
    val rows = gs.sql("SELECT name, age FROM users WHERE age >= 30 ORDER BY age DESC")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows == Seq(("emma", 55), ("bella", 40), ("carl", 31)))
  }

  test("filters and projection push down into the remote JDBC query") {
    // same contract the reference proves for SQLite: the WHERE must be
    // rewritten into the database's SQL, not applied post-scan
    val df = gs.sql("SELECT name FROM users WHERE age > 30 AND city = \"nyc\"")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters:"), "no pushdown on the JDBC scan:\n" + p)
    assert(p.contains("GreaterThan(AGE,30)") || p.contains("GreaterThan(age,30)"),
      "age filter not pushed to the database:\n" + p)
    assert(p.contains("EqualTo(CITY,nyc)") || p.contains("EqualTo(city,nyc)"),
      "city filter not pushed to the database:\n" + p)
    // column pruning: the JDBC scan's output column list (printed on
    // the JDBCRelation line) must not carry the unused ID column — the
    // remote query selects only what the statement needs
    val scanLine = p.linesIterator.find(_.contains("JDBCRelation"))
    assert(scanLine.isDefined, "no JDBC scan in the plan:\n" + p)
    assert(!"""\bID#""".r.findFirstIn(scanLine.get).isDefined,
      "unpruned JDBC scan (ID still read):\n" + scanLine.get)
    assert(scanLine.get.contains("NAME#"), "projected column missing:\n" + scanLine.get)
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("bella", "emma"))
  }

  test("jdbc table joins registered parquet tables in one statement") {
    gs.registerParquet("nation", "/root/testdata/sf0.001/nation.parquet")
    val df = gs.sql(
      "SELECT u.name, n.n_name FROM users u JOIN nation n ON u.id = n.n_nationkey WHERE u.age < 25")
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.map(_._1) == Set("aaron", "dana"))
  }

  test("aggregation over the jdbc source") {
    val rows = gs.sql("SELECT city, count(*) AS n, avg(age) AS avg_age FROM users GROUP BY city")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == Map("sf" -> 2L, "nyc" -> 2L, "la" -> 1L))
  }
}
