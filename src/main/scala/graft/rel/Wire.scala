package graft.rel

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Statement wire transport — the analog of the reference's protobuf
  * statement serialization (reference/rel/sql_proto_test.go,
  * reference/plan/plan.go:59-62), re-thought for a Spark engine.
  *
  * The reference ships protobuf ASTs because its executor federates
  * query fragments across processes itself. On Spark that layer is the
  * framework's: Catalyst plans (and their shuffles) serialize
  * internally, so the only statement-level transport a user still
  * needs is "send this statement to another session and know it
  * arrived intact". The codec therefore frames the canonical printed
  * SQL — print→parse is lossless (oracle-gated by ql_tosql_roundtrip
  * and SqlWriterSpec) — with a magic/version header plus TWO checks:
  * a content hash of the SQL bytes (so ANY flipped byte or truncation
  * fails loudly — the fingerprint alone is literal-erased and would
  * accept a corrupted literal) and the statement fingerprint (so a
  * printer/parser drift between versions fails even when the bytes
  * arrive intact).
  *
  * Frame: [magic:2][version:1][sqlhash:8][fingerprint:8][len:4]
  * [sql:len] — 23 bytes of framing, self-describing,
  * schema-evolution-safe (bump the version byte). Domain = the
  * printable statements (SELECT and chains, set-ops, FILTER,
  * DESCRIBE/USE/SET/DROP) — the same family the reference wire-ships
  * to remote sources.
  */
object Wire {

  private val Magic: Short = 0x4752 // "GR"
  // version 2: the r8 content-hash field changed the header layout
  // (15 -> 23 bytes) — bumped per the codec's own evolution contract so
  // an old-layout payload fails with unsupported-version, not a
  // misleading length/hash error
  private val Version: Byte = 2
  private val HeaderLen = 2 + 1 + 8 + 8 + 4

  /** First 8 bytes of MD5 over the payload bytes — the content check. */
  private def contentHash(sql: Array[Byte]): Long =
    ByteBuffer.wrap(java.security.MessageDigest.getInstance("MD5").digest(sql))
      .getLong

  /** Serialize a statement to its framed wire form. */
  def encode(st: Statement): Array[Byte] = {
    val sql = SqlWriter.toSql(st).getBytes(UTF_8)
    val buf = ByteBuffer.allocate(HeaderLen + sql.length)
    buf.putShort(Magic).put(Version).putLong(contentHash(sql))
      .putLong(Fingerprint.id(st)).putInt(sql.length).put(sql)
    buf.array()
  }

  /** Parse a framed wire payload back to a statement, verifying magic,
    * version, length, content hash, and fingerprint. */
  def decode(bytes: Array[Byte]): Statement = {
    if (bytes.length < HeaderLen)
      throw new IllegalArgumentException(s"wire payload truncated: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.getShort()
    if (magic != Magic)
      throw new IllegalArgumentException(f"not a graft wire payload (magic 0x$magic%04x)")
    val version = buf.get()
    if (version != Version)
      throw new IllegalArgumentException(s"unsupported wire version $version (expected $Version)")
    val sqlHash = buf.getLong()
    val fp = buf.getLong()
    val len = buf.getInt()
    if (len < 0 || len != buf.remaining())
      throw new IllegalArgumentException(
        s"wire length mismatch: header says $len, payload has ${buf.remaining()}")
    val sqlBytes = new Array[Byte](len)
    buf.get(sqlBytes)
    if (contentHash(sqlBytes) != sqlHash)
      throw new IllegalArgumentException(
        "wire content-hash mismatch: payload corrupt")
    val st = SqlParser.parse(new String(sqlBytes, UTF_8))
    if (Fingerprint.id(st) != fp)
      throw new IllegalArgumentException(
        "wire fingerprint mismatch: printer/parser drift")
    st
  }
}
