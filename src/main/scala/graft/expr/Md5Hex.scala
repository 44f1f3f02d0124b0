package graft.expr

import java.nio.charset.StandardCharsets

/** Driver-side twin of the oracle-parity md5 recipe: the first 15 hex
  * chars (60 bits) of the digest as a non-negative Long — identical to
  * DuckDB's `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)` and to the
  * Column form `graft.ops.Dedup.md5Hash60`. Every JVM call site that must
  * stay bit-compatible with a SQL oracle derives through here, so the
  * recipe cannot drift in one copy.
  */
object Md5Hex {

  def long60(bytes: Array[Byte]): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def long60(s: String): Long = long60(s.getBytes(StandardCharsets.UTF_8))
}
