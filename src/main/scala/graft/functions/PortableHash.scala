package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-neutral 60-bit hash: the first 15 hex chars of md5, decoded
  * to a signed BIGINT. Spark uses conv(); DuckDB (no hex→int conv)
  * decodes digit-by-digit with shifts — same value bit-for-bit, so
  * hash-derived operators (simhash, stratified sampling) carry full
  * value-level oracles. 15 hex digits = 60 bits < 2^63: no sign issues
  * in either engine.
  */
object PortableHash {

  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side JVM twin of [[hash60]] over a string value — for
    * bounded routing tables (e.g. the lexical probe's query-term →
    * bucket map) computed without a Spark job. Bit-equal to the
    * Column form (PortableHashSpec pins it).
    */
  def hash60Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL computing the identical value over expression `e`. */
  def sqlHash60(e: String): String =
    s"CAST(list_aggregate(list_transform(generate_series(1, 15), " +
      s"i -> (CAST(strpos('0123456789abcdef', substr(md5($e), CAST(i AS INT), 1)) AS BIGINT) - 1) " +
      s"<< (4 * (15 - i))), 'sum') AS BIGINT)"
}
