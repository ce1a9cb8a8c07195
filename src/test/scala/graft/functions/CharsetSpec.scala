package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** X18/X19 charset expressions + the [[Charsets]] resolution policy:
  * web-alias mapping, UTF-8 fallback for unknown labels, U+FFFD on
  * malformed bytes, replacement bytes on unmappable chars — all
  * deterministic and total (one bad byte costs one glyph, never the
  * record or the task).
  */
class CharsetSpec extends SparkTestBase {
  import spark.implicits._

  test("resolve: web aliases land on the right JVM charsets; unknown is None") {
    assert(Charsets.resolve("latin-1").map(_.name()) == Some("ISO-8859-1"))
    assert(Charsets.resolve(" \"Latin1\" ").map(_.name()) == Some("ISO-8859-1"))
    assert(Charsets.resolve("SJIS").map(_.name()) == Some("Shift_JIS"))
    assert(Charsets.resolve("shift_jis").map(_.name()) == Some("Shift_JIS"))
    // WHATWG: gb2312 labels promote to GBK (its superset)
    assert(Charsets.resolve("gb2312").map(_.name()) == Some("GBK"))
    assert(Charsets.resolve("UTF8").map(_.name()) == Some("UTF-8"))
    assert(Charsets.resolve("cp1252").map(_.name()) == Some("windows-1252"))
    assert(Charsets.resolve("x-unknown-enc").isEmpty)
    assert(Charsets.resolve("").isEmpty)
    // negative result is cached, second lookup identical
    assert(Charsets.resolve("x-unknown-enc").isEmpty)
  }

  test("charset_decode: legacy encodings round-trip; unknown label falls back to UTF-8") {
    val sjis = "カタカナ text"
    val w1252 = "€“smart”"
    val rows = Seq(
      (sjis.getBytes("Shift_JIS"), "sjis", sjis),
      (w1252.getBytes("windows-1252"), "CP1252", w1252),
      ("café".getBytes("ISO-8859-1"), "latin-1", "café"),
      ("plain".getBytes("UTF-8"), "x-unknown-enc", "plain")
    ).toDF("bin", "label", "expected")
    val out = rows.select(
      GraftExpressions.charsetDecode($"bin", $"label").as("got"), $"expected")
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"decode mismatch: got '${r.getString(0)}' want '${r.getString(1)}'"))
  }

  test("charset_decode: malformed bytes become U+FFFD, not an error") {
    // 0xC3 alone is a dangling UTF-8 lead byte
    val got = Seq(Tuple1(Array(0x61.toByte, 0xC3.toByte))).toDF("bin")
      .select(GraftExpressions.charsetDecode($"bin", lit("utf-8")))
      .as[String].head()
    assert(got == "a�", s"got ${got.map(_.toInt.toHexString)}")
  }

  test("charset_encode: emits the labeled bytes; unmappable chars take the replacement byte") {
    val enc = Seq(("€ ok", "windows-1252"), ("カ", "latin-1"))
      .toDF("s", "label")
      .select(GraftExpressions.charsetEncode($"s", $"label")).as[Array[Byte]]
      .collect()
    assert(enc(0).head == 0x80.toByte) // euro in cp1252
    assert(enc(1).sameElements("?".getBytes("US-ASCII"))) // katakana unmappable in latin-1
  }

  test("charset_known flags fallback-decoded labels; SQL registration serves all three") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT charset_known('sjis') AS a, charset_known('x-nope') AS b, " +
        "charset_decode(charset_encode('résumé', 'latin-1'), 'ISO-8859-1') AS c")
      .head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getString(2) == "résumé")
  }
}
