package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** t01 v2 script detection: Unicode-script char classes, kana-first
  * precedence (Japanese mixes kanji with kana), the MinScriptChars
  * noise floor, and the script → language mapping over the stopword
  * fallback.
  */
class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  private def detect(texts: String*): Seq[(String, String)] =
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "text")
      .withColumn("words", expr("filter(split(text, ' '), x -> x <> '')"))
      .orderBy($"i")
      .select(TextAnalysis.scriptOf($"text"), TextAnalysis.langOf($"text", $"words"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("each script sample maps to its script and language") {
    val got = detect(
      "これは にほんごの ぶんしょう です",
      "的是在了和有我他这不",
      "이것은 한국어 문장 입니다",
      "это русский текст пример",
      "هذا نص عربي بسيط",
      "αυτο ειναι ελληνικο κειμενο",
      "זהו טקסט בעברית פשוט",
      "यह हिंदी पाठ है",
      "นี่คือข้อความภาษาไทย")
    assert(got == Seq(
      ("kana", "ja"), ("han", "zh"), ("hangul", "ko"), ("cyrillic", "ru"),
      ("arabic", "ar"), ("greek", "el"), ("hebrew", "he"),
      ("devanagari", "hi"), ("thai", "th")), s"got $got")
  }

  test("kana precedence: kanji-heavy Japanese with a little kana is ja, pure kanji is zh") {
    val got = detect(
      "日本語の文章です これは記事", // kanji-dominant but kana present
      "中文文章没有假名字符在这里")   // pure han
    assert(got == Seq(("kana", "ja"), ("han", "zh")), s"got $got")
  }

  test("noise floor: under MinScriptChars foreign chars stay latin + stopword argmax") {
    val got = detect(
      "the weather report with 中文 inside stays english of the day",
      "der bericht ist von der tagesschau mit einem wort 的")
    assert(got == Seq(("latin", "en"), ("latin", "de")), s"got $got")
  }

  test("stopword argmax: profile order breaks ties deterministically; empty text is en") {
    val got = detect(
      "le chat est dans la maison pour une nuit",
      "si nu este la fel cu un text din care nu",
      "")
    assert(got(0) == (("latin", "fr")), s"got ${got(0)}")
    assert(got(1) == (("latin", "ro")), s"got ${got(1)}")
    assert(got(2) == (("latin", "en")), s"got ${got(2)}")
  }
}
