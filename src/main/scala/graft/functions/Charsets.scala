package graft.functions

import java.nio.charset.{Charset, StandardCharsets}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.unsafe.types.UTF8String

/** Charset name resolution + byte/text conversion for the X18/X19
  * expressions ([[CharsetDecode]]/[[CharsetEncode]]) — the runtime
  * behind charset-aware crawl ingestion (a large fraction of the real
  * web is not UTF-8; Content-Type/meta labels use a zoo of aliases).
  *
  * Policy (deterministic, never throws):
  *  - names are trimmed, unquoted, lowercased, then mapped through a
  *    web-alias table (latin-1 to ISO-8859-1, sjis to Shift_JIS,
  *    gb2312 to GBK per the WHATWG encoding spec, ...) before the JVM
  *    lookup — `Charset.forName` knows the IANA aliases but not the
  *    sloppy web forms;
  *  - unknown/unsupported labels fall back to UTF-8 (the caller can
  *    flag them via [[isKnown]]);
  *  - decode replaces malformed/unmappable input with U+FFFD, encode
  *    replaces unmappable chars with the charset's replacement byte —
  *    the `new String`/`getBytes` REPLACE defaults: one bad byte must
  *    cost one glyph, not the record.
  */
object Charsets {

  /** Sloppy-web label to canonical JVM charset name. Keys are already
    * normalized (lowercase, no quotes/space). gb2312/gb-2312 map to
    * GBK (its superset) per the WHATWG encoding living standard —
    * real pages labeled gb2312 routinely use GBK-only code points.
    */
  private[graft] val WebAliases: Map[String, String] = Map(
    "latin-1" -> "ISO-8859-1", "latin1" -> "ISO-8859-1", "l1" -> "ISO-8859-1",
    "iso8859-1" -> "ISO-8859-1", "iso_8859-1" -> "ISO-8859-1",
    "iso-8859-1" -> "ISO-8859-1", "ansi" -> "windows-1252",
    "utf8" -> "UTF-8", "utf-8" -> "UTF-8", "unicode-1-1-utf-8" -> "UTF-8",
    "utf16" -> "UTF-16", "utf-16" -> "UTF-16",
    "utf-16le" -> "UTF-16LE", "utf-16be" -> "UTF-16BE",
    "shift-jis" -> "Shift_JIS", "shift_jis" -> "Shift_JIS",
    "sjis" -> "Shift_JIS", "x-sjis" -> "Shift_JIS", "ms_kanji" -> "Shift_JIS",
    "windows-31j" -> "windows-31j", "cp932" -> "windows-31j",
    "gb2312" -> "GBK", "gb-2312" -> "GBK", "gbk" -> "GBK",
    "cp1250" -> "windows-1250", "cp1251" -> "windows-1251",
    "cp1252" -> "windows-1252", "win-1252" -> "windows-1252",
    "cp1253" -> "windows-1253", "cp1254" -> "windows-1254",
    "cp1256" -> "windows-1256",
    "ascii" -> "US-ASCII", "us-ascii" -> "US-ASCII",
    "euc-jp" -> "EUC-JP", "euc-kr" -> "EUC-KR", "ks_c_5601-1987" -> "EUC-KR",
    "big5" -> "Big5", "big-5" -> "Big5",
    "koi8-r" -> "KOI8-R", "koi8" -> "KOI8-R",
    "macintosh" -> "x-MacRoman", "mac" -> "x-MacRoman",
    "tis-620" -> "TIS-620", "iso-8859-11" -> "TIS-620"
  )

  /** Resolution cache: label strings repeat corpus-wide (one crawl
    * has a handful of distinct charset labels across billions of
    * rows); `Charset.forName` walks alias maps and must not run per
    * row. None = unknown label, negative-cached for the same reason.
    */
  private val cache = new ConcurrentHashMap[String, Option[Charset]]()

  private def normalize(raw: String): String =
    raw.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").trim.toLowerCase

  /** The charset a label resolves to, or None if the JVM doesn't
    * support it (caller falls back to UTF-8).
    */
  def resolve(raw: String): Option[Charset] = {
    val key = normalize(raw)
    if (key.isEmpty) return None
    val hit = cache.get(key)
    if (hit != null) return hit
    val computed =
      try {
        val name = WebAliases.getOrElse(key, key)
        if (Charset.isSupported(name)) Some(Charset.forName(name)) else None
      } catch { case _: Exception => None }
    // bounded insert: labels are ATTACKER-CONTROLLED page content —
    // a crawl emitting a unique bogus label per page must not grow
    // executor-resident state without bound; past the cap lookups
    // still work, they just pay Charset.forName again
    if (cache.size < MaxCacheEntries) cache.putIfAbsent(key, computed)
    computed
  }

  private val MaxCacheEntries = 4096

  /** Whether the label resolves to a real charset (for flagging
    * unknown-label captures without changing the decode fallback).
    */
  def isKnown(raw: UTF8String): Boolean =
    raw != null && resolve(raw.toString).isDefined

  /** Decode bytes with the labeled charset; unknown label → UTF-8.
    * Malformed/unmappable sequences become U+FFFD (REPLACE action).
    */
  def decode(bytes: Array[Byte], label: UTF8String): UTF8String = {
    val cs = resolve(if (label == null) "" else label.toString)
      .getOrElse(StandardCharsets.UTF_8)
    UTF8String.fromString(new String(bytes, cs))
  }

  /** Encode text with the labeled charset; unknown label → UTF-8.
    * Unmappable chars become the charset's replacement byte.
    */
  def encode(text: UTF8String, label: UTF8String): Array[Byte] = {
    val cs = resolve(if (label == null) "" else label.toString)
      .getOrElse(StandardCharsets.UTF_8)
    text.toString.getBytes(cs)
  }
}
