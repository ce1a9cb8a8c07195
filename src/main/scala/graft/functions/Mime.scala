package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Magic-byte MIME sniffing (X26) — the WHATWG-style byte-pattern
  * table a crawl pipeline runs on every captured payload BEFORE
  * trusting the Content-Type header (servers lie; the bytes don't):
  * route real HTML to extraction, media to the m01-class container
  * walks, archives/binaries away from the text path.
  *
  * Deliberately a compact, documented subset of the WHATWG sniffing
  * standard: the unambiguous binary signatures, ISO-BMFF brand
  * dispatch, and a whitespace-tolerant case-insensitive HTML/XML tag
  * check; the "scriptable vs non-scriptable" browser split and
  * charset-specific text probes are out of scope (the t37 charset
  * sniffer owns encoding). A payload matching no signature is
  * text/plain unless its first 512 bytes contain NUL — the classic
  * binary tell — then application/octet-stream.
  */
object Mime {

  private val HtmlTags = Array(
    "!doctype", "html", "head", "body", "script", "iframe", "h1", "div",
    "p", "a", "table", "title", "br", "meta", "style", "font", "b")

  private def startsWith(b: Array[Byte], off: Int, sig: Int*): Boolean = {
    if (b.length < off + sig.length) return false
    var i = 0
    while (i < sig.length) {
      if ((b(off + i) & 0xff) != sig(i)) return false
      i += 1
    }
    true
  }

  private def asciiAt(b: Array[Byte], off: Int, s: String): Boolean = {
    if (b.length < off + s.length) return false
    var i = 0
    while (i < s.length) {
      if (b(off + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Case-insensitive ASCII tag-name match at off, which must be
    * terminated by whitespace, '>' or '/' (so `<p>` matches but
    * `<param>` doesn't match the `p` entry).
    */
  private def tagAt(b: Array[Byte], off: Int, tag: String): Boolean = {
    if (b.length < off + tag.length) return false
    var i = 0
    while (i < tag.length) {
      val c = (b(off + i) & 0xff).toChar
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != tag.charAt(i)) return false
      i += 1
    }
    val e = off + tag.length
    e >= b.length || b(e) == ' ' || b(e) == '>' || b(e) == '\t' ||
      b(e) == '\n' || b(e) == '\r' || b(e) == '/'
  }

  def sniff(bytes: Array[Byte]): UTF8String = {
    if (bytes == null) return null
    val b = bytes
    val mime: String =
      if (startsWith(b, 0, 0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)) "image/png"
      else if (startsWith(b, 0, 0xff, 0xd8, 0xff)) "image/jpeg"
      else if (asciiAt(b, 0, "GIF87a") || asciiAt(b, 0, "GIF89a")) "image/gif"
      else if (asciiAt(b, 0, "RIFF") && b.length >= 12) {
        if (asciiAt(b, 8, "WEBP")) "image/webp"
        else if (asciiAt(b, 8, "WAVE")) "audio/wav"
        else if (asciiAt(b, 8, "AVI ")) "video/x-msvideo"
        else "application/octet-stream"
      }
      else if (b.length >= 12 && asciiAt(b, 4, "ftyp")) {
        if (asciiAt(b, 8, "M4A ")) "audio/mp4" else "video/mp4"
      }
      else if (asciiAt(b, 0, "%PDF-")) "application/pdf"
      else if (startsWith(b, 0, 0x1f, 0x8b)) "application/gzip"
      else if (startsWith(b, 0, 'P', 'K', 0x03, 0x04)) "application/zip"
      else if (asciiAt(b, 0, "OggS")) "audio/ogg"
      else if (asciiAt(b, 0, "ID3")) "audio/mpeg"
      else {
        // text probe: optional UTF-8 BOM, then ASCII whitespace, then
        // a tag check; otherwise NUL-scan the first 512 bytes
        var i = if (startsWith(b, 0, 0xef, 0xbb, 0xbf)) 3 else 0
        while (i < b.length && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' ||
          b(i) == '\r' || b(i) == 0x0c)) i += 1
        if (i < b.length && b(i) == '<') {
          if (asciiAt(b, i + 1, "?xml")) "text/xml"
          else if (HtmlTags.exists(t => tagAt(b, i + 1, t))) "text/html"
          else textOrBinary(b)
        } else textOrBinary(b)
      }
    UTF8String.fromString(mime)
  }

  private def textOrBinary(b: Array[Byte]): String = {
    val n = math.min(b.length, 512)
    var i = 0
    while (i < n) {
      if (b(i) == 0x00) return "application/octet-stream"
      i += 1
    }
    "text/plain"
  }
}
