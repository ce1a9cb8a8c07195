package graft.functions

/** Embedded byte-pair-encoding tokenizer (GPT-2-style merge
  * application) with an exact cross-engine SQL twin.
  *
  * The merge table ships as a resource (graft/bpe_merges.txt), rank
  * ordered and derivation-consistent (a merge's constituents appear
  * at earlier ranks). Under that invariant the original Sennrich
  * apply-in-rank-order procedure — for each rule (a, b), replace
  * every adjacent "a b" left-to-right — produces the same
  * segmentation as min-rank-first pair merging, and it is a FIXED
  * chain of literal replaces, so both Spark and DuckDB express it as
  * a plain (codegen-able) expression with no data-dependent loop:
  *
  *   word → space-separated symbols ("c a t") → replace chain → count
  *
  * Symbol boundaries: symbols are multi-char, so a bare "a b" search
  * could match across a boundary (" c or " contains "c o"). The
  * representation therefore carries sentinel spaces — " c a t " — and
  * every rule matches " a b " → " ab " with BOTH delimiters, anchoring
  * full symbols only. Each rule runs TWICE: a replacement consumes the
  * shared space of an immediately following occurrence, and because a
  * SKIPPED occurrence never consumes anything, misses cannot sit
  * adjacent to each other — one repair pass catches them all.
  *
  * Both engines' `replace` scan left-to-right over non-overlapping
  * occurrences, so runs like "aaaaa" under a self-pair resolve
  * identically (same token count as canonical BPE; tie-positions are
  * scan-order-defined). Symbols are code points, not raw bytes (the
  * corpus is UTF-8 text; '.' matches one code point in both Java
  * regex and RE2), and pre-tokenization is the corpus word split —
  * merges never cross word boundaries.
  */
object Bpe {

  /** (left, right) merges in rank order, from the committed table. */
  val merges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "bpe_merges.txt missing from classpath")
    try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val Array(a, b) = l.split(" ", 2)
          (a, b)
        }
        .toSeq
    finally in.close()
  }

  // the merge table is trusted input (committed resource), but keep the
  // SQL-literal embedding honest anyway
  private def esc(s: String): String = s.replace("'", "''")

  private def chain(spaced: String): String =
    merges.foldLeft(spaced) { case (acc, (a, b)) =>
      val (pat, rep) = (s" ${esc(a)} ${esc(b)} ", s" ${esc(a)}${esc(b)} ")
      // twice per rule — see the repair-pass argument in the scaladoc
      s"replace(replace($acc, '$pat', '$rep'), '$pat', '$rep')"
    }

  /** Spark SQL expression: BPE token segmentation of one word
    * expression (a string column) as a sentinel-padded
    * space-separated symbol string (trim before splitting).
    */
  def sparkSegments(word: String): String =
    chain(s"(' ' || regexp_replace($word, '(.)', '$$1 '))")

  /** Spark SQL expression: total BPE token count over a word-array
    * expression. A higher-order fold — per-row, zero shuffle.
    */
  def sparkCount(wordsExpr: String): String =
    s"aggregate(transform($wordsExpr, w -> size(split(trim(${sparkSegments("w")}), ' '))), " +
      "CAST(0 AS BIGINT), (a, x) -> a + x)"

  /** DuckDB spelling of [[sparkSegments]]. */
  def duckSegments(word: String): String =
    chain(s"(' ' || regexp_replace($word, '(.)', '\\1 ', 'g'))")

  /** DuckDB spelling of [[sparkCount]] (sum comes back HUGEINT —
    * caller casts to BIGINT).
    */
  def duckCount(wordsExpr: String): String =
    s"list_aggregate(list_transform($wordsExpr, " +
      s"w -> len(string_split(trim(${duckSegments("w")}), ' '))), 'sum')"

  // ---------------------------------------------------------------
  // Imperative twin for the codegen BpeCount expression: the same
  // in-rank-order rule application over a symbol ARRAY (one
  // left-to-right non-overlapping pass per rule). Count-equivalent to
  // the padded-string replace chain: a rule never creates a new match
  // of itself or of an earlier rule (derivation-consistent table), and
  // for self-overlapping runs both formulations merge the same
  // maximal disjoint pair set (BpeSpec pins expression == SQL chain
  // over the corpus). ~10x faster than the interpreted HOF fold.
  // ---------------------------------------------------------------

  private val ruleA: Array[String] = merges.map(_._1).toArray
  private val ruleB: Array[String] = merges.map(_._2).toArray

  /** Total BPE token count of a text column value: tokenize on the
    * space char (empties dropped — same pre-tokenization as the SQL
    * word split), then merge each word. Called from generated code.
    */
  def countTokens(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) total += wordTokens(s, start, i)
        start = i + 1
      }
      i += 1
    }
    total
  }

  private def wordTokens(s: String, from: Int, until: Int): Int = {
    val len = until - from
    if (len <= 1) return len
    // iterate CODE POINTS, not UTF-16 units: the SQL twin's '(.)'
    // regex matches one code point in both Java regex and RE2, so a
    // charAt-based split would double-count astral-plane characters
    val syms = new Array[String](len) // upper bound (cp count <= unit count)
    var cnt = 0
    var k = from
    while (k < until) {
      val cp = s.codePointAt(k)
      syms(cnt) = new String(Character.toChars(cp))
      cnt += 1
      k += Character.charCount(cp)
    }
    if (cnt <= 1) return cnt
    var r = 0
    while (r < ruleA.length && cnt > 1) {
      val a = ruleA(r)
      val b = ruleB(r)
      var read = 0
      var write = 0
      while (read < cnt) {
        if (read + 1 < cnt && syms(read) == a && syms(read + 1) == b) {
          syms(write) = a + b
          read += 2
        } else {
          syms(write) = syms(read)
          read += 1
        }
        write += 1
      }
      cnt = write
      r += 1
    }
    cnt
  }
}
