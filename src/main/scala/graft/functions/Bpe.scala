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

  // ---------------------------------------------------------------
  // Token-ID emission (X15/X16) — the training-data last mile.
  //
  // ID scheme (engine-neutral, no OOV): a single-code-point symbol's
  // id IS its code point (0..0x10FFFF); the symbol produced by merge
  // rank r gets id MERGE_ID_BASE + r (= 0x110000 + r, disjoint from
  // every code point by construction). The inter-word separator is
  // the space's own code point (32) — so decode is pure symbol
  // concatenation and decode(encode(x)) == the corpus normalization
  // of x (single-space-joined non-empty words), which BpeSpec pins.
  // A learned merge table drops in without renumbering anything.
  // ---------------------------------------------------------------

  /** First id past the code-point space; merge rank r ⇒ this + r. */
  val MergeIdBase: Int = 0x110000

  /** Space separator token (the ' ' code point). */
  val SpaceId: Int = 32

  /** Merged-symbol string for each rank (decode table tail). */
  private val mergeSym: Array[String] = merges.map { case (a, b) => a + b }.toArray
  private val mergeRank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    while (i < mergeSym.length) { m.put(mergeSym(i), i); i += 1 }
    m
  }

  private def symbolId(s: String): Int = {
    val cp = s.codePointAt(0)
    if (Character.charCount(cp) == s.length) cp
    else {
      val r = mergeRank.get(s)
      require(r != null, s"not a vocab symbol: '$s'")
      MergeIdBase + r
    }
  }

  /** Token-ID encoding of a text value: corpus word split (space,
    * empties dropped), per-word rank-order merges, ids per the scheme
    * above, [[SpaceId]] between consecutive words. Called from
    * generated code (X15).
    */
  def encodeIds(text: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Integer](s.length / 2 + 4)
    var start = 0
    var i = 0
    var firstWord = true
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          if (!firstWord) out.add(SpaceId)
          firstWord = false
          wordIds(s, start, i, out)
        }
        start = i + 1
      }
      i += 1
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  private def wordIds(s: String, from: Int, until: Int, out: java.util.ArrayList[Integer]): Unit = {
    val syms = segmentWord(s, from, until)
    var i = 0
    while (i < syms.length) { out.add(symbolId(syms(i))); i += 1 }
  }

  /** Merged symbol sequence of one word span (code-point split, then
    * the same in-rank-order passes as [[wordTokens]]).
    */
  private def segmentWord(s: String, from: Int, until: Int): Array[String] = {
    val len = until - from
    val syms = new Array[String](math.max(len, 1))
    var cnt = 0
    var k = from
    while (k < until) {
      val cp = s.codePointAt(k)
      syms(cnt) = new String(Character.toChars(cp))
      cnt += 1
      k += Character.charCount(cp)
    }
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
    java.util.Arrays.copyOf(syms, cnt)
  }

  /** Inverse of [[encodeIds]]: pure symbol concatenation (the space
    * separator decodes as ' ' by the id scheme itself). Called from
    * generated code (X16).
    */
  def decodeIds(ids: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder(n * 2)
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id >= MergeIdBase) {
        val r = id - MergeIdBase
        require(r < mergeSym.length, s"id $id beyond vocab")
        sb.append(mergeSym(r))
      } else sb.appendCodePoint(id)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  /** DuckDB expression: token-ID list of a word-array expression —
    * the value twin of [[encodeIds]] (flatten per-word ids with a
    * trailing [[SpaceId]] each, then drop the final separator).
    */
  def duckEncode(wordsExpr: String): String = {
    val rankCase = mergeSym.zipWithIndex
      .map { case (s, r) => s"WHEN '${esc(s)}' THEN ${MergeIdBase + r}" }
      .mkString(" ")
    val perWord =
      s"list_transform(string_split(trim(${duckSegments("w")}), ' '), " +
        s"s -> CASE WHEN length(s) = 1 THEN unicode(s) ELSE CASE s $rankCase END END)"
    val flat = s"flatten(list_transform($wordsExpr, w -> list_append($perWord, $SpaceId)))"
    s"list_slice($flat, 1, len($flat) - 1)"
  }

  /** Spark SQL (HOF) expression twin of [[encodeIds]] — used by the
    * spec to pin the codegen expression against the engine-neutral
    * replace-chain formulation on real corpus text.
    */
  def sparkEncode(wordsExpr: String): String = {
    val rankCase = mergeSym.zipWithIndex
      .map { case (s, r) => s"WHEN '${esc(s)}' THEN ${MergeIdBase + r}" }
      .mkString(" ")
    val perWord =
      s"transform(split(trim(${sparkSegments("w")}), ' '), " +
        s"s -> CASE WHEN length(s) = 1 THEN ascii(s) ELSE CASE s $rankCase END END)"
    val flat = s"flatten(transform($wordsExpr, w -> concat($perWord, array($SpaceId))))"
    s"slice($flat, 1, greatest(size($flat) - 1, 0))"
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
