package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** HTML/markup → text extraction (t34): step zero of a web-crawl
  * pipeline — the operator that turns raw markup into the clean text
  * t05/t12 assume. Exact and engine-neutral by construction (the
  * oracle replays the identical pipeline in DuckDB): every regex is
  * RE2-safe (no backreferences, no lookaround — Java regex and RE2
  * agree on the subset used), entity decoding is ordered
  * named-entities-first so `&amp;lt;` round-trips to the literal
  * `&lt;` and never double-decodes, and block segmentation is a
  * deterministic split on the block-closing tags.
  *
  * Pipeline (per value, pure columnar — zero shuffle for the
  * per-block form until the caller aggregates):
  *   1. script/style elements removed WHOLE (their bodies are code,
  *      not content — and adversarially may contain literal `</p>`
  *      markup that must not create block boundaries);
  *   2. block-closing tags (`</p> </div> </h1-3> </li> </td>
  *      </blockquote> </title>`) and `<br>` become newlines — the
  *      block structure;
  *   3. every remaining tag stripped;
  *   4. HTML entities decoded (`&lt; &gt; &quot; &#39; &nbsp;` then
  *      `&amp;` LAST);
  *   5. per block: whitespace collapsed + trimmed; empty blocks
  *      dropped; a block shorter than `boilerLen` chars is flagged
  *      boilerplate (nav/chrome heuristic — titles, link bars).
  *
  * At 100 TB this is the m01/t01 shape: embarrassingly parallel over
  * parquet splits, whole-stage-codegen'd string work, no join, no
  * shuffle — the only scale knob is input splits.
  */
object Html {

  /** Default boilerplate threshold: blocks under 30 visible chars are
    * chrome (nav bars, titles, footers) in the step-zero heuristic. */
  final val BoilerLen = 30

  private[operators] def cleanedWithBoundaries(h: Column): Column = {
    // (?i): crawled HTML mixes tag case freely (<SCRIPT>, </P>) —
    // case-sensitive patterns would leak script bodies into content
    // and miss block boundaries. Named entities stay case-sensitive
    // (the HTML spec's canonical forms are lowercase).
    val noScript = regexp_replace(h, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val bounded = regexp_replace(
      regexp_replace(noStyle,
        "(?i)</(?:title|p|div|h1|h2|h3|li|td|blockquote)>", "\n"),
      // name boundary after 'br': a custom element like <brand> or
      // <broadcast-player> is NOT a line break — matching it would
      // fabricate block boundaries and skew n_blocks/boilerplate
      "(?i)<br(?:\\s[^>]*)?/?>", "\n")
    val noTags = regexp_replace(bounded, "<[^>]*>", "")
    // entity decode, named first, &amp; strictly last
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => regexp_replace(c, from, to) }
  }

  /** The identical pipeline in DuckDB SQL over expression `e` (RE2
    * regexes, 'g' flag = Spark's replace-all default). */
  private[operators] def duckCleaned(e: String): String = {
    val noScript = s"regexp_replace($e, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    val bounded = s"regexp_replace(regexp_replace($noStyle, " +
      s"'(?i)</(?:title|p|div|h1|h2|h3|li|td|blockquote)>', chr(10), 'g'), " +
      s"'(?i)<br(?:\\s[^>]*)?/?>', chr(10), 'g')"
    val noTags = s"regexp_replace($bounded, '<[^>]*>', '', 'g')"
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => s"replace($c, '$from', '$to')" }
  }

  /** Per-block extraction: one row per NONEMPTY text block —
    * (input cols minus htmlCol) + (block_idx, block_text, block_len,
    * is_boiler). block_idx is the block's SEGMENT position in
    * document order (0-based; positions whose segment collapsed to
    * empty are skipped, so gaps are expected) — kept as the raw split
    * ordinal rather than renumbered, so the whole operator stays a
    * map-only stage (a renumbering window would buy contiguous ids at
    * the cost of a per-doc shuffle the 100 TB form doesn't need;
    * ordering consumers sort by the ordinal either way).
    */
  /** Shared prep: one row per SPLIT SEGMENT (empty ones included —
    * [[htmlExtract]] needs every document represented; a NULL html
    * coalesces to '' for the same reason), block_text already
    * collapsed + trimmed.
    */
  private def rawBlocks(df: DataFrame, htmlCol: String): DataFrame = {
    val keep = df.columns.filterNot(_ == htmlCol).map(col).toSeq
    df
      .withColumn("_b", cleanedWithBoundaries(coalesce(col(htmlCol), lit(""))))
      .select(keep :+ posexplode(split(col("_b"), "\n")).as(Seq("block_idx", "block_text")): _*)
      .withColumn("block_text", trim(regexp_replace(col("block_text"), "\\s+", " ")))
      .withColumn("block_idx", col("block_idx").cast("long"))
  }

  def htmlBlocks(
      df: DataFrame,
      htmlCol: String = "html",
      boilerLen: Int = BoilerLen): DataFrame = {
    Seq("block_idx", "block_text", "block_len", "is_boiler", "_b")
      .foreach(c => require(!df.columns.contains(c),
        s"htmlBlocks: input already has a '$c' column — rename it first"))
    rawBlocks(df, htmlCol)
      .where(col("block_text") =!= "")
      .withColumn("block_len", length(col("block_text")).cast("long"))
      .withColumn("is_boiler", col("block_len") < boilerLen.toLong)
  }

  /** Per-document extraction: the content blocks (non-boilerplate)
    * joined in document order — (idCol, text, n_blocks, n_boiler,
    * content_len). EVERY input document stays present: all-boilerplate
    * docs get text = '', and degenerate docs (empty/NULL html, markup
    * that cleans to nothing) get text = '' with n_blocks = 0 — the
    * caller's filter decides; dropping rows here would silently lose
    * documents through a join or count downstream.
    */
  def htmlExtract(
      df: DataFrame,
      idCol: String = "doc_id",
      htmlCol: String = "html",
      boilerLen: Int = BoilerLen): DataFrame = {
    val nonEmpty = col("block_text") =!= ""
    val boiler = nonEmpty && length(col("block_text")) < boilerLen
    val content = nonEmpty && length(col("block_text")) >= boilerLen
    rawBlocks(df.select(col(idCol), col(htmlCol)), htmlCol)
      .groupBy(col(idCol))
      .agg(
        sum(when(nonEmpty, 1L).otherwise(0L)).as("n_blocks"),
        sum(when(boiler, 1L).otherwise(0L)).as("n_boiler"),
        array_join(
          transform(
            array_sort(collect_list(
              when(content, struct(col("block_idx"), col("block_text"))))),
            x => x.getField("block_text")),
          " ").as("text"))
      .withColumn("content_len", length(col("text")).cast("long"))
  }

  // -----------------------------------------------------------------
  // t34: the canned query — documents wrapped in a deterministic,
  // adversarial HTML envelope (script body containing literal </p>
  // markup, style rules, entity-escaped text, a nav link bar), then
  // extracted. The envelope is built by the SAME expression in both
  // engines, so the oracle gates the extraction end-to-end.
  // -----------------------------------------------------------------

  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  private def duckEsc(e: String): String =
    s"replace(replace(replace($e, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"

  private[operators] def syntheticHtml(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>p{margin:0;}</style>" +
        "<script>if(1<2){var x=\"</p>\";}</script></head><body><h1>Doc "),
      col("doc_id").cast("string"),
      lit("</h1><p>"), esc(substring(col("text"), 1, 120)),
      lit("</p><p>"), esc(expr("substring(text, 121)")),
      lit("</p><div class=\"nav\"><a href=\"/\">home</a>&nbsp;" +
        "<a href=\"/more\">more&amp;extra</a></div></body></html>")).as("html"))

  private val duckSyntheticHtml: String =
    "'<html><head><title>Doc ' || doc_id || " +
      "'</title><style>p{margin:0;}</style>" +
      "<script>if(1<2){var x=\"</p>\";}</script></head><body><h1>Doc ' || doc_id || " +
      s"'</h1><p>' || ${duckEsc("substr(text, 1, 120)")} || " +
      s"'</p><p>' || ${duckEsc("substr(text, 121)")} || " +
      "'</p><div class=\"nav\"><a href=\"/\">home</a>&nbsp;" +
      "<a href=\"/more\">more&amp;extra</a></div></body></html>'"

  val all: Seq[Q] = Seq(
    Q(
      "t34_html_extract",
      "HTML → text extraction: script/style removal, block segmentation, entity decode, boilerplate flags",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        htmlExtract(syntheticHtml(docs))
          .orderBy(col("doc_id"))
          .select(col("doc_id"), col("n_blocks"), col("n_boiler"),
            col("content_len"), col("text"))
      },
      Some(s"""WITH h AS (SELECT doc_id, $duckSyntheticHtml AS html FROM documents),
        c AS (SELECT doc_id, ${duckCleaned("html")} AS cleaned FROM h),
        s AS (SELECT doc_id, string_split(cleaned, chr(10)) AS bl FROM c),
        raw AS (SELECT doc_id, CAST(k - 1 AS BIGINT) AS k,
            trim(regexp_replace(bl[k], '\\s+', ' ', 'g')) AS block_text
          FROM s, UNNEST(generate_series(1, len(bl))) AS t(k)),
        blk AS (SELECT doc_id, k, block_text,
            CAST(length(block_text) AS BIGINT) AS block_len,
            length(block_text) < ${Html.BoilerLen} AS is_boiler
          FROM raw WHERE block_text <> '')
        SELECT doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_blocks,
          CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
          CAST(COALESCE(length(string_agg(block_text, ' ' ORDER BY k)
            FILTER (WHERE NOT is_boiler)), 0) AS BIGINT) AS content_len,
          COALESCE(string_agg(block_text, ' ' ORDER BY k)
            FILTER (WHERE NOT is_boiler), '') AS text
        FROM blk GROUP BY doc_id ORDER BY doc_id""")
    )
  )
}
