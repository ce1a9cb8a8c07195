package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.tables.Tables

/** Corpus-level line deduplication (t42) — the C4/CCNet boilerplate
  * rule: a (trimmed) line occurring at least `minDf` times ACROSS THE
  * CORPUS is navigation/chrome ("Subscribe to our newsletter",
  * copyright footers) and is removed from every document, preserving
  * the order of what remains. Distinct from t27/t28 (token-window /
  * suffix duplication inside the packed stream) — this is the
  * document-structure pass a crawl corpus runs FIRST.
  *
  * Scale shape: the line-frequency table is keyed by the 60-bit
  * PortableHash of the line, NOT the line text — the count shuffle
  * and the frequency join carry 8-byte keys instead of arbitrary-
  * length strings (the d02 discipline: never shuffle payloads when a
  * fingerprint routes identically). Two keyed shuffles total:
  * hash-groupBy count (map-side combinable) + the doc_id regroup for
  * reassembly; the frequency join is hash-keyed equi-join, AQE-sized.
  * 60-bit collisions (~1e-18 per pair) would at worst drop one
  * innocent line — the standard accepted trade at corpus scale.
  */
object LineDedup {

  /** Per-document cleanup: (idCol, n_lines, n_removed, text_clean).
    * Lines are `\n`-separated, compared TRIMMED; empty lines don't
    * count and are dropped from the rebuild. Every input document
    * stays present (all-boilerplate docs come back with text_clean =
    * '' — the caller's filter decides).
    */
  def lineDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minDf: Int = 3): DataFrame = {
    require(minDf >= 2, "lineDedup: minDf must be >= 2")
    val lines = docs
      .select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("line_idx", "line")))
      .withColumn("line", trim(col("line")))
      .where(col("line") =!= "")
      .withColumn("h", PortableHash.hash60(col("line")))
    val freq = lines.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val kept = lines.join(freq, "h")
    docs.select(col(idCol)).distinct()
      .join(
        kept.groupBy(col(idCol)).agg(
          count(lit(1)).as("n_lines"),
          sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_removed"),
          array_join(
            transform(
              array_sort(collect_list(
                when(col("df") < minDf, struct(col("line_idx"), col("line"))))),
              x => x.getField("line")),
            "\n").as("text_clean")),
        Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  // -----------------------------------------------------------------
  // t42: the canned query — documents wrapped into multi-line pages
  // with three boilerplate strata (a global banner on every doc, a
  // per-source share bar on ~n/5 docs, a copyright footer) around
  // two unique content lines; minDf=3 removes all three strata and
  // keeps exactly the content.
  // -----------------------------------------------------------------

  private[operators] def syntheticMultiline(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      lit("Subscribe to our newsletter\nu"), col("doc_id").cast("string"),
      lit(" "), substring(col("text"), 1, 60),
      lit("\n  share"), (col("doc_id") % 5).cast("string"),
      lit("  \nv"), col("doc_id").cast("string"),
      lit(" "), substring(col("text"), 61, 60),
      lit("\n\nCopyright 2025 Example Corp")).as("text"))

  private val duckSyntheticMultiline: String =
    "'Subscribe to our newsletter' || chr(10) || 'u' || CAST(doc_id AS VARCHAR) || ' ' || substr(text, 1, 60)" +
      " || chr(10) || '  share' || CAST(doc_id % 5 AS VARCHAR) || '  ' || chr(10) || " +
      "'v' || CAST(doc_id AS VARCHAR) || ' ' || substr(text, 61, 60)" +
      " || chr(10) || chr(10) || 'Copyright 2025 Example Corp'"

  private def t42Oracle(minDf: Int): String =
    s"""WITH d AS (SELECT doc_id, $duckSyntheticMultiline AS text FROM documents),
      s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
      raw AS (SELECT doc_id, CAST(k - 1 AS BIGINT) AS line_idx, trim(ls[k]) AS line
        FROM s, UNNEST(generate_series(1, len(ls))) AS t(k)),
      ln AS (SELECT doc_id, line_idx, line, ${PortableHash.sqlHash60("line")} AS h
        FROM raw WHERE line <> ''),
      freq AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM ln GROUP BY h),
      j AS (SELECT ln.doc_id, ln.line_idx, ln.line, freq.df
        FROM ln JOIN freq ON ln.h = freq.h)
      SELECT d.doc_id,
        CAST(COALESCE(COUNT(j.line), 0) AS BIGINT) AS n_lines,
        CAST(COALESCE(SUM(CASE WHEN j.df >= $minDf THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_removed,
        COALESCE(string_agg(j.line, chr(10) ORDER BY j.line_idx)
          FILTER (WHERE j.df < $minDf), '') AS text_clean
      FROM d LEFT JOIN j ON j.doc_id = d.doc_id
      GROUP BY d.doc_id ORDER BY d.doc_id"""

  val all: Seq[Q] = Seq(
    Q(
      "t42_line_dedup",
      "C4-style corpus line dedup: lines with df >= minDf removed everywhere, hash-keyed frequency join",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        lineDedup(syntheticMultiline(docs), minDf = 3)
          .orderBy(col("doc_id"))
      },
      Some(t42Oracle(3))
    )
  )
}
