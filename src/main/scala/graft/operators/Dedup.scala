package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.tables.Tables

/** Deduplication suite for a training-data pipeline (SURVEY.md §2.3).
  *
  * Scale design: no operator ever forms a global cross join. Candidate
  * generation is always an equi-join on a blocking key (content hash,
  * LSH band, simhash segment, label) so the shuffle is keyed and
  * bounded; exact verification runs only on candidates.
  */
object Dedup {

  /** Non-empty word tokens. */
  private val wordsExpr = "filter(split(text, ' '), x -> x <> '')"

  /** Distinct word-3-gram posting list (doc_id, shingle) built with
    * posexplode + lead() windows — fully codegen'd, ~10x faster than
    * nested transform/concat_ws HOF lambdas (interpreted closures)
    * which profiled at 2.3 ms/doc.
    */
  private def shinglePosting(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.load(spark, dir, "documents")
      .withColumn("words", expr(wordsExpr))
      .select($"doc_id", posexplode($"words").as(Seq("pos", "w")))
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    tok
      .withColumn("w1", lead($"w", 1).over(w))
      .withColumn("w2", lead($"w", 2).over(w))
      .filter($"w2".isNotNull)
      .select($"doc_id", concat_ws(" ", $"w", $"w1", $"w2").as("s"))
      .distinct()
  }

  // 16 minhash "permutations": independent re-hashes of the shingle
  // hash, seeded by index (xxhash64 over (h, i) — overflow-free under
  // ANSI mode, unlike a*h+b multiply-shift).
  private val numPerms = 16

  val all: Seq[Q] = Seq(
    Q(
      "d01_dedup_exact",
      "Exact dedup groups by content hash (raw + whitespace-normalized)",
      (spark, dir) => {
        import spark.implicits._
        Tables.load(spark, dir, "documents")
          .groupBy(
            md5($"text").as("h_raw"),
            md5(lower(regexp_replace($"text", "\\s+", " "))).as("h_norm")
          )
          .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy($"h_raw")
      },
      Some("""SELECT md5(text) AS h_raw,
        md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS h_norm,
        MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        FROM documents GROUP BY 1, 2 ORDER BY h_raw""")
    ),

    Q(
      "d02_dedup_minhash_lsh",
      "MinHash(16) + LSH(4 bands x 4 rows) candidates, exact-Jaccard verified",
      (spark, dir) => {
        import spark.implicits._
        // hashed postings feed BOTH the signature path and the exact
        // verify path
        val hashed = shinglePosting(spark, dir)
          .withColumn("h", xxhash64($"s"))
          .cache()
        val mhAggs = (0 until numPerms).map { i =>
          min(xxhash64($"h", lit(i))).as(s"mh$i")
        }
        val sig = hashed
          .groupBy($"doc_id")
          .agg(mhAggs.head, mhAggs.tail: _*)
        // 4 bands of 4 rows; band hash is the LSH bucket key
        val bands = sig.select(
          $"doc_id",
          posexplode(
            array((0 until 4).map(bnd =>
              xxhash64(concat_ws("|", (0 until 4).map(r => col(s"mh${bnd * 4 + r}")): _*))
            ): _*)
          ).as(Seq("band", "bh"))
        )
        val la = bands.select($"doc_id".as("id_a"), $"band", $"bh")
        val lb = bands.select($"doc_id".as("id_b"), $"band", $"bh")
        val cands = la.join(lb, Seq("band", "bh")).where($"id_a" < $"id_b")
          .select("id_a", "id_b").distinct()
        // exact verify on candidates only: restrict posting lists to
        // candidate docs (semi-join), count shared shingles per pair,
        // keep only LSH candidate pairs — no array payloads anywhere.
        val candDocs = cands.select(explode(array($"id_a", $"id_b")).as("doc_id")).distinct()
        val posting = hashed.select($"doc_id", $"s")
          .join(candDocs, Seq("doc_id"), "left_semi")
        val sizes = posting.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        posting.select($"doc_id".as("id_a"), $"s")
          .join(posting.select($"doc_id".as("id_b"), $"s"), Seq("s"))
          .where($"id_a" < $"id_b")
          .groupBy($"id_a", $"id_b")
          .agg(count(lit(1)).as("c"))
          .join(cands, Seq("id_a", "id_b"), "left_semi")
          .join(sizes.select($"doc_id".as("id_a"), $"n".as("na")), "id_a")
          .join(sizes.select($"doc_id".as("id_b"), $"n".as("nb")), "id_b")
          .withColumn("jaccard", $"c".cast("double") / ($"na" + $"nb" - $"c"))
          .filter($"jaccard" >= 0.4)
          .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
          .orderBy($"id_a", $"id_b")
      },
      None // LSH banding is not SQL-expressible portably; d04 carries
      //      the exact-Jaccard oracle and the spec cross-checks recall.
    ),

    Q(
      "d03_dedup_simhash",
      "64-bit SimHash + pigeonhole (4x16-bit segments) Hamming<=3 pairs",
      (spark, dir) => {
        import spark.implicits._
        val docs = Tables.load(spark, dir, "documents")
          .withColumn("words", expr(wordsExpr))
        // per-token 64-bit hash, +-1 contribution per bit, 64 sums
        val tok = docs.select($"doc_id", explode($"words").as("w"))
          .withColumn("h", xxhash64($"w"))
        // native SimHashAgg: one 64-int buffer through the partial
        // aggregation instead of 64 long columns (X3, Expressions.scala)
        val sigs = tok.groupBy($"doc_id")
          .agg(graft.functions.GraftExpressions.simHashAgg($"h").as("sim"))
        // pigeonhole: hamming<=3 over 4 segments => >=1 identical segment
        val seg = sigs.select(
          $"doc_id", $"sim",
          posexplode(array((0 until 4).map(k =>
            shiftrightunsigned($"sim", k * 16).bitwiseAND(0xffffL)
          ): _*)).as(Seq("k", "seg"))
        )
        val a = seg.select($"doc_id".as("id_a"), $"sim".as("sim_a"), $"k", $"seg")
        val b = seg.select($"doc_id".as("id_b"), $"sim".as("sim_b"), $"k", $"seg")
        a.join(b, Seq("k", "seg")).where($"id_a" < $"id_b")
          .select($"id_a", $"id_b", $"sim_a", $"sim_b").distinct()
          .withColumn("hamming", bit_count($"sim_a".bitwiseXOR($"sim_b")))
          .filter($"hamming" <= 3)
          .select($"id_a", $"id_b", $"hamming".cast("int").as("hamming"))
          .orderBy($"id_a", $"id_b")
      },
      None // token hash (xxhash64) has no DuckDB twin; spec verifies
      //      the pigeonhole guarantee against a brute-force pass.
    ),

    Q(
      "d04_dedup_ngram_jaccard",
      "Exact word-3-gram Jaccard >= 0.4 via shared-shingle candidates",
      (spark, dir) => {
        import spark.implicits._
        // Shingles are DISTINCT per doc, so the posting-list self-join
        // counts |A ∩ B| directly: one count(*) per pair, no array
        // payloads through the shuffle and no array_intersect. This is
        // the scalable formulation: shuffle keys are (shingle) then
        // (id_a, id_b), both narrow.
        val posting = shinglePosting(spark, dir).cache()
        val sizes = posting.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        val inter = posting.select($"doc_id".as("id_a"), $"s")
          .join(posting.select($"doc_id".as("id_b"), $"s"), Seq("s"))
          .where($"id_a" < $"id_b")
          .groupBy($"id_a", $"id_b")
          .agg(count(lit(1)).as("c"))
        inter
          .join(sizes.select($"doc_id".as("id_a"), $"n".as("na")), "id_a")
          .join(sizes.select($"doc_id".as("id_b"), $"n".as("nb")), "id_b")
          .withColumn("jac", $"c".cast("double") / ($"na" + $"nb" - $"c"))
          .filter($"jac" >= 0.4)
          .select($"id_a", $"id_b", round($"jac", 6).as("jaccard"))
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH w AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS wd
          FROM documents),
        sh AS (SELECT doc_id,
          CASE WHEN len(wd) >= 3 THEN list_distinct(list_transform(
            generate_series(1, len(wd) - 2), i -> wd[i] || ' ' || wd[i + 1] || ' ' || wd[i + 2]))
          ELSE [] END AS s FROM w)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.4
        ORDER BY id_a, id_b""")
    ),

    Q(
      "d05_dedup_embedding",
      "Embedding cosine near-dup pairs, blocked by label (fold-exact fp)",
      (spark, dir) => {
        import spark.implicits._
        val e = Tables.load(spark, dir, "embeddings")
        val a = e.select($"vec_id".as("id_a"), $"label", $"embedding".as("ea"))
        val b = e.select($"vec_id".as("id_b"), $"label", $"embedding".as("eb"))
        a.join(b, Seq("label")).where($"id_a" < $"id_b")
          .withColumn("cosine", VectorFunctions.cosine("ea", "eb"))
          .filter($"cosine" >= 0.3)
          .select($"id_a", $"id_b", $"label", $"cosine")
          .orderBy($"id_a", $"id_b")
      },
      Some {
        val cos = VectorFunctions.sqlCosine("a.embedding", "b.embedding")
        s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label, $cos AS cosine
        FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE $cos >= 0.3 ORDER BY id_a, id_b"""
      }
    )
  )
}
