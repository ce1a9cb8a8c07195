package graft.operators

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Embedding-storage operators (SURVEY.md §2.3): symmetric int8
  * quantization for compact embedding storage — per-vector max-abs
  * scale, q_i = floor(x_i * 127 / scale + 0.5).
  *
  * Cross-engine exactness notes: scale (max of |x|) and the quantized
  * SUM are order-independent, so partial aggregation can't drift; the
  * reconstruction-error fold is an explicit LEFT fold from 0.0 (the
  * sqlDot pattern) so the double accumulation order matches DuckDB;
  * floor(x + 0.5) is used instead of round() because the engines'
  * round() tie-breaking differs for negative halves. Per-row only —
  * zero shuffle besides the oracle sort.
  */
object Embeddings {

  val all: Seq[Q] = Seq(
    Q(
      "e01_embed_quantize",
      "Symmetric int8 quantization: per-vector scale, checksum, reconstruction MSE",
      (spark, dir) => {
        import spark.implicits._
        Tables.load(spark, dir, "embeddings")
          .withColumn("scale",
            expr("aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
          .where($"scale" > 0)
          .withColumn("q_sum",
            expr("aggregate(embedding, CAST(0 AS BIGINT), " +
              "(a, x) -> a + CAST(floor(CAST(x AS DOUBLE) * 127 / scale + 0.5) AS BIGINT))"))
          .withColumn("mse",
            expr("aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + " +
              "(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * 127 / scale + 0.5) * scale / 127) * " +
              "(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * 127 / scale + 0.5) * scale / 127)) / 64"))
          .select($"vec_id", round($"scale", 6).as("scale"),
            $"q_sum", round($"mse", 9).as("mse"))
          .orderBy($"vec_id")
      },
      Some("""WITH s AS (SELECT vec_id, embedding,
          list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS scale
          FROM embeddings),
        q AS (SELECT vec_id, scale,
          CAST(list_aggregate(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 127 / scale + 0.5) AS BIGINT)), 'sum') AS BIGINT) AS q_sum,
          list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(embedding,
            x -> (CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * 127 / scale + 0.5) * scale / 127) *
                 (CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * 127 / scale + 0.5) * scale / 127))),
            (acc, v) -> acc + v) / 64 AS mse
          FROM s WHERE scale > 0)
        SELECT vec_id, ROUND(scale, 6) AS scale, q_sum, ROUND(mse, 9) AS mse
        FROM q ORDER BY vec_id""")
    )
  )
}
