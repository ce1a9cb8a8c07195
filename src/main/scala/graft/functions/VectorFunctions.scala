package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns.
  *
  * The fold shapes here are written so a DuckDB oracle can replicate
  * the exact IEEE operation sequence: left fold from an explicit 0.0
  * with per-element double promotion — producing bit-identical doubles
  * on both engines (SURVEY.md §5).
  */
object VectorFunctions {

  /** Sequential left-fold dot product of two array columns. */
  def dotFold(a: String, b: String): Column =
    expr(
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )

  /** Cosine via three explicit folds — the reference formulation the
    * oracle mirrors; kept for the equivalence spec.
    */
  def cosineFold(a: String, b: String): Column =
    dotFold(a, b) / (sqrt(dotFold(a, a)) * sqrt(dotFold(b, b)))

  /** Cosine similarity. Implemented by the fused codegen Expression
    * (one pass over both arrays); accumulation order is identical to
    * [[cosineFold]] and the DuckDB oracle, so results stay
    * bit-identical (proven in ExpressionsSpec + oracle parity).
    */
  def cosine(a: String, b: String): Column =
    GraftExpressions.cosineSim(col(a), col(b))

  /** DuckDB SQL for the identical dot-product fold (1-based lists). */
  def sqlDot(a: String, b: String, dim: Int = 64): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(generate_series(1, $dim), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      "(acc, v) -> acc + v)"

  /** DuckDB SQL cosine with the identical expression shape. */
  def sqlCosine(a: String, b: String, dim: Int = 64): String =
    s"${sqlDot(a, b, dim)} / (SQRT(${sqlDot(a, a, dim)}) * SQRT(${sqlDot(b, b, dim)}))"
}
