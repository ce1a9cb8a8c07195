package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH over `Array[Float]` embedding columns,
  * shared by s02 (ANN search) and d05 (embedding dedup).
  *
  * The planes are deterministic ±1 vectors (seeded), so they can be
  * inlined as literal lists into DuckDB oracle SQL; the projection is
  * the same explicit left fold as VectorFunctions, making the sign
  * decision — and therefore the bucket id — bit-identical across
  * engines.
  *
  * Scale: the number of planes is the knob. Expected bucket occupancy
  * is n / 2^bits, so bits should grow ~log2(n): 8 bits for the test
  * corpus, ~30 for 10^9 docs. Candidate generation stays an equi-join
  * on the bucket key either way (never a cross join).
  */
object Lsh {

  /** Deterministic ±1 hyperplanes: `count` planes over `dim` dims. */
  def planes(count: Int, dim: Int = 64, seed: Long = 1234L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(count)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** The canned 8-plane set used by s02/d05 (and their oracles). */
  val planes8: Seq[Seq[Double]] = planes(8)

  /** Signed projection of an embedding column onto one plane — the
    * same left fold from 0.0 as VectorFunctions.dotFold. Public: e02
    * reuses the raw projection for JL dimensionality reduction.
    */
  def proj(emb: String, w: Seq[Double]): Column =
    expr(
      s"aggregate(zip_with($emb, array(${w.mkString(", ")}), (x, y) -> CAST(x AS DOUBLE) * y), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )

  /** LSH signature: bit i set iff the projection on plane i is > 0. */
  def signature(emb: String, ps: Seq[Seq[Double]]): Column =
    ps.zipWithIndex.map { case (w, i) =>
      when(proj(emb, w) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** DuckDB SQL for the identical projection fold (1-based lists). */
  def sqlProj(emb: String, w: Seq[Double]): String = {
    val lits = w.mkString("[", ", ", "]")
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(generate_series(1, ${w.size}), i -> CAST($emb[i] AS DOUBLE) * ($lits)[i])), " +
      "(acc, v) -> acc + v)"
  }

  /** DuckDB SQL for the identical signature. */
  def sqlSignature(emb: String, ps: Seq[Seq[Double]]): String =
    ps.zipWithIndex.map { case (w, i) =>
      s"(CASE WHEN ${sqlProj(emb, w)} > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
