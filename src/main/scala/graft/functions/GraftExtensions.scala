package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom expressions as SQL
  * functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSim)
    ext.injectFunction(GraftExtensions.polyHash)
    // whole-operator path: plans graft.plans.AsOfJoin logical nodes
    // (Ops.asofJoinNative also self-registers per-session)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinLimitPushdown)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))
  )

  val polyHash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poly_hash"),
    info("poly_hash", "poly_hash(str) - rolling polynomial hash (base 131, mod 1e9+7)"),
    (children: Seq[Expression]) => RollingPolyHash(children.head)
  )

  /** Register on an existing session (tests / REPL convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(cosineSim, polyHash).foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }
}
