package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared by every ScaleProbe: `factor` copies of a table with the id
  * columns shifted by `i * step` per copy — one definition so a fix
  * to the replication scheme lands everywhere at once (this used to
  * exist verbatim in five probe files).
  */
private[tools] object ProbeReplicate {
  def apply(df: DataFrame, idCols: Seq[String], factor: Int, step: Long): DataFrame =
    (0 until factor).map { i =>
      idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * step)))
    }.reduce(_ unionByName _)
}
