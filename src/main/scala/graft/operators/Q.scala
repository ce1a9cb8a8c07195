package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * builder plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * Oracle-parity conventions (SURVEY.md §5):
  *   - every computed column aliased identically on both sides;
  *   - money/quantity aggregation in exact DECIMAL then CAST to
  *     DOUBLE (decimal sums are associative — immune to partial-agg
  *     ordering differences between engines);
  *   - counts are BIGINT on both sides; rank/year/etc cast to INT;
  *   - a total ORDER BY over deterministic keys on both sides.
  */
final case class Q(
    name: String,
    description: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
