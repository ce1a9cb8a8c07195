package graft.operators

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Typed Dataset API showcase (SURVEY.md §3: `Dataset[T]` where
  * compile-time field checks help). The per-user stats are computed
  * with `groupByKey` + `mapGroups` over case classes; the value sum is
  * accumulated in exact BigDecimal (2dp data) so the result is
  * order-independent and matches the DuckDB decimal-sum oracle.
  *
  * Scale note: mapGroups forgoes partial aggregation and codegen —
  * correct, but the equivalent DataFrame `groupBy().agg()` (q29 et
  * al.) is what the hot path should use; this operator exists to keep
  * the typed surface covered and tested.
  */
object Typed {

  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double
  )

  final case class UserStats(
      user_id: Long,
      n_events: Long,
      n_purchases: Long,
      total_value: Double,
      first_ts: java.sql.Timestamp
  )

  val all: Seq[Q] = Seq(
    Q(
      "u01_typed_user_stats",
      "Per-user stats via typed groupByKey/mapGroups over case classes",
      (spark, dir) => {
        import spark.implicits._
        Tables.load(spark, dir, "events")
          .selectExpr("event_id", "ts", "user_id", "event_type", "value")
          .as[Event]
          .groupByKey(_.user_id)
          .mapGroups { (uid, it) =>
            var n = 0L
            var purchases = 0L
            var total = BigDecimal(0)
            var first: java.sql.Timestamp = null
            it.foreach { e =>
              n += 1
              if (e.event_type == "purchase") purchases += 1
              // BigDecimal.valueOf uses the shortest decimal repr —
              // exact for the 2dp value column, sum order-independent
              total += BigDecimal.valueOf(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
              if (first == null || e.ts.before(first)) first = e.ts
            }
            UserStats(uid, n, purchases, total.toDouble, first)
          }
          .toDF()
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, COUNT(*) AS n_events,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
        CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_value,
        MIN(ts) AS first_ts
        FROM events GROUP BY user_id ORDER BY user_id""")
    ),

    Q(
      "u02_typed_spend_agg",
      "Custom typed Aggregator: exact per-user spend stats with partial aggregation",
      (spark, dir) => {
        import spark.implicits._
        // The OTHER typed aggregation surface: a custom
        // org.apache.spark.sql.expressions.Aggregator. Unlike u01's
        // mapGroups (no partial agg), an Aggregator declares
        // merge(b1, b2), so Spark partial-aggregates map-side like
        // any built-in — the typed API without the shuffle penalty.
        // The buffer holds integer CENTS (2dp data → exact), so
        // reduce/merge are commutative-associative and the result is
        // partitioning-independent.
        Tables.load(spark, dir, "events")
          .selectExpr("event_id", "ts", "user_id", "event_type", "value")
          .as[Event]
          .groupByKey(_.user_id)
          .agg(SpendAgg.toColumn.name("s"))
          .map { case (uid, s) =>
            SpendStats(uid, s.n, s.cents / 100.0, s.maxCents / 100.0)
          }
          .toDF()
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, COUNT(*) AS n_events,
        CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_spend,
        CAST(MAX(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS max_spend
        FROM events GROUP BY user_id ORDER BY user_id""")
    )
  )

  final case class SpendBuf(cents: Long, n: Long, maxCents: Long)

  final case class SpendStats(
      user_id: Long,
      n_events: Long,
      total_spend: Double,
      max_spend: Double
  )

  /** Typed Aggregator with an integer-cents buffer: reduce and merge
    * are exact integer ops, so partial aggregation can't drift.
    */
  object SpendAgg
      extends org.apache.spark.sql.expressions.Aggregator[Event, SpendBuf, SpendBuf] {
    private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong
    override def zero: SpendBuf = SpendBuf(0L, 0L, Long.MinValue)
    override def reduce(b: SpendBuf, e: Event): SpendBuf =
      SpendBuf(b.cents + cents(e.value), b.n + 1, math.max(b.maxCents, cents(e.value)))
    override def merge(a: SpendBuf, b: SpendBuf): SpendBuf =
      SpendBuf(a.cents + b.cents, a.n + b.n, math.max(a.maxCents, b.maxCents))
    override def finish(b: SpendBuf): SpendBuf = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[SpendBuf] =
      org.apache.spark.sql.Encoders.product[SpendBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[SpendBuf] =
      org.apache.spark.sql.Encoders.product[SpendBuf]
  }
}
