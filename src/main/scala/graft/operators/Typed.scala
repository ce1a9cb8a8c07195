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
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        MIN(ts) AS first_ts
        FROM events GROUP BY user_id ORDER BY user_id""")
    )
  )
}
