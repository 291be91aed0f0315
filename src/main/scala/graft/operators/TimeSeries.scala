package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch time-series operators (SURVEY.md §2.9): tumbling windows and
  * gaps-and-islands sessionization. Their Structured Streaming twins (window()
  * / session_window() with watermarks) live in graft.streaming and reuse the
  * same grouping expressions.
  *
  * Epoch arithmetic: ts.cast(double) = microseconds/1e6 in Spark, which is
  * bitwise-identical to DuckDB's epoch(ts) (verified on the fixtures — ts has
  * sub-second precision, so integer-second unix_timestamp would be WRONG here).
  */
object TimeSeries {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_ts_tumbling",
      "Per-hour tumbling counts/sums per event_type (batch twin of streaming window()).",
      (s, dir) =>
        table(s, dir, "events")
          .groupBy(
            date_trunc("hour", col("ts")).as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), graft.Exact.moneySum(col("value")).as("s"))
          .orderBy("w", "event_type"),
      Some(
        "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, event_type, count(*) AS n, " +
          graft.Exact.moneySumSql("value") + " AS s FROM events GROUP BY 1,2 ORDER BY 1,2")),

    GraftQuery(
      "q_ts_session",
      "30-min-gap sessionization via gaps-and-islands: lag → break flag → running sum " +
        "→ group. One shuffle on user_id; both windows share that partitioning.",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val prevTs = lag(col("ts"), 1).over(w)
        val brk = when(
          prevTs.isNull || (col("ts").cast(DoubleType) - prevTs.cast(DoubleType)) > 1800, 1
        ).otherwise(0)
        table(s, dir, "events")
          .withColumn("brk", brk)
          .withColumn(
            "sid",
            sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sid")
          .agg(count(lit(1)).as("n"))
          .orderBy("user_id", "sid")
      },
      Some(
        // ts cast to micros (TIMESTAMP) up front: DuckDB reads the raw
        // fixture at nanos precision while Spark reads the micros-truncated
        // form — a gap within 1µs of exactly 1800s would otherwise split
        // sessions differently on the two engines
        "WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events), " +
          "g AS (SELECT user_id, ts, event_id, CASE WHEN " +
          "epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 " +
          "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS brk " +
          "FROM e), " +
          // CAST to BIGINT: DuckDB types sum(INTEGER) as HUGEINT (INT128), which
          // pandas fetches as object/float and hash-mismatches Spark's BIGINT sid
          // even when every value is equal — the only bare int-sum output column
          // in the contract (CORRECTNESS_r01: rows/schema matched, hash did not).
          "s AS (SELECT user_id, ts, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g) " +
          "SELECT user_id, sid, count(*) AS n FROM s GROUP BY user_id, sid ORDER BY user_id, sid"))
  )
}
