package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (docs/SCALE.md): salted two-phase aggregation.
  *
  * A hot key (one beaconing station producing 1% of a 100 TB stream) turns a
  * plain groupBy into a single straggler task. Salting splits each key into
  * `buckets` sub-keys for the first (parallel) aggregation, then combines the
  * partials in a second, tiny aggregation keyed by the original key.
  *
  * Correct for any aggregate expressible as partial+final with an associative
  * combine. The helpers below cover the common cases; each is equivalent to
  * the unsalted form (pinned by AlgebraSpec's property test — exact for
  * counts and for the decimal-discipline sums).
  */
object Skew {

  // DETERMINISTIC salt from full row content: non-deterministic salts
  // (partition id, monotonic id, rand) are a correctness hazard as shuffle
  // keys — a task retry after a fetch failure recomputes rows with different
  // salts and silently double-counts/drops them. A content hash re-salts
  // identically on retry; duplicate rows sharing a salt only skews bucket
  // balance, never results.
  private def salted(df: DataFrame, key: Column, buckets: Int): DataFrame =
    df.withColumn("__key", key)
      .withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(buckets.toLong)))

  /** count(*) per key, salted. */
  def saltedCount(df: DataFrame, key: Column, buckets: Int = 16): DataFrame =
    salted(df, key, buckets)
      .groupBy("__key", "__salt").agg(count(lit(1)).as("__partial"))
      .groupBy(col("__key").as("key")).agg(sum(col("__partial")).as("n"))

  /** Exact money sum per key, salted (graft.Exact fixed-point discipline:
    * LONG micro-unit partials are associative integers, so the two-phase
    * split cannot change the result — moneyFinish rounds once at the end). */
  def saltedMoneySum(df: DataFrame, key: Column, value: Column, buckets: Int = 16): DataFrame =
    salted(df, key, buckets)
      .withColumn("__dw", graft.Exact.microDw(value))
      .withColumn("__fr", graft.Exact.microFr(value))
      .groupBy("__key", "__salt")
      .agg(sum(col("__dw")).as("__pd"), sum(col("__fr")).as("__pf"))
      .groupBy(col("__key").as("key"))
      .agg(graft.Exact.moneyFinish(sum(col("__pd")), sum(col("__pf"))).as("total"))

  /** Count + exact money sum per key in ONE salted two-phase pass — the
    * gated q_agg_salted shape. */
  def saltedStats(df: DataFrame, key: Column, value: Column, buckets: Int = 16): DataFrame =
    salted(df, key, buckets)
      .withColumn("__dw", graft.Exact.microDw(value))
      .withColumn("__fr", graft.Exact.microFr(value))
      .groupBy("__key", "__salt")
      .agg(count(lit(1)).as("__pc"), sum(col("__dw")).as("__pd"), sum(col("__fr")).as("__pf"))
      .groupBy(col("__key").as("key"))
      .agg(sum(col("__pc")).as("n"),
        graft.Exact.moneyFinish(sum(col("__pd")), sum(col("__pf"))).as("total"))
}
