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

  /** Exact decimal sum per key, salted (graft.Exact discipline — associative,
    * so the two-phase split cannot change the result). */
  def saltedMoneySum(df: DataFrame, key: Column, value: Column, buckets: Int = 16): DataFrame =
    salted(df, key, buckets)
      .withColumn("__v", value.cast(org.apache.spark.sql.types.DecimalType(28, 6)))
      .groupBy("__key", "__salt").agg(sum(col("__v")).as("__partial"))
      .groupBy(col("__key").as("key"))
      .agg(round(sum(col("__partial")), 2).cast(org.apache.spark.sql.types.DoubleType).as("total"))
}
