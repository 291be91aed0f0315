package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking — the cluster answer to the one deliberately
  * single-partition operator in the contract (q_win_rownum_dense's bare
  * `dense_rank() OVER (ORDER BY …)`, see Windows.scala scaladoc and
  * docs/SCALE.md).
  *
  * A global window moves EVERY row to one partition. But a global DENSE rank
  * is a function of the row's key VALUE alone, so it factors into:
  *
  *   1. distinct keys            — shuffle shrinks to key cardinality
  *   2. rank each distinct key   — window over the (small) key relation
  *   3. broadcast-join ranks back — map-side, no fact shuffle at all
  *
  * The fact table is never globally sorted and never leaves its partitions.
  * Stage 2 is itself a window, but over |distinct keys| rows — for ranking
  * dimensions like priority/status/grade (the common use) that is dozens of
  * rows regardless of fact size; for high-cardinality keys swap stage 3's
  * broadcast for a shuffle join and stage 2 stays bounded by the key count,
  * not the row count.
  *
  * Equivalence to `dense_rank() OVER (ORDER BY key)` is pinned in
  * WindowsTimeSeriesSpec for both dense and ordinary rank (rank needs the
  * per-key multiplicities — a running sum over counts — also computed on the
  * distinct relation).
  */
object GlobalRank {

  /** The (distinct key `__k` → dense rank `out`) relation alone — for callers
    * that join it at a different point in their plan (e.g. after a row_number
    * filter) while the rank DOMAIN stays the full input. Joining ranks derived
    * from a filtered subset would renumber whenever a key value vanished from
    * it — always build the ranks from the unfiltered relation. */
  def denseRanks(df: DataFrame, key: Column, out: String): DataFrame =
    df.select(key.as("__k")).distinct()
      .withColumn(out, dense_rank().over(Window.orderBy(col("__k"))))

  /** dense_rank() OVER (ORDER BY key) without a global shuffle of `df`.
    * Null-safe join (<=>): the window form ranks null keys (first), so the
    * rewrite must not drop them — plain === would. */
  def denseRank(df: DataFrame, key: Column, out: String): DataFrame =
    df.join(broadcast(denseRanks(df, key, out)), key <=> col("__k")).drop("__k")

  /** row_number() OVER (ORDER BY sortCols…) over a near-unique key WITHOUT a
    * single-partition window — the q_hist_equidepth 2-pass device factored
    * for reuse (the [[denseRanks]] broadcast trick only pays off when the key
    * collapses; a fully tie-broken score order does not). Range-repartition
    * on the sort order (one full shuffle through Spark's sampled range
    * partitioner), sort within partitions, read (partition, local index) off
    * monotonically_increasing_id over ONE eager materialization, collect the
    * `parts`-row partition-count relation (a bounded driver fetch — `parts`
    * rows at any corpus size), and add the exclusive offsets back via a
    * broadcast join: global row number = partition offset + local index + 1.
    * The fact relation only ever moves through the range exchange. */
  def rowNumber2Pass(df: DataFrame, sortCols: Seq[Column], out: String,
      parts: Int = 16): DataFrame = {
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val cnts = sorted.groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__cnt")).orderBy("__pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val offsets = cnts.map(_._1).zip(cnts.map(_._2).scanLeft(0L)(_ + _))
    val ss = df.sparkSession
    import ss.implicits._
    val offDf = offsets.toDF("__pid", "__off")
    sorted.join(broadcast(offDf), shiftright(col("__mid"), 33) === col("__pid"))
      .withColumn(out,
        col("__off") + col("__mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("__mid", "__pid", "__off")
  }

  /** rank() OVER (ORDER BY key) — like [[denseRank]] plus per-key counts:
    * rank(v) = 1 + Σ count(k < v), a running sum over the distinct relation. */
  def rank(df: DataFrame, key: Column, out: String): DataFrame = {
    val w = Window.orderBy(col("__k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = df.groupBy(key.as("__k")).agg(count(lit(1)).as("__n"))
      .withColumn(out, (sum(col("__n")).over(w) - col("__n") + 1).cast("int"))
      .drop("__n")
    df.join(broadcast(ranks), key <=> col("__k")).drop("__k")
  }
}
