package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.LogicalRDD

/** Visibility bridge for wrapping an already-materialized RDD[InternalRow]
  * back into a DataFrame (`LogicalRDD.fromDataset` and `Dataset.ofRows` are
  * `private[sql]` in Spark 4) — the same extension-library pattern as
  * [[ColumnBridge]]. Used by the staged-fold device (graft.Staged): an
  * eager superstep materialization that computes its 1-row driver
  * statistic in the SAME job needs to re-wrap the cached internal rows as
  * a relation. `fromDataset` (what Dataset.localCheckpoint itself calls)
  * carries the origin plan's output partitioning/ordering onto the new
  * relation with rewritten attribute ids — losing it would re-insert an
  * Exchange in front of every downstream join keyed like the staged
  * relation (observed: UnknownPartitioning(0) on the first bridge cut). */
object DataFrameBridge {
  def fromStaged(origin: DataFrame, rdd: RDD[InternalRow]): DataFrame = {
    val ds = origin.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    org.apache.spark.sql.classic.Dataset.ofRows(
      ds.sparkSession,
      LogicalRDD.fromDataset(rdd, ds, isStreaming = false))
  }
}
