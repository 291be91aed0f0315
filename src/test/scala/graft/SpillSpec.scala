package graft

import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Spill-path gate (r14 verdict #3): the 100 TB posture leans on Spark's
  * memory-pressure fallbacks — HashAggregate's sort-based fallback and the
  * window/SMJ buffer spill to UnsafeExternalSorter — but until this spec no
  * test ever FORCED those paths and proved the results bit-identical. Memory
  * pressure itself can't be manufactured in the shared test JVM (executor
  * memory is fixed at context start), so this uses the session-settable
  * knobs Spark ships for exactly this purpose:
  *  - `spark.sql.TungstenAggregate.testFallbackStartsAt` — the hash agg's
  *    own test hook: the BytesToBytesMap "fails" after N keys, destructs
  *    into an UnsafeKVExternalSorter and finishes sort-based — the code
  *    path a 100 TB aggregation takes when the map exceeds task memory.
  *  - `spark.sql.windowExec.buffer.{in.memory,spill}.threshold` — window
  *    partition buffers move to UnsafeExternalSorter after N rows and
  *    FORCE a disk spill after M — the real spill-file write+readback.
  *  - `spark.sql.sortMergeJoinExec.buffer.*` + broadcast disabled — the
  *    SMJ buffered-match array takes the same spill path.
  * Equality is legal to demand bitwise: every gated query already
  * hash-matches the oracle at 4 and 32 threads (the partitioning probe),
  * i.e. the contract queries are accumulation-order-insensitive by design
  * (exact decimal sums, tie-broken window frames), and the fallback only
  * reorders accumulation. */
class SpillSpec extends SparkSuite {

  private val spillConfs = Seq(
    "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "2,2",
    // ObjectHashAggregate (TypedImperativeAggregate buffers: sketches,
    // collect_set) falls back to sort-based after 2 in-memory keys
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2",
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "8",
    "spark.sql.windowExec.buffer.spill.threshold" -> "32",
    "spark.sql.sessionWindow.buffer.in.memory.threshold" -> "8",
    "spark.sql.sessionWindow.buffer.spill.threshold" -> "32",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "1",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "2",
    // no broadcast escape hatch: the join legs must take the sort/SMJ path
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    // a concrete final plan, so the fallback metrics are readable per node
    "spark.sql.adaptive.enabled" -> "false")

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // heaviest gated hash aggregations, window sorts, and join shapes — the
  // operators whose 100 TB story depends on the fallback paths
  private val queries = Seq(
    "q_agg_tpch_q1", "q_agg_distinct", "q_dedup_exact",
    "q_win_running_sum", "q_hist_equidepth",
    "q_join_large", "q_join_multiway",
    // ObjectHashAggregate path (sketch buffers)
    "q_agg_approx_quantile")

  test("forced spill/fallback paths produce bit-identical results") {
    @volatile var diskSpilled = 0L
    @volatile var memSpilled = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          diskSpilled += t.taskMetrics.diskBytesSpilled
          memSpilled += t.taskMetrics.memoryBytesSpilled
        }
    }
    val baselines = queries.map(n => n -> run(n).collect().toSeq).toMap
    spark.sparkContext.addSparkListener(listener)
    try {
      var fellBack = 0L
      withConfs(spillConfs) {
        queries.foreach { n =>
          val df = run(n)
          val got = df.collect().toSeq
          assert(got == baselines(n),
            s"$n diverged under forced spill/fallback")
          fellBack += df.queryExecution.executedPlan.collect {
            case h: HashAggregateExec =>
              h.metrics.get("numTasksFallBacked").map(_.value).getOrElse(0L)
            case o: ObjectHashAggregateExec =>
              o.metrics.get("numTasksFallBacked").map(_.value).getOrElse(0L)
          }.sum
        }
      }
      assert(fellBack > 0,
        "no HashAggregate task ever took the sort-based fallback — the knob no-op'd")
      // listener events are delivered async; poll until the spill counters
      // surface rather than sleeping a fixed interval
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (diskSpilled == 0 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(diskSpilled > 0,
        "no task wrote a spill file — the buffer thresholds no-op'd")
      assert(memSpilled > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
