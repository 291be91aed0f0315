package graft

import org.apache.spark.sql.SparkSession

/** Dev-only sweep: plans every registry query and reports which physical
  * plans contain a given node class (default: SortAggregate — the silent
  * hash-agg fallback when an aggregate buffer field is not UnsafeRow-mutable,
  * found costing 10× on q_audit_checksum in r12). */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val needle = if (args.length > 1) args(1) else "SortAggregate"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Scratch.dir("graft_wh"))
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // eager queries (streaming pipelines, localCheckpoint superstep
    // builders) EXECUTE inside the builder and return a read-back whose
    // plan is a bare scan the needle can never appear in — planning them
    // would run minutes of checkpointed pipelines for zero detection value
    // (r14 harness sweep); mirror Bench's own eager predicate and skip
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(Bench.isEager)
    var hits = 0
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        // collectWithSubqueries, not collect: a SortAggregate hiding in a
        // scalar-subquery branch is exactly the regression this sweep
        // hunts, and node-local traversal never descends into it (the same
        // subqueriesAll lesson Bench learned in r12 — r14 harness sweep)
        val found = plan.collectWithSubqueries {
          case p if p.getClass.getSimpleName.contains(needle) => p
        }
        if (found.nonEmpty) {
          hits += 1
          println(s"[sweep] $n: ${found.size}x $needle")
        }
      } catch {
        // String.valueOf: a message-less Throwable (bare NPE, SOE) would
        // otherwise NPE the catch handler itself and abort the whole sweep
        case e: Throwable =>
          println(s"[sweep] $n: PLAN-ERROR ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(s"[sweep] done: $hits/${names.size} non-eager plans contain $needle")
    spark.stop()
  }
}
