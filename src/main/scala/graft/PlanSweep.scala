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
    val names = SparkEntry.queries.keys.toSeq.sorted
    var hits = 0
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        val found = plan.collect {
          case p if p.getClass.getSimpleName.contains(needle) => p
        }
        if (found.nonEmpty) {
          hits += 1
          println(s"[sweep] $n: ${found.size}x $needle")
        }
      } catch {
        case e: Throwable => println(s"[sweep] $n: PLAN-ERROR ${e.getMessage.take(120)}")
      }
    }
    println(s"[sweep] done: $hits/${names.size} plans contain $needle")
    spark.stop()
  }
}
