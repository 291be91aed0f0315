package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: which memoizable plans fail the [[PlanHonesty.reuseClosed]]
  * gate after [[PlanHonesty.prepareClone]]? A non-closed clone silently
  * lands in Bench's rebuild set — full per-pass re-planning inside the
  * timer — so every name this prints is a query whose bench time carries
  * avoidable planning overhead. Usage:
  *   sbt "runMain graft.ReuseProbe /root/testdata/sf0.01 [names...]"
  * No names → probe every non-eager registered query that plans with at
  * least one ReusedExchangeExec.
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val wanted = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Scratch.dir("graft_wh"))
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // Bench's OWN eager predicate, not a hand-copied name list: the stale
    // one-name copy this replaced ran q_graph_hits' full fixpoint and
    // q_assoc_lift's scan+shuffle+collect just to build a plan Bench never
    // memoizes (r15 probe sweep — the drift isEager was made private[graft]
    // to prevent)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(Bench.isEager)
      .filter(n => wanted.isEmpty || wanted(n))
    var open = 0
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        val nReuse = plan.collect { case r: ReusedExchangeExec => r }.size
        // subqueriesAll, like Bench: node-local `subqueries` misses a
        // scalar/IN subquery hanging off a deeper FilterExec, and the
        // probe's stateful column would contradict the predicate Bench
        // actually gates on (r15 probe sweep)
        val stateful = plan.subqueriesAll.nonEmpty
        if (nReuse > 0) {
          val cloned = PlanHonesty.prepareClone(plan)
          val closed = PlanHonesty.reuseClosed(cloned)
          if (!closed) open += 1
          println(s"[reuse-probe] $n reuse=$nReuse closed=$closed stateful=$stateful")
        }
      } catch { case e: Throwable =>
        println(s"[reuse-probe] $n ERROR ${e.getMessage}")
      }
    }
    println(s"[reuse-probe] open=$open")
    spark.stop()
  }
}
