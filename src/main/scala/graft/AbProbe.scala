package graft
import org.apache.spark.sql.execution.SparkPlan

/** Dev probe: A/B a query's per-pass time in Bench's memoized-CLONE mode
  * vs full-REBUILD mode at the bench session config.
  *
  * Honesty mirrors Bench exactly (r15 probe sweep): eager queries and
  * queries Bench itself would never memoize (subquery futures, non-closed
  * reuse) are refused rather than timed dishonestly — a naive clone of a
  * subquery-bearing plan stage-skips through the memoized relationFuture
  * and the A/B would overstate memoization savings. Samples are
  * INTERLEAVED (clone, rebuild, clone, rebuild …), not block-wise: this
  * host's multi-second stalls outlast a query, and a stall landing inside
  * one back-to-back block poisons that arm only (the r1 bench lesson).
  * Usage: sbt "runMain graft.AbProbe <sfDir> <passes> <name...>" */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val n = args(1).toInt
    val spark = Bench.buildSession()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    def drain(it: Iterator[org.apache.spark.sql.catalyst.InternalRow]): Long = {
      var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
    }
    def runPlan(p: SparkPlan): Unit = sc.runJob(p.execute(), drain _)
    args.drop(2).foreach { name =>
      if (Bench.isEager(name)) {
        println(s"[ab] $name is in Bench's eager set — the builder performs " +
          "the work, a memoized clone would time a read-back; skipped")
      } else {
        val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
        // Bench's full mode decision, including the exchange-free 'pure'
        // path (same-instance re-execution, no per-pass codegen-source
        // regeneration) — cloning a pure plan here would understate the
        // memoization savings Bench actually realizes (r15 diff review)
        val pure = plan.subqueriesAll.isEmpty && !Bench.hasExchange(plan)
        if (!pure && (plan.subqueriesAll.nonEmpty ||
            !PlanHonesty.reuseClosed(PlanHonesty.prepareClone(plan)))) {
          println(s"[ab] $name is in Bench's rebuild set (subquery futures " +
            "or non-closed reuse) — a clone would stage-skip; skipped")
        } else {
          val arm = if (pure) "pure:   " else "clone:  "
          def memoized(): SparkPlan =
            if (pure) plan else PlanHonesty.prepareClone(plan)
          runPlan(memoized()) // warm
          val memo = Vector.newBuilder[Double]
          val rebuild = Vector.newBuilder[Double]
          (1 to n).foreach { _ =>
            val c = memoized()
            val t0 = System.nanoTime(); runPlan(c)
            memo += (System.nanoTime() - t0) / 1e9
            val t1 = System.nanoTime()
            runPlan(SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan)
            rebuild += (System.nanoTime() - t1) / 1e9
          }
          def f(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString(" ")
          println(s"[ab] $name $arm ${f(memo.result())}")
          println(s"[ab] $name rebuild: ${f(rebuild.result())}")
        }
      }
    }
    spark.stop()
  }
}
