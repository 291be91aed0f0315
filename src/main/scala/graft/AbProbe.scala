package graft
import org.apache.spark.sql.execution.SparkPlan

/** Dev probe: A/B a query's per-pass time in Bench's memoized-CLONE mode
  * vs full-REBUILD mode at the bench session config.
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
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      runPlan(PlanHonesty.prepareClone(plan)) // warm
      val clone = (1 to n).map { _ =>
        val c = PlanHonesty.prepareClone(plan)
        val t0 = System.nanoTime(); runPlan(c); (System.nanoTime() - t0) / 1e9
      }
      val rebuild = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        runPlan(SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan)
        (System.nanoTime() - t0) / 1e9
      }
      def f(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString(" ")
      println(s"[ab] $name clone:   ${f(clone)}")
      println(s"[ab] $name rebuild: ${f(rebuild)}")
    }
    spark.stop()
  }
}
