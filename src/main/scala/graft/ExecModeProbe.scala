package graft
import org.apache.spark.sql.SparkSession

/** Temporary probe (not part of the contract): compares per-pass execution
  * strategies for Bench to find where the ~0.2 s per-query floor lives.
  *
  *  A: rebuild the DataFrame every pass + noop write   (Bench today)
  *  B: memoized DataFrame + noop write per pass        (saves build+analysis)
  *  C: memoized executedPlan, fresh `.execute()` RDD per pass + runJob
  *     (saves ALL planning incl. the write command's re-optimization;
  *      ShuffleExchangeExec caches its shuffle RDD, so passes 2-3 may skip
  *      map stages — printed per-pass so the effect is visible)
  *  D: memoized executedPlan, per-pass honest clone + runJob (saves
  *     planning, forces fresh shuffles every pass — via
  *     [[PlanHonesty.prepareClone]], because a naive clone() keeps
  *     ReusedExchangeExec pointing at the ORIGINAL exchange instance
  *     that mode C has already executed and cached, so D would
  *     stage-skip any shared subtree and read artificially fast)
  */
object ExecModeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.Scratch.dir("graft_wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probes = Seq("q_set_except", "q_join_broadcast", "q_agg_minmax_stddev",
      "q_text_stats", "q_agg_tpch_q1", "q_scan_project")
    probes.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(it: Iterator[org.apache.spark.sql.catalyst.InternalRow]): Long = {
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
    }
    probes.foreach { n =>
      val fn = SparkEntry.queries(n)
      val a = (1 to 3).map(_ => time(
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()))
      val df = fn(spark, sfDir)
      val b = (1 to 3).map(_ => time(
        df.write.mode("overwrite").format("noop").save()))
      val plan = df.queryExecution.executedPlan
      val rddC = plan.execute()
      val c = (1 to 3).map(_ => time(
        spark.sparkContext.runJob(rddC, drain _)))
      val d = (1 to 3).map(_ => time {
        val cloned = PlanHonesty.prepareClone(plan)
        // Bench's guard: a clone whose reuse escapes the tree would
        // stage-skip through mode C's cached exchange — rebuild instead
        val runnable =
          if (PlanHonesty.reuseClosed(cloned)) cloned
          else fn(spark, sfDir).queryExecution.executedPlan
        spark.sparkContext.runJob(runnable.execute(), drain _)
      })
      def f(v: Seq[Double]) = v.map(x => f"$x%.3f").mkString("/")
      println(s"[mode] $n A=${f(a)} B=${f(b)} C=${f(c)} D=${f(d)}")
    }
    spark.stop()
  }
}
