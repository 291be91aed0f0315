package graft
import org.apache.spark.sql.SparkSession

/** Temporary floor-profiling probe (not part of the contract): breaks a
  * trivial query's wall time into plan-build / analyze+optimize / execute.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_SHUF", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
    sys.env.getOrElse("PROBE_EXTRA", "").split(';').filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probes = Seq("q_set_except", "q_join_broadcast", "q_agg_minmax_stddev", "q_text_stats")
    // warm
    probes.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskTimeMs += t.taskInfo.duration
    })
    probes.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 3).foreach { _ =>
        jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        // shared quiesce rule, not a fixed sleep (r15 probe sweep): a
        // >120 ms bus lag undercounted pass N and leaked into pass N+1
        Bench.quiesceBus(() => (jobs, stages, tasks, taskTimeMs))
        println(f"[probe] $n%-22s build=${(t1 - t0) / 1e3}%6.0fus plan=${(t2 - t1) / 1e3}%6.0fus exec=${(t3 - t2) / 1e3}%8.0fus jobs=$jobs stages=$stages tasks=$tasks taskTime=${taskTimeMs}ms")
      }
    }
    spark.stop()
  }
}
