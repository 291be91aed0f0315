package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Floor-profiling probe (not part of the contract): per-query job/stage/task
  * census under the exact Bench execution scheme (memoized plan, timed cloned
  * execution; same session config via [[Bench.buildSession]] — local[32] only
  * when CENSUS-specific SPARK_GRAFT_CPUS asks for it). The per-query "floor"
  * is scheduling overhead × jobs/stages — a query running 4+ sequential jobs
  * pays ~4× the ~80 ms/job local floor, so this census ranks the
  * floor-reduction targets the round-11 verdict asked for. Usage:
  * CENSUS_QUERIES="q_a,q_b" or default = every non-streaming query slower
  * than CENSUS_MIN (default 0.45 s) in bench_full.json.
  *
  * Honesty mirrors Bench exactly: eager queries (q_dedup_components — the
  * builder RUNS the fixpoint) are re-invoked per run with the builder inside
  * the timed region; a clone that fails the reuseClosed gate (q_source_dpp's
  * expression-embedded reuse) re-plans per run rather than stage-skipping
  * through a cached exchange. Listener counters are read only after the bus
  * quiesces (count stable across two samples), not after a fixed sleep —
  * events arrive asynchronously on the listener-bus thread.
  */
object JobCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val names: Seq[String] = sys.env.get("CENSUS_QUERIES") match {
      case Some(qs) => qs.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      case None =>
        val minSec = sys.env.getOrElse("CENSUS_MIN", "0.45").toDouble
        val txt = scala.io.Source.fromFile("bench_full.json").mkString
        val re = """"(q_[a-z0-9_]+)":([0-9.]+)""".r
        re.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .filter { case (n, v) => v >= minSec && !n.startsWith("q_stream_") }
          .toSeq.sortBy(-_._2).map(_._1).distinct
    }

    def drain(it: Iterator[org.apache.spark.sql.catalyst.InternalRow]): Long = {
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
    }
    def runPlan(plan: SparkPlan): Unit = sc.runJob(plan.execute(), drain _)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    // wait until the async listener bus stops delivering: the counter
    // triple is unchanged across two consecutive 60 ms samples — the ONE
    // quiesce rule shared with the in-bench census (Bench.quiesceBus),
    // which also bounds the wait (the old local copy could spin forever
    // on a counter that never settled)
    def quiesce(): Unit = Bench.quiesceBus(() => (jobs, stages, tasks))

    val rows = names.flatMap { n =>
      try {
        val eagerName = Bench.isEager(n) // the bench's OWN predicate, not a copy
        // memoize once for the lazy path; decide rebuild-vs-clone like Bench
        val jobsBefore = if (eagerName) 0 else { quiesce(); jobs }
        val plan =
          if (eagerName) null
          else SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        // builder-work detection, the bench's r17 rule (Bench.jobCounter
        // scaladoc): a builder that launched jobs executed work the
        // memoized plan would read from cache — rebuild per run, like Bench
        val builderWork = !eagerName && { quiesce(); jobs > jobsBefore }
        val eager = eagerName || builderWork
        // full re-plan when the plan memoizes subquery futures: clone()
        // does not clone expression-embedded subquery plans, so a clone
        // would share the original's cached subquery results and the timed
        // run would stage-skip that work (Bench's `stateful` condition —
        // advisor r12 found the census checked only reuseClosed)
        val stateful = !eager && plan.subqueriesAll.nonEmpty // tree-wide, like Bench
        // Bench's exchange-free 'pure' path too: a plan with no exchange
        // holds no cross-pass state, so Bench re-executes the SAME instance
        // and skips the per-pass codegen-source regeneration (~30-80 ms on
        // scan/project-shaped queries) — a census that cloned those ran
        // systematically hotter than the bench time it ranks (r15 probe
        // sweep), enough to pull a sub-threshold query into the census.
        val pure = !eager && !stateful && !Bench.hasExchange(plan)
        // the timed region matches Bench's exactly: the clone is a pure
        // tree copy performed OUTSIDE the timer (Bench times only
        // execute()+runJob); builder+planning are INSIDE it only for the
        // eager/rebuild modes, where Bench re-plans per pass too
        def timedRun(): Double =
          if (eager || stateful) {
            val t0 = System.nanoTime()
            runPlan(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan)
            (System.nanoTime() - t0) / 1e9
          } else if (pure) {
            val t0 = System.nanoTime()
            runPlan(plan)
            (System.nanoTime() - t0) / 1e9
          } else {
            val c = PlanHonesty.prepareClone(plan) // untimed, like Bench
            if (PlanHonesty.reuseClosed(c)) {
              val t0 = System.nanoTime()
              runPlan(c)
              (System.nanoTime() - t0) / 1e9
            } else { // Bench's rebuild fallback: full re-plan, never stage-skip
              val t0 = System.nanoTime()
              runPlan(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan)
              (System.nanoTime() - t0) / 1e9
            }
          }
        timedRun() // warm
        quiesce()
        jobs = 0; stages = 0; tasks = 0
        // for eager queries the BUILDER is the work — timed, as Bench does
        val sec = timedRun()
        quiesce()
        Some((n, sec, jobs, stages, tasks))
      } catch {
        case e: Throwable =>
          System.err.println(s"[census] $n failed: ${e.getMessage}"); None
      }
    }
    println(f"${"query"}%-28s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    rows.sortBy(-_._2).foreach { case (n, s, j, st, t) =>
      println(f"$n%-28s $s%7.3f $j%5d $st%7d $t%6d")
    }
    spark.stop()
  }
}
