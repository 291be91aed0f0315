package graft

import org.apache.spark.sql.execution.SparkPlan

/** Dev probe: A/B SESSION-level conf variants over a query subset, in ONE
  * JVM, under Bench's honest execution scheme. Each variant is a `;`-joined
  * `k=v` list applied via spark.conf.set BEFORE the variant's plans are
  * built (shuffle width, broadcast threshold, … — anything read at planning
  * time; context-level confs need separate JVMs and are out of scope). The
  * special pseudo-conf `sysprop:<key>=<v>` sets a JVM system property
  * instead (the spread-width knob). Timed passes are INTERLEAVED across
  * variants (v1 pass1, v2 pass1, v1 pass2, …) so a host stall poisons one
  * sample of each arm, not one whole arm — the same discipline as Bench's
  * round-robin and AbProbe.
  *
  * Usage:
  *   CONF_VARIANTS="base=|w4=spark.sql.shuffle.partitions=4" \
  *   CONF_QUERIES="q_a,q_b" CONF_PASSES=5 \
  *   sbt "runMain graft.ConfProbe <sfDir>"
  * (variant syntax: `name=k=v;k=v`, empty conf list = baseline)
  *
  * Delimiter limits (advisor r16): conf VALUES containing ';' or '|' are
  * inexpressible (the split runs before k=v parsing) and a key repeated
  * within one variant restores in declaration order on exit (last restore
  * wins) — fine for the flat sweeps this probe runs; don't feed it richer
  * conf values.
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Bench.buildSession()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    def drain(it: Iterator[org.apache.spark.sql.catalyst.InternalRow]): Long = {
      var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
    }
    def runPlan(p: SparkPlan): Unit = sc.runJob(p.execute(), drain _)

    val passes = sys.env.getOrElse("CONF_PASSES", "5").toInt
    val queries = sys.env.getOrElse("CONF_QUERIES", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val variants: Seq[(String, Seq[(String, String)])] =
      sys.env.getOrElse("CONF_VARIANTS", "base=")
        .split('|').map(_.trim).filter(_.nonEmpty).toSeq
        .map { v =>
          val name = v.takeWhile(_ != '=')
          val confs = v.drop(name.length + 1).split(';').toSeq
            .filter(_.contains("=")).map { kv =>
              val Array(k, vv) = kv.split("=", 2); (k, vv)
            }
          (name, confs)
        }

    def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
      val prev = confs.map {
        case (k, _) if k.startsWith("sysprop:") =>
          k -> sys.props.get(k.stripPrefix("sysprop:"))
        case (k, _) => k -> spark.conf.getOption(k)
      }
      confs.foreach {
        case (k, v) if k.startsWith("sysprop:") =>
          sys.props(k.stripPrefix("sysprop:")) = v
        case (k, v) => spark.conf.set(k, v)
      }
      try body finally prev.zip(confs).foreach {
        case ((k, old), _) if k.startsWith("sysprop:") =>
          val pk = k.stripPrefix("sysprop:")
          old match { case Some(v) => sys.props(pk) = v
                      case None => sys.props.remove(pk) }
        case ((k, Some(v)), _) => spark.conf.set(k, v)
        case ((k, None), _) => spark.conf.unset(k)
      }
    }

    // Plan each (query, variant) under that variant's confs; execution mode
    // mirrors Bench (pure = same instance, else honest clone; rebuild-class
    // and eager queries run the full builder per pass under the confs).
    sealed trait Mode
    case object Pure extends Mode
    case object Clone extends Mode
    case object Rebuild extends Mode
    val planned = scala.collection.mutable.Map[(String, String), (Mode, SparkPlan)]()
    val builderJobCounter = Bench.jobCounter(sc)
    for (q <- queries; (vn, confs) <- variants) withConfs(confs) {
      // Warm-up parity across ALL modes (advisor r16): the Rebuild branches
      // (eager and subquery-bearing queries) previously got no untimed
      // execution here, so pass-1 cold costs (JIT, page cache, codegen)
      // landed on whichever variant ran first — order alternation only
      // cancels position effects from pass 2 onward, which biases
      // small-pass-count medians. Every branch now executes once untimed.
      if (Bench.isEager(q)) {
        planned((q, vn)) = (Rebuild, null)
        try runPlan(SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan)
        catch { case e: Throwable =>
          System.err.println(s"[conf] warmup $q/$vn failed: ${e.getMessage}") }
      }
      else {
        val jobsBefore = Bench.settledJobs(sc, builderJobCounter)
        val plan = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
        // builder-work detection, the bench's r17 rule (Bench.jobCounter)
        if (Bench.settledJobs(sc, builderJobCounter) > jobsBefore) {
          planned((q, vn)) = (Rebuild, null); runPlan(plan)
        }
        else if (plan.subqueriesAll.nonEmpty) {
          planned((q, vn)) = (Rebuild, null); runPlan(plan)
        }
        else if (!Bench.hasExchange(plan)) {
          planned((q, vn)) = (Pure, plan); runPlan(plan)
        } else {
          val cloned = PlanHonesty.prepareClone(plan)
          if (PlanHonesty.reuseClosed(cloned)) {
            planned((q, vn)) = (Clone, plan); runPlan(cloned)
          } else { planned((q, vn)) = (Rebuild, null); runPlan(cloned) }
        }
      }
    }

    val samples = scala.collection.mutable.Map[(String, String), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    // Alternate variant order per pass: with a fixed order, any systematic
    // first-runner handicap (GC debt from the previous query, page-cache
    // state) is charged to the same arm every pass and reads as a causal
    // difference — observed as a join-only conf "improving" a session-window
    // query by 1 s. Reversing on odd passes cancels the position effect in
    // the median.
    for (p <- 1 to passes; q <- queries;
         (vn, confs) <- (if (p % 2 == 0) variants.reverse else variants)) {
      withConfs(confs) {
        val t = try {
          planned((q, vn)) match {
            case (Pure, plan) =>
              val t0 = System.nanoTime(); runPlan(plan)
              (System.nanoTime() - t0) / 1e9
            case (Clone, plan) =>
              val c = PlanHonesty.prepareClone(plan)
              val t0 = System.nanoTime(); runPlan(c)
              (System.nanoTime() - t0) / 1e9
            case (Rebuild, _) =>
              val t0 = System.nanoTime()
              runPlan(SparkEntry.queries(q)(spark, sfDir)
                .queryExecution.executedPlan)
              (System.nanoTime() - t0) / 1e9
          }
        } catch { case e: Throwable =>
          System.err.println(s"[conf] $q/$vn failed: ${e.getMessage}"); -1.0
        }
        samples((q, vn)) = samples((q, vn)) :+ t
      }
    }
    def med(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1 else ok(ok.size / 2)
    }
    println(f"[conf] ${"query"}%-28s ${variants.map(_._1).map(v => f"$v%10s").mkString}")
    val totals = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    queries.foreach { q =>
      val meds = variants.map { case (vn, _) => med(samples((q, vn))) }
      variants.map(_._1).zip(meds).foreach { case (vn, m) => totals(vn) += m }
      println(f"[conf] $q%-28s ${meds.map(m => f"$m%10.3f").mkString}")
    }
    println(f"[conf] ${"TOTAL"}%-28s ${variants.map(v => f"${totals(v._1)}%10.3f").mkString}")
    spark.stop()
  }
}
