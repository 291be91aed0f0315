package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // Optional trailing query names restrict the dump (fast dev iteration on
    // a single operator); the driver always runs the full, unfiltered form.
    val only: Set[String] = args.drop(2).toSet
    // a typo'd name would otherwise silently filter out everything and exit
    // 0 with an empty (or stale) outDir (r14 harness sweep)
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // saveAsTable targets (bucketed-layout query) land in a temp warehouse
      .config("spark.sql.warehouse.dir",
        graft.Scratch.dir("graft_wh"))
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v": CONTEXT-level confs for gated
    // stress runs — SpillSpec can only force the SQLConf-settable fallbacks
    // (hash-agg, window/SMJ buffers) inside the shared test JVM; the
    // external-sorter force-spill knob
    // (spark.shuffle.spill.numElementsForceSpillThreshold) is a SparkConf
    // fixed at context start, so the full-contract forced-spill gate runs
    // through THIS hook (BASELINE.md r15). Unset = byte-identical default.
    val extraConf: Seq[(String, String)] =
      sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "").split(';')
        .map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
          // a bare 'k' or 'k=' would silently set nothing/empty and the
          // gated stress run would report a clean 316/316 it never stressed
          // (advisor r15); note ';' inside a VALUE is inexpressible here —
          // no context conf this hook carries needs one
          val i = kv.indexOf('=')
          require(i > 0 && i < kv.length - 1,
            s"SPARK_GRAFT_EXTRA_CONF entry must be key=value with non-empty " +
              s"sides: '$kv'")
          (kv.take(i).trim, kv.drop(i + 1).trim)
        }
    extraConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    // Task-attempt census, for the gated stress runs: the speculation gate
    // (BASELINE.md r16) must EVIDENCE that duplicated/replayed tasks actually
    // happened — a local[n] run silently never speculates (TaskSchedulerImpl
    // guards the speculation thread behind !isLocal), so a gate that only
    // checked results could pass without exercising anything. One stderr
    // line at the end; zero cost on the default path.
    val taskStats = new java.util.concurrent.atomic.AtomicLongArray(3)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskStart(
            t: org.apache.spark.scheduler.SparkListenerTaskStart): Unit = {
          taskStats.incrementAndGet(0)
          if (t.taskInfo.speculative) taskStats.incrementAndGet(1)
          if (t.taskInfo.attemptNumber > 0) taskStats.incrementAndGet(2)
        }
      })
    // getOrCreate on a PRE-EXISTING context ignores context-level confs —
    // fine for Verify.main's fresh JVM today, but a silent no-op if a session
    // ever pre-exists (advisor r15). Post-condition, not a heuristic: every
    // requested conf must be visible on the context or the session.
    extraConf.foreach { case (k, v) =>
      val seen = spark.sparkContext.getConf.getOption(k)
        .orElse(spark.conf.getOption(k))
      require(seen.contains(v),
        s"SPARK_GRAFT_EXTRA_CONF '$k=$v' not in effect (got $seen) — " +
          "a pre-existing SparkContext swallowed it; the gated run would " +
          "silently measure the default configuration")
    }
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a REUSED outDir would otherwise keep the previous run's parquet
        // for this query, and the DuckDB compare would silently validate
        // the stale result as correct (r14 harness sweep) — a failed query
        // must leave NO result so the compare reports it missing
        try TempReaper.deleteRecursively(s"$outDir/$name")
        catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    System.err.println(s"[verify] task attempts=${taskStats.get(0)} " +
      s"speculative=${taskStats.get(1)} retried=${taskStats.get(2)}")
    spark.stop()
  }
}
