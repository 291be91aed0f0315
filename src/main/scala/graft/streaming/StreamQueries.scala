package graft.streaming

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Streaming under the oracle gate: these queries execute a REAL Structured
  * Streaming pipeline (file source → watermarked stateful aggregation →
  * checkpointed parquet sink, Trigger.AvailableNow) and return its output as
  * the query result. Possible because AvailableNow semantics are
  * deterministic on static input: a window is emitted in append mode iff
  * `window.end <= watermark` where the final watermark is `max(ts) - 2h`
  * (boundary verified empirically this round) — which is expressible as a
  * HAVING clause in the DuckDB oracle.
  *
  * The stream reads a normalized copy of the events fixture (micros
  * timestamps — the raw fixture is TIMESTAMP(NANOS), see Tables.table).
  */
object StreamQueries {

  /** Normalized (micros-ts) events drop-dir, memoized per (session, sfDir) —
    * the copy is made once, not on every Verify/Bench invocation, and the
    * timed bench run measures the stream, not a redundant table copy. */
  private val dropDirs =
    graft.Tables.registerSessionScoped(new java.util.concurrent.ConcurrentHashMap[(Long, String), String]())

  private def eventsDropDir(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    dropDirs.computeIfAbsent((Tables.sessionId(spark), dir), _ => {
      val drop = graft.Scratch.dir("graft_sq_in")
      reapAtExit.add(drop)
      // few large files, not one per session core: the micro-batch planner
      // lists and tracks every file, and 32 shards of a 100k-row fixture is
      // pure per-file overhead for the stream
      Tables.table(spark, dir, "events").coalesce(2).write.mode("overwrite").parquet(drop)
      drop
    })

  /** Drop-dir holding only the deterministic 10% user cohort (user_id%10=0)
    * — the stream-stream join's input fixture. Filtering at INGEST (one
    * write-once pass, like the main drop-dir's micros normalization) rather
    * than inside the stream means the join run reads 10% of the bytes; the
    * join semantics and the oracle (whose CTE applies the same predicate to
    * events) are unchanged — the measured object is the join machinery. */
  private val cohortDropDirs =
    graft.Tables.registerSessionScoped(new java.util.concurrent.ConcurrentHashMap[(Long, String), String]())

  private def cohortDropDir(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    cohortDropDirs.computeIfAbsent((Tables.sessionId(spark), dir), _ => {
      val drop = graft.Scratch.dir("graft_sq_coh")
      reapAtExit.add(drop)
      Tables.table(spark, dir, "events")
        .filter(pmod(col("user_id"), lit(10)) === 0)
        .coalesce(1).write.mode("overwrite").parquet(drop)
      drop
    })

  /** Drop-dir with every event delivered TWICE (two appended copies) — the
    * at-least-once re-delivery fixture for the streaming dedup gate. */
  private val dupDropDirs =
    graft.Tables.registerSessionScoped(new java.util.concurrent.ConcurrentHashMap[(Long, String), String]())

  private def duplicatedDropDir(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    dupDropDirs.computeIfAbsent((Tables.sessionId(spark), dir), _ => {
      val drop = graft.Scratch.dir("graft_sq_dup")
      reapAtExit.add(drop)
      val ev = Tables.table(spark, dir, "events").coalesce(2)
      ev.write.mode("overwrite").parquet(drop)
      ev.write.mode("append").parquet(drop)
      drop
    })

  /** Scratch reclaim is centralized in [[graft.TempReaper]]: sink output dirs
    * must outlive the returned (lazy) DataFrame, so they can only be
    * reclaimed at JVM exit — without this, every bench sample leaks a
    * windowed-output copy. */
  private val reapAtExit = graft.TempReaper
  private def deleteRecursively(path: String): Unit =
    graft.TempReaper.deleteRecursively(path)

  /** The state-store provider every gated streaming pipeline runs on.
    * RocksDB, not the HDFS-backed default: the default keeps ALL state as
    * JVM objects on the executor heap (an unbounded-growth liability at
    * 100 TB state — docs/SCALE.md), while RocksDB holds it off-heap with
    * disk spill and changelog/snapshot checkpointing. transformWithState
    * (StationTrackerTws) already REQUIRES it; r12 verdict #3 promoted it to
    * the family default so the benched pipelines price the provider a real
    * deployment would run. */
  private[graft] val StateStoreProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run a streaming pipeline with (a) state partitioning sized to its STATE
    * (thousands of windows/keys here), not the session's batch shuffle
    * width: every stateful operator plans one state store + sink file per
    * shuffle partition per micro-batch, so 8 oversized partitions pay 4× the
    * per-batch commit overhead of 2 right-sized ones (measured: 2.0 s →
    * 1.7 s per tumbling pass); and (b) the RocksDB state-store provider
    * ([[StateStoreProvider]]). A new checkpoint snapshots the conf at query
    * start, so scoping the overrides to the run is safe; restore happens
    * before the read-back query plans. At cluster scale the width knob is
    * state_bytes / executor-memory-budget, not a constant. */
  /** RocksDB tuned the way a production deployment runs it:
    *  - changelog checkpointing: commit uploads the batch's delta, full
    *    SST snapshots happen in the background maintenance thread — NOT a
    *    per-commit zip+upload of the whole store (the default's cost grows
    *    with STATE size; the changelog's with BATCH size, which is the
    *    only option that holds at 100 TB state).
    *  - no per-row count tracking: tracking does a point-get before every
    *    put/delete just to maintain the numTotalStateRows metric; state
    *    size observability comes from the sizeBytes metrics instead. */
  private val RocksDbConf: Seq[(String, String)] = Seq(
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false",
    // Stream-stream join state format v3 (r16 optimization round): ONE
    // physical store per partition with virtual column families, instead of
    // the classic four instances (left/right × keyToNumValues/
    // keyWithIndexToValue). Four stores per partition quadruple the
    // open/commit/changelog overhead per micro-batch — at 100 TB state that
    // is 4× the instance count the provider maintains and snapshots; at
    // bench scale it is measurable per-batch floor (ConfProbe, 10
    // interleaved order-alternating passes, 32 cores: q_stream_join
    // 3.49 s → 2.91 s, the session-window control unchanged 2.60/2.65).
    // Applies to NEW checkpoints only, which every gated run creates.
    "spark.sql.streaming.join.stateFormatVersion" -> "3")

  private[graft] def withStreamConf[A](spark: org.apache.spark.sql.SparkSession,
      width: Int = StreamShuffleWidth)(body: => A): A = {
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> width.toString,
      "spark.sql.streaming.stateStore.providerClass" -> StateStoreProvider) ++
      RocksDbConf
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Stream-state shuffle width — default 2 (measured best for these state
    * sizes), overridable via SPROBE_SHUFFLE so StreamProbe's sweep knob
    * tunes the SAME setting the gated stream queries run with (previously
    * the hard-coded 2 silently overrode the probe's session-level set). */
  private def StreamShuffleWidth: Int = widthOr(2)

  /** SPROBE_SHUFFLE (env) / graft.probe.streamwidth (sysprop, for same-JVM
    * ConfProbe sweeps) wins over any per-query default — a hard-coded width
    * would silently no-op the probe's sweep, the exact bug this knob was
    * introduced to fix (r13 review caught the dupe filter's literal 4
    * reintroducing it). Re-read per call (not lazy): a frozen first read
    * would pin every later sweep variant to the first one's width. */
  private def widthOr(default: Int): Int =
    sys.props.get("graft.probe.streamwidth")
      .orElse(sys.env.get("SPROBE_SHUFFLE"))
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .getOrElse(default)

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_stream_tumbling",
      "Structured Streaming per-hour tumbling aggregation executed end-to-end " +
        "(source→watermark→state→sink); result = the watermark-closed windows.",
      (spark, dir) => {
        val out = graft.Scratch.dir("graft_sq_out")
        val ckpt = graft.Scratch.dir("graft_sq_ck")
        reapAtExit.add(out)
        withStreamConf(spark) {
          EventStream.writeParquet(
            EventStream.tumblingCounts(EventStream.readEvents(spark, eventsDropDir(spark, dir))),
            out, ckpt)
            .awaitTermination()
        }
        deleteRecursively(ckpt) // dead once the query terminates; out must outlive the DataFrame
        spark.read.parquet(out)
          .select(col("window.start").as("w"), col("event_type"), col("n"), col("s"))
          .orderBy("w", "event_type")
      },
      Some(
        // max(ts) truncated to micros (CAST to TIMESTAMP) — the stream's
        // watermark derives from the micros-normalized copy, so the oracle
        // threshold must truncate identically or a max-ts within 999ns past
        // an hour+2h boundary would admit a window the stream withholds
        """SELECT * FROM (
          |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, event_type,
          |         count(*) AS n, """.stripMargin +
          graft.Exact.moneySumSql("value") + """ AS s
          |  FROM events GROUP BY 1, 2)
          |WHERE w + INTERVAL 1 HOUR <= (SELECT CAST(max(ts) AS TIMESTAMP) FROM events) - INTERVAL 2 HOUR
          |ORDER BY w, event_type""".stripMargin)),

    GraftQuery(
      "q_stream_session",
      "Structured Streaming 30-min session windows per user executed end-to-end " +
        "(source→watermark→session state→sink); result = the watermark-closed " +
        "sessions. Oracle = batch gaps-and-islands sessionization + the same " +
        "watermark cut as a HAVING clause.",
      (spark, dir) => {
        val out = graft.Scratch.dir("graft_sq_out")
        val ckpt = graft.Scratch.dir("graft_sq_ck")
        reapAtExit.add(out)
        withStreamConf(spark) {
          EventStream.writeParquet(
            EventStream.sessionCounts(EventStream.readEvents(spark, eventsDropDir(spark, dir))),
            out, ckpt)
            .awaitTermination()
        }
        deleteRecursively(ckpt)
        spark.read.parquet(out)
          .select(
            col("session_window.start").as("ws"),
            col("session_window.end").as("we"),
            col("user_id"), col("n"))
          .orderBy("user_id", "ws")
      },
      Some(
        // Gap boundary: Spark's session_window treats an event landing exactly
        // gap seconds after the previous one as a NEW session (sessions
        // [t, t+gap) merge only on strict overlap), so the batch break flag is
        // `>= 1800`, NOT q_ts_session's `> 1800`. Emission rule and micros
        // truncation follow q_stream_tumbling (end <= max(ts) - 2h).
        // both windowed CTEs order by (ts, event_id): dropping the tie-breaker
        // from the running sum would let tied timestamps land in different
        // sessions run-to-run
        """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
          |g AS (SELECT user_id, ts, event_id, CASE WHEN
          |  epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800
          |  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS brk
          |  FROM e),
          |s AS (SELECT user_id, ts, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g),
          |sess AS (SELECT user_id, min(ts) AS ws, max(ts) + INTERVAL 30 MINUTE AS we,
          |  count(*) AS n FROM s GROUP BY user_id, sid)
          |SELECT ws, we, user_id, n FROM sess
          |WHERE we <= (SELECT max(ts) FROM e) - INTERVAL 2 HOUR
          |ORDER BY user_id, ws""".stripMargin)),

    GraftQuery(
      "q_stream_dedup",
      "Streaming exactly-once dedup under at-least-once delivery: every event is " +
        "delivered TWICE to the stream; watermarked dropDuplicates(event_id) must " +
        "reduce the sink back to the original per-type counts — oracle reads the " +
        "single-copy events table. Dedup state is watermark-bounded (2 h of ids).",
      (spark, dir) => {
        val out = graft.Scratch.dir("graft_sq_out")
        val ckpt = graft.Scratch.dir("graft_sq_ck")
        reapAtExit.add(out)
        withStreamConf(spark) {
          EventStream.writeParquet(
            EventStream.dedup(EventStream.readEvents(spark, duplicatedDropDir(spark, dir))),
            out, ckpt)
            .awaitTermination()
        }
        deleteRecursively(ckpt)
        spark.read.parquet(out)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type")),

    GraftQuery(
      "q_stream_dupe_filter",
      "APRS-IS 30-second content dedup executed end-to-end on the at-least-" +
        "once fixture (every event delivered twice): a packet is suppressed " +
        "when its (callsign, payload) content was seen under 30 s ago, which " +
        "is exactly a 30-second-gap session window keyed on the content — " +
        "per session the first packet is kept, the rest are dupes. Result = " +
        "per-payload kept vs seen counts over the watermark-closed " +
        "sessions; oracle = the doubled events table through the same " +
        "gaps-and-islands sessionization + watermark HAVING cut.",
      (spark, dir) => {
        val out = graft.Scratch.dir("graft_sq_out")
        val ckpt = graft.Scratch.dir("graft_sq_ck")
        reapAtExit.add(out)
        // width 4, not the default 2: the content key is near-event-grain
        // (~190k sessions vs the other streams' thousands of windows), so
        // the state store is the widest in the suite (StreamProbe sweep:
        // 2.86 s @2, 2.34 s @4, 2.50 s @8)
        withStreamConf(spark, widthOr(4)) {
          EventStream.writeParquet(
            EventStream.dupeFilterCounts(
              EventStream.readEvents(spark, duplicatedDropDir(spark, dir))),
            out, ckpt)
            .awaitTermination()
        }
        deleteRecursively(ckpt)
        spark.read.parquet(out)
          .groupBy("payload")
          .agg(count(lit(1)).as("n_kept"), sum(col("n")).as("n_seen"))
          .orderBy("payload")
      },
      Some(
        // The doubled multiset makes every event its own dupe. The copy
        // index `cp` is a LOAD-BEARING tie-breaker: the two copies tie on
        // (ts, event_id), and the lag pass and the running-sum pass are
        // separate window sorts whose tie orders need not agree — without
        // cp the brk=1 copy can land AFTER its brk=0 twin in the second
        // sort, splitting one session into two (observed: +34 phantom
        // sessions at sf0.01). Gap boundary >= 30 and the
        // end <= max(ts) - 2h emission cut follow q_stream_session exactly.
        """WITH e0 AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
          |    event_id FROM events),
          |e AS (SELECT *, 0 AS cp FROM e0 UNION ALL SELECT *, 1 AS cp FROM e0),
          |g AS (SELECT user_id, event_type, ts, event_id, cp, CASE WHEN
          |  epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id, event_type
          |    ORDER BY ts, event_id, cp)) >= 30
          |  OR lag(ts) OVER (PARTITION BY user_id, event_type
          |    ORDER BY ts, event_id, cp) IS NULL THEN 1 ELSE 0 END AS brk FROM e),
          |s AS (SELECT user_id, event_type, ts, CAST(sum(brk) OVER (
          |    PARTITION BY user_id, event_type ORDER BY ts, event_id, cp
          |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g),
          |sess AS (SELECT user_id, event_type,
          |    max(ts) + INTERVAL 30 SECOND AS we, count(*) AS n
          |  FROM s GROUP BY user_id, event_type, sid)
          |SELECT event_type AS payload, count(*) AS n_kept,
          |  CAST(sum(n) AS BIGINT) AS n_seen
          |FROM sess WHERE we <= (SELECT max(ts) FROM e0) - INTERVAL 2 HOUR
          |GROUP BY event_type ORDER BY payload""".stripMargin)),

    GraftQuery(
      "q_stream_join",
      "REAL stream-stream self-join under the oracle gate: same-user event pairs " +
        "within ±5 min, both sides watermarked so join state stays bounded. Over " +
        "AvailableNow static input append mode emits every match, so the plain " +
        "batch join is the exact oracle — per-user pair counts. Runs on a " +
        "deterministic 10% user cohort: the semantics are identical and the " +
        "bench measures the join machinery, not 10× the pair state.",
      (spark, dir) => {
        val out = graft.Scratch.dir("graft_sq_out")
        val ckpt = graft.Scratch.dir("graft_sq_ck")
        reapAtExit.add(out)
        val drop = cohortDropDir(spark, dir)
        def side = EventStream.readEvents(spark, drop)
        withStreamConf(spark) {
          EventStream.writeParquet(
            EventStream.pairCounts(side, side),
            out, ckpt)
            .awaitTermination()
        }
        deleteRecursively(ckpt)
        spark.read.parquet(out)
          .groupBy(col("ua").as("user_id"))
          .agg(count(lit(1)).as("n"))
          .orderBy("user_id")
      },
      Some(
        // micros truncation first (CAST AS TIMESTAMP) — the stream reads the
        // micros-normalized copy, and a pair exactly at the ±300 s boundary
        // would otherwise join differently at nanos precision
        """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
          |           WHERE user_id % 10 = 0)
          |SELECT a.user_id, count(*) AS n FROM e a JOIN e b
          |ON a.user_id = b.user_id AND a.event_id < b.event_id
          |AND b.ts >= a.ts - INTERVAL 5 MINUTE AND b.ts <= a.ts + INTERVAL 5 MINUTE
          |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin)),

    GraftQuery(
      "q_stream_enrich",
      "REAL stream-STATIC enrichment join under the oracle gate — the " +
        "dimension-lookup shape every event pipeline runs: each event joined " +
        "to its customer row (broadcast static dim, stateless join), then " +
        "per-hour windowed count/exact-sum per market segment. The watermark " +
        "is set on the source before the join, so append-mode emission " +
        "follows q_stream_tumbling's rule (window.end <= max(ts) - 2h) and " +
        "the batch join+HAVING is the exact oracle.",
      (spark, dir) => {
        val out = graft.Scratch.dir("graft_sq_out")
        val ckpt = graft.Scratch.dir("graft_sq_ck")
        reapAtExit.add(out)
        val dim = Tables.table(spark, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        withStreamConf(spark) {
          EventStream.writeParquet(
            EventStream.enrichedSegmentCounts(
              EventStream.readEvents(spark, eventsDropDir(spark, dir)), dim),
            out, ckpt)
            .awaitTermination()
        }
        deleteRecursively(ckpt)
        spark.read.parquet(out)
          .select(col("window.start").as("w"), col("c_mktsegment"), col("n"), col("s"))
          .orderBy("w", "c_mktsegment")
      },
      Some(
        """SELECT * FROM (
          |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, c_mktsegment,
          |         count(*) AS n, """.stripMargin +
          graft.Exact.moneySumSql("value") + """ AS s
          |  FROM events JOIN customer ON user_id = c_custkey GROUP BY 1, 2)
          |WHERE w + INTERVAL 1 HOUR <= (SELECT CAST(max(ts) AS TIMESTAMP) FROM events) - INTERVAL 2 HOUR
          |ORDER BY w, c_mktsegment""".stripMargin)),

    GraftQuery(
      "q_stream_state",
      "REAL flatMapGroupsWithState pipeline under the oracle gate — the " +
        "arbitrary-state streaming API (the surface session trackers and " +
        "online feature stores build on), proven against a plain batch " +
        "aggregation: per-user running (count, exact cents, first/last " +
        "micros) state, one appended row per (user, micro-batch). Every " +
        "state field is order-insensitive by design (associative count/" +
        "sum, commutative min/max — micro-batch boundaries and in-batch " +
        "order are nondeterministic on a real stream); the read-back " +
        "selects each user's LAST emitted row via max_by on the strictly " +
        "monotone count (the running SUM is only monotone while values " +
        "are non-negative, so it must not self-select by max). " +
        "State is one 4-long tuple per live user — bytes per key, " +
        "watermark-free.",
      (spark, dir) => {
        val out = graft.Scratch.dir("graft_sq_out")
        val ckpt = graft.Scratch.dir("graft_sq_ck")
        reapAtExit.add(out)
        withStreamConf(spark) {
          EventStream.writeParquet(
            EventStream.userRunningState(
              EventStream.readEvents(spark, eventsDropDir(spark, dir)))
              .toDF("user_id", "n", "cents", "first_us", "last_us"),
            out, ckpt)
            .awaitTermination()
        }
        deleteRecursively(ckpt)
        spark.read.parquet(out)
          .groupBy("user_id")
          // the final state row is the one with the LARGEST n (count is
          // strictly monotone across batch emits); cents rides max_by on it
          // rather than its own max(), which is only correct while every
          // value is non-negative — a refund-shaped event would make the
          // running sum non-monotone and max() would silently overshoot
          // under a multi-batch split (r13 review)
          .agg(max(col("n")).as("n"), expr("max_by(cents, n)").as("cents"),
            min(col("first_us")).as("first_us"), max(col("last_us")).as("last_us"))
          .orderBy("user_id")
      },
      Some(
        """SELECT user_id, count(*) AS n,
          |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
          |    AS cents,
          |  CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS first_us,
          |  CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS last_us
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    GraftQuery(
      "q_stream_upsert",
      "foreachBatch MERGE-style upsert into a bucket-partitioned keyed " +
        "table (UpsertSink) — the reference's packets→relational-DB write " +
        "path as a lake sink: per-bucket snapshot versions with an atomic " +
        "_meta commit carrying the batchId, so replayed micro-batches are " +
        "EXACTLY-ONCE per bucket under any crash point (replay machinery " +
        "exercised in UpsertSinkSpec). maxFilesPerTrigger=1 forces real " +
        "multi-batch commits; result = the committed table read back " +
        "through the per-bucket version pointers; oracle = the same final " +
        "state as one batch aggregation.",
      (spark, dir) => {
        val target = graft.Scratch.dir("graft_ups_tgt")
        val ckpt = graft.Scratch.dir("graft_ups_ck")
        reapAtExit.add(target)
        withStreamConf(spark) {
          UpsertSink.run(spark, eventsDropDir(spark, dir), target, ckpt)
            .awaitTermination()
        }
        deleteRecursively(ckpt)
        UpsertSink.readTable(spark, target).orderBy("user_id")
      },
      Some(
        """SELECT user_id, count(*) AS n_events,
          |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
          |    AS cents,
          |  CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS last_us
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
