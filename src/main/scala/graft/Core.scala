package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One named operator from the contract (SURVEY.md §2): a Spark-first
  * implementation plus — when SQL-expressible — the DuckDB oracle twin the
  * driver hash-compares against (SURVEY.md Appendix A).
  *
  * Output column names MUST match between `run` and `oracle`: the driver
  * sorts columns by name before hashing values.
  */
final case class GraftQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Parquet table loader. One file per table per scale dir (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Analyzed base relations are memoized per (session, dir, table): each
    * spark.read.parquet re-lists the path and re-reads the footer schema —
    * ~50-100 ms of driver latency that a 56-query run pays dozens of times
    * for the same immutable files. The memo stores the lazy logical plan
    * only (no data is cached). */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Long, String, String), DataFrame]()

  /** Collision-free session identity: identityHashCode (the previous key)
    * could collide across two live sessions and hand one a DataFrame bound to
    * the other — that correctness hazard is what this registry fixes. It is
    * NOT an eviction mechanism: a session whose DataFrames sit in `memo`
    * stays strongly reachable through them, so neither its registry entry nor
    * its memo entries are collected while this JVM lives. Every shipped main
    * runs one session per JVM, where that cost is a handful of lazy plans; a
    * long-lived multi-session host should call [[dropMemo]] when it retires a
    * session. */
  private val sessionIds = new java.util.WeakHashMap[SparkSession, java.lang.Long]()
  private val nextSessionId = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def sessionId(s: SparkSession): Long = sessionIds.synchronized {
    var id = sessionIds.get(s)
    if (id == null) { id = nextSessionId.incrementAndGet(); sessionIds.put(s, id) }
    id
  }

  /** Session-scoped memo registry: every module-level cache keyed by
    * (sessionId, ...) tuples registers itself here so [[dropMemo]] retires
    * it with the session — an unregistered cache (signature tables, ANN
    * indexes, drop dirs, archives) would keep strong references to the
    * retired session's checkpointed plans forever (r13 review found six
    * such caches outside this hook). */
  private val sessionScoped = new java.util.concurrent.CopyOnWriteArrayList[
    java.util.concurrent.ConcurrentHashMap[_ <: Product, _]]()
  private[graft] def registerSessionScoped[K <: Product, V](
      m: java.util.concurrent.ConcurrentHashMap[K, V])
      : java.util.concurrent.ConcurrentHashMap[K, V] = {
    sessionScoped.add(m); m
  }

  /** Release a retired session's memoized plans and artifacts
    * (multi-session hosts). */
  def dropMemo(spark: SparkSession): Unit = {
    val id = sessionId(spark)
    memo.keySet.removeIf(_._1 == id)
    sessionScoped.forEach(m =>
      m.keySet.removeIf(k => k.productElement(0) == id))
  }

  /** Entries still held for a session across ALL registered caches —
    * the retirement test's observable. */
  private[graft] def sessionScopedEntries(spark: SparkSession): Int = {
    val id = sessionId(spark)
    var n = 0
    memo.keySet.forEach(k => if (k._1 == id) n += 1)
    sessionScoped.forEach(m =>
      m.keySet.forEach(k => if (k.productElement(0) == id) n += 1))
    n
  }

  /** events.ts is physically TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects. Read it as a nanos Long (legacy conf) and truncate to micros —
    * integer `div 1000`, matching DuckDB's nanos→micros truncation exactly
    * (verified on the fixtures: nanos are NOT micro-aligned, so rounding
    * would diverge). Double division would also be wrong: 1.7e18 > 2^53.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    memo.computeIfAbsent((sessionId(spark), sfDir, name), _ => {
      if (name == "events") {
        // scope the legacy conf to this read: spark.read.parquet resolves the
        // schema eagerly and snapshots the hadoop conf into the relation, so
        // restoring right after does not affect this plan's execution — but a
        // session-wide leak would change how the EMBEDDER's own nanos parquet
        // reads behave
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "true")
        try {
          val df = spark.read.parquet(s"$sfDir/$name.parquet")
          if (df.schema("ts").dataType == LongType)
            df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          else df
        } finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      } else spark.read.parquet(s"$sfDir/$name.parquet")
    })

  /** Spread a SMALL relation across the cluster before an expensive map
    * stage (regex parse, shingling, minhash, tokenize). The fixture tables
    * are one row group in one file, so their scans are a single input split —
    * every downstream map-side expression would run on ONE core no matter how
    * many the session has. A round-robin repartition of the slim pre-explode
    * rows (documents: 5k rows / 0.6 MB at sf0.1) costs a negligible exchange
    * and buys map-side parallelism. At 100 TB inputs arrive as thousands
    * of row groups and scans parallelize natively — this exchange is the
    * standard "parallelize the expensive stage behind a selective/small scan"
    * move, not a scale crutch; keep it only where the downstream per-row work
    * dominates the shuffle (never in front of plain scans/filters).
    *
    * Width (r16 optimization round): the session's shuffle width, capped at
    * defaultParallelism — NOT raw defaultParallelism. A per-ROW map stage's
    * useful parallelism is bounded by the same data volume the session
    * already sized its shuffles to (guide §2: derive partitioning from input
    * size, not the core count); at local[32] over sf0.1 a 32-way spread is
    * pure task-launch overhead on a few-hundred-ms stage. Measured
    * (ConfProbe, 45 spread-consuming queries, interleaved 5-pass medians,
    * 32 cores): 15.23 s at width 32 → 11.0 s at width 8 (−28%, uniform
    * except the pair-join site below). On a cluster, shuffle width is
    * data-sized (bytes/200 MB), so this inherits scale-adaptivity; the cap
    * keeps a default-200-partition local session at the old behavior.
    * Downstream work that scales SUPER-linearly in block sizes (pair joins)
    * wants cores regardless of input bytes — that is [[spreadWide]]. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spreadWidth(spark))

  /** Spread for PAIR-explosion stages (blocked self-joins whose probe-side
    * partitioning this relation's layout decides): full defaultParallelism —
    * the downstream Σ(block²) comparison work dwarfs per-row costs, so
    * undersubscribing cores loses more than the task overhead saves
    * (measured: q_dedup_fuzzy_block 0.19 s at width 32 vs 0.45 s at 8). */
  def spreadWide(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  /** [[spread]]'s width rule, with a dev-probe override (SPROBE_SPREAD env /
    * graft.probe.spread sysprop) so the width can be A/B'd under the real
    * query code — the same pattern as StreamQueries' SPROBE_SHUFFLE knob: a
    * probe that re-implemented the pipelines at another width would drift
    * from what the gated queries actually run. */
  private[graft] def spreadWidth(spark: SparkSession): Int =
    sys.props.get("graft.probe.spread").orElse(sys.env.get("SPROBE_SPREAD"))
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .getOrElse(math.min(
        spark.sessionState.conf.numShufflePartitions,
        spark.sparkContext.defaultParallelism))
}

/** Timestamp-type portability helpers. The driver-generated fixtures have
  * switched the `events.ts` physical type between TIMESTAMP (isAdjustedToUTC)
  * and TIMESTAMP_NTZ across rounds; Spark 4 refuses the direct
  * `CAST(TIMESTAMP_NTZ AS DOUBLE)` that epoch-seconds arithmetic needs, while
  * `CAST(TIMESTAMP AS DOUBLE)` is fine. Routing through TimestampType first is
  * the identity for tz-typed input and the wall-clock-as-UTC reinterpretation
  * for NTZ input (sessions run with spark.sql.session.timeZone=UTC), which is
  * exactly DuckDB's `epoch(ts)` on the same naive value — so every epoch
  * comparison stays bitwise-identical across engines under EITHER fixture
  * type. Only internal arithmetic goes through here. Timestamp OUTPUT columns
  * passed through untouched keep the fixture's native type; columns REBUILT
  * from epoch arithmetic must go through [[Ts.fromEpochSec]] with the source
  * column's DataType, because bare timestamp_seconds always yields session-tz
  * TIMESTAMP and would diverge from the oracle's naive timestamps under an
  * NTZ fixture if the compare is type-sensitive. */
object Ts {
  /** Exact epoch seconds (micros/1e6) as DOUBLE, NTZ-safe. */
  def epochSec(c: Column): Column = c.cast(TimestampType).cast(DoubleType)

  /** Epoch microseconds as LONG, NTZ-safe. */
  def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Rebuild a timestamp OUTPUT column from epoch seconds, typed to match
    * `like` (the fixture column's DataType). TIMESTAMP→TIMESTAMP_NTZ cast
    * reinterprets through the UTC session clock — the identity on the wall
    * value — so the result equals the oracle's naive timestamp either way. */
  def fromEpochSec(sec: Column, like: org.apache.spark.sql.types.DataType): Column =
    timestamp_seconds(sec).cast(like)

  /** Day ordinal — floor(epoch-seconds / 86400) as LONG, the shared
    * day-bucket device of the daily-series queries. [[dayBucketSql]] is its
    * DuckDB twin: the tree shape (floor of a true division, NOT a
    * truncating integer div — they disagree pre-1970) is the cross-engine
    * contract, so it lives in exactly one place (r14 sweep; the same
    * single-home rule as Exact.pearson). */
  def dayBucket(c: Column): Column =
    floor(epochSec(c) / lit(86400d)).cast(LongType)

  /** The oracle twin of [[dayBucket]] over a DuckDB timestamp expression.
    * The ~35 existing oracle literals inline this spelling (converting the
    * stripMargin literals to interpolation was judged churn-over-value);
    * instead AlgebraSpec pins that EVERY `/ 86400` in every registered
    * oracle matches this canonical form, so the inline copies cannot drift
    * from it — new oracles should call this helper directly. */
  def dayBucketSql(e: String): String =
    s"CAST(floor(epoch($e) / 86400) AS BIGINT)"
}

/** Scratch-directory factory: prefers the RAM-backed tmpfs (`/dev/shm`) over
  * `java.io.tmpdir` when it exists and is writable. Streaming checkpoints
  * fsync every offset/commit/state-delta file per micro-batch — on an ext4
  * `/tmp` those syncs are the dominant cost of a local AvailableNow pass,
  * while on tmpfs they are memory writes. This is local-harness plumbing,
  * not a scale posture: a production deployment points checkpoints and sinks
  * at reliable shared storage (object store / HDFS), exactly as the DuckDB
  * oracle this engine is benched against runs its pipeline fully in memory. */
object Scratch {
  /** Minimum usable space to keep allocating on the RAM-backed tmpfs —
    * below this, fall back to java.io.tmpdir so leftover scratch (e.g. after
    * a SIGKILL that skipped the shutdown hook) can never wedge /dev/shm. */
  private val ShmMinFreeBytes: Long = 512L * 1024 * 1024

  private val shm: Option[java.nio.file.Path] = {
    val p = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(p) && java.nio.file.Files.isWritable(p))
      Some(p)
    else None
  }

  private def shmUsable: Boolean = shm.exists { p =>
    try java.nio.file.Files.getFileStore(p).getUsableSpace > ShmMinFreeBytes
    catch { case _: java.io.IOException => false }
  }

  /** Every scratch dir is registered with [[TempReaper]] at creation
    * (reap-at-exit): callers that need earlier reclaim still delete eagerly
    * (idempotent), and dirs nothing else tracks — Bench/Verify/probe
    * warehouse dirs — no longer outlive the JVM on the RAM-backed tmpfs. */
  def dir(prefix: String): String = TempReaper.add((
    if (shmUsable) java.nio.file.Files.createTempDirectory(shm.get, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)).toString)
}

/** Scratch directories deleted at JVM exit. Shared by every module that
  * exports fixture copies (streaming drop-dirs, CSV/JSON/partitioned
  * exports): the dirs must outlive the lazy DataFrames that read them, so
  * the earliest safe reclaim point is session death. */
object TempReaper {
  private val paths = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def add(path: String): String = { paths.add(path); path }

  def deleteRecursively(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root) // closed below: leaks a dir fd per call otherwise
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  // per-path isolation in the hook: Spark's own shutdown hooks run
  // CONCURRENTLY with this one, so a state-store maintenance thread can
  // write into a dir between the walk snapshot and the delete
  // (DirectoryNotEmptyException) — one racy dir must not abort the hook
  // and leak every later-registered dir on the RAM-backed tmpfs
  // (r14 harness sweep)
  sys.addShutdownHook {
    paths.forEach { p =>
      try deleteRecursively(p) catch { case _: Throwable => () }
    }
  }
}

/** Determinism helpers.
  *
  * Cross-engine hash comparison of floating-point aggregates is only stable
  * when the computation is either exact (decimal / integral) or bitwise
  * identical on both engines. Two disciplines, used by every declared query:
  *
  *  1. Money sums: per-row DOUBLE → micro-unit LONG (floor(x·1e6 + 0.5) —
  *     deterministic per row, exact for the ≤6-dp money fixtures whose
  *     micro-values sit within 1e-4 of an integer), exact LONG accumulation
  *     (associative ⇒ partition-order-insensitive), integer round-to-cents,
  *     cast to DOUBLE. A plain double sum would depend on partition/merge
  *     order — fine at sf0.01, a hash mismatch at 100 TB. Round 2 used
  *     DECIMAL(28,6) accumulation for the same determinism; at precision 28
  *     Spark sums via BigDecimal (non-compact representation), which measured
  *     as the dominant avoidable cost in the suite (~1.3 s for three sums over
  *     600 k rows). The scaled-long form is whole-stage-codegen'd integer
  *     arithmetic end to end.
  *
  *  2. Vector math: products computed as DOUBLE (exact for float operands),
  *     sequential left-to-right fold — bitwise identical to DuckDB's
  *     list_sum(list_transform(...)) twin (verified this session; DuckDB's
  *     builtin list_cosine_similarity computes in float and differs by ~1e-7,
  *     so the oracle SQL uses the manual double formula instead).
  */
object Exact {
  /** Order-insensitive exact money sum rounded to cents, as DOUBLE.
    *
    * Fixed-point accumulation in LONG micro-units, split into whole-dollar and
    * fractional sums so neither overflows at cluster scale:
    *
    *   m  = floor(x·1e6 + 0.5)            per-row micro-units (exact: money
    *                                      values are ≤6 dp, so x·1e6 lands
    *                                      within ~1e-4 of an integer — both
    *                                      engines compute the identical IEEE
    *                                      double before the floor)
    *   fr = pmod(m, 1e6), dw = (m−fr)/1e6 per-row split; the division is over
    *                                      an exact multiple, so truncating and
    *                                      floor division agree for any sign
    *   Σdw, Σfr                           two LONG sums in one codegen'd hash
    *                                      agg. Σdw overflows only past ~9.2
    *                                      QUADRILLION dollars per group (a
    *                                      100 TB TPC-H group sums ~3e16 — ok);
    *                                      Σfr ≤ 1e6·rows, safe to ~9e12 rows
    *                                      per group. ANSI mode makes overflow
    *                                      loud, never silent.
    *   carry/rem/cents                    integer round-half-up to cents, then
    *                                      one double add + divide — identical
    *                                      IEEE ops on both engines.
    *
    * Equal to the DECIMAL(28,6)-accumulate-then-round form on all fixture
    * money columns (verified: every moneySum call site sums non-negative ≤2-dp
    * values), at integer-sum speed instead of BigDecimal speed.
    */
  private val micro = lit(1000000L)

  /** Per-row micro-units: floor(x·1e6 + 0.5) as LONG.
    *
    * Domain precondition (class 22c): x must be FINITE — Spark's
    * floor→LONG silently saturates a NaN to 0 (a NaN money value would
    * count as $0) and ±Inf to ±Long.MaxValue, while the DuckDB twin's
    * CAST raises. The guard is deliberately NOT in this hot codegen'd
    * path (it sits inside every money aggregation); production enforces
    * finiteness at ingest via the QualityOps constraint census, exactly
    * like the realizable-statistics precondition on [[pearson]]. */
  def microUnits(c: Column): Column = floor(c * lit(1000000d) + lit(0.5d))

  /** Per-row fractional micro part, in [0, 1e6) for any sign. */
  def microFr(c: Column): Column = pmod(microUnits(c), micro)

  /** Per-row whole-dollar part (floor semantics; exact-multiple division). */
  def microDw(c: Column): Column = {
    val m = microUnits(c)
    call_function("div", m - pmod(m, micro), micro)
  }

  /** Final integer round-to-cents over the two accumulated LONG sums.
    * Because integer addition is associative, feeding this PARTIAL sums of
    * (dw, fr) — e.g. pre-aggregated per join key before a fact-fact join —
    * yields the bit-identical result to the flat single-level sum. */
  def moneyFinish(sd: Column, sf: Column): Column = {
    val carry = call_function("div", sf, micro)
    val rem = sf % micro
    val cents = call_function("div", rem + lit(5000L), lit(10000L))
    (sd + carry).cast(DoubleType) + cents.cast(DoubleType) / lit(100.0)
  }

  def moneySum(c: Column): Column =
    moneyFinish(sum(microDw(c)), sum(microFr(c)))

  /** Order-insensitive average via nano-unit LONG accumulation — the
    * deterministic replacement for avg() wherever the result feeds a
    * threshold, argmin or cell assignment. A plain double avg() varies in the
    * last bits with shuffle-block arrival order, so "cast to FLOAT absorbs
    * the noise" is only probabilistic (and the margin shrinks as group sizes
    * grow); here the per-row floor is identical IEEE on both engines and the
    * integer sum is associative, so the result is bit-stable under ANY
    * partitioning at any scale. Quantizes inputs to 1e-9 — far below the
    * float ulp the centroid pipeline rounds to. Overflow: |x|≲1 inputs keep
    * the sum within LONG up to ~7e9 rows per group; past that, split like
    * [[moneySum]]. count(c) (null-skipping) mirrors avg()'s semantics. */
  def nanoAvg(c: Column): Column =
    sum(floor(c.cast(DoubleType) * lit(1e9) + lit(0.5d))).cast(DoubleType) /
      (count(c).cast(DoubleType) * lit(1e9))

  /** DuckDB twin of [[nanoAvg]] (HUGEINT sum cast back through BIGINT). */
  def nanoAvgSql(e: String): String =
    s"(CAST(CAST(sum(CAST(floor(CAST($e AS DOUBLE)*1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)" +
      s" / (CAST(count($e) AS DOUBLE) * 1000000000))"

  /** DuckDB twin of [[moneySum]] — the same integer arithmetic, spelled in
    * DuckDB SQL. `//` only ever divides non-negative values or exact
    * multiples, where floor and truncating division agree; integer sums are
    * cast back from DuckDB's HUGEINT widening before use. */
  def moneySumSql(expr: String): String = {
    val m = s"CAST(floor(($expr)*1000000 + 0.5) AS BIGINT)"
    val fr = s"((($m) % 1000000 + 1000000) % 1000000)"
    val dw = s"((($m) - $fr) // 1000000)"
    val sd = s"CAST(sum($dw) AS BIGINT)"
    val sf = s"CAST(sum($fr) AS BIGINT)"
    s"(CAST($sd + ($sf // 1000000) AS DOUBLE) + " +
      s"CAST((($sf % 1000000) + 5000) // 10000 AS DOUBLE)/100.0)"
  }

  /** Dot product of two float arrays in double precision. Delegates to the
    * codegen'd [[graft.functions.FloatDotProduct]] Catalyst expression —
    * bitwise-identical to the composable higher-order-function form
    * `aggregate(zip_with(a,b,(x,y)=>x.cast(double)*y.cast(double)), 0d, _+_)`
    * but ~25× faster (the HOF form is interpreted per element). */
  def dot(a: Column, b: Column): Column = functions.VectorExpr.dotF(a, b)

  /** DuckDB twin of [[dot]]: double products, sequential double fold. */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))"

  def squaredNormSql(a: String): String =
    s"list_sum(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))"

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, defined as NULL for a zero-norm operand — on BOTH
    * engines. The naked division diverges exactly there: Spark evaluates
    * 0/0 to IEEE NaN while DuckDB defines double division by zero as NULL
    * (r16 device-fuzz finding, BASELINE.md class 22). Fixtures carry no
    * zero vectors, but a 100 TB embedding corpus will; NULL ("similarity
    * undefined") is the right answer and the twins agree on it bitwise.
    * A NaN norm (NaN/Inf components) passes the guard on both engines:
    * Spark's `=!=` uses NaN==NaN semantics and DuckDB's NULLIF compares
    * NaN=0 false, so both produce NaN — still bitwise-equal. */
  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den =!= lit(0.0), dot(a, b) / den)
  }

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / NULLIF(sqrt(${squaredNormSql(a)}) * sqrt(${squaredNormSql(b)}), 0))"

  /** The class-22 division device: num / den defined as NULL when den = 0,
    * on BOTH engines. Spark evaluates double x/0 to IEEE ±Inf (and 0/0 to
    * NaN, which sorts FIRST under `desc` and passes `> t` filters) while
    * DuckDB defines double division by zero as NULL (sorts last, fails
    * every filter) — so every statistic whose denominator can reach zero
    * on real data (zero variance, all-tied ranks, single-class sequences,
    * zero-norm vectors) silently diverges. One guarded device + its SQL
    * twin, so the spelling can't drift per site. */
  def divNZ(num: Column, den: Column): Column =
    when(den =!= lit(0.0), num / den)

  def divNZSql(num: String, den: String): String =
    s"(($num) / NULLIF($den, 0))"

  /** √x defined only for x ≥ 0 (NULL otherwise) — the sqrt half of
    * class 22: DuckDB RAISES on sqrt of a negative where Spark yields NaN,
    * and a variance that is mathematically ≥ 0 can still round to −ε in
    * doubles when the mean term nearly cancels the square term. The CASE
    * evaluates the identical double on both engines, so the ≥ 0 decision
    * is engine-identical too. */
  def sqrtNN(x: Column): Column = when(x >= lit(0.0), sqrt(x))

  def sqrtNNSql(x: String): String =
    s"(CASE WHEN ($x) >= 0 THEN sqrt($x) END)"

  /** The log half of class 22, ORACLE-side only: DuckDB RAISES on ln of
    * zero or a negative where Spark's `log` is already NULL there (Catalyst
    * UnaryLogExpression guards at its yAsymptote) — so Spark call sites
    * keep the plain `log` and only the twin SQL needs this CASE. Spelled
    * once here so a future oracle can't reintroduce a naked `ln(x)` over a
    * domain that can reach zero (r16 log audit: most ln sites are safe by
    * construction — counts ≥ 1, positivity filters — the exceptions are
    * recorded in BASELINE.md). */
  def lnPosSql(x: String): String =
    s"(CASE WHEN ($x) > 0 THEN ln($x) END)"

  /** x for FINITE x, NULL otherwise — on both engines (class 22c): Spark's
    * floor/ceil→LONG silently SATURATES non-finite doubles (NaN → 0!,
    * +Inf → Long.MaxValue) while DuckDB's CAST(… AS BIGINT) raises, so any
    * quantization of a double that can be NaN/Inf on real data must pass
    * through this first. The integer-quantizing aggregate devices
    * (microUnits/moneySum/nanoAvg) deliberately do NOT carry this guard in
    * their hot codegen'd paths: their scaladocs state the finite-input
    * precondition, and at scale the data-quality constraint operators
    * (QualityOps) are the production enforcement point. */
  def finite(x: Column): Column =
    when(!isnan(x) && x =!= lit(Double.PositiveInfinity) &&
      x =!= lit(Double.NegativeInfinity), x)

  def finiteSql(x: String): String =
    s"(CASE WHEN isfinite($x) THEN ($x) END)"

  /** The quantized-ln twin pair (the ONLY gate-stable way to compare ln
    * cross-engine — class 22b: transcendentals differ by 1 ulp between
    * JDK Math.log and libm, so raw ln is never compared): NULL for
    * non-positive and non-finite input on both engines, floor(ln·1e6) as
    * LONG otherwise. Spelled once, used by q_math_funcs and both
    * device-parity families, so the quantization can't drift per site. */
  def lnQuant(x: Column): Column = floor(finite(log(x)) * lit(1e6))

  def lnQuantSql(x: String): String =
    s"CAST(floor(${finiteSql(lnPosSql(x))}*1e6) AS BIGINT)"

  /** [[cosine]]'s zero-norm guard for call sites that PRECOMPUTE the
    * denominator (a reused norm column, a broadcast query-side norm): the
    * similarity pipelines divide by `nrm * qn` to avoid recomputing norms
    * per pair, and every one of those inline divisions carried the class-22
    * divergence (Spark 0/0 → NaN — which sorts FIRST under `desc`, so a
    * zero-norm vector would win a top-k! — vs DuckDB /0 → NULL, which sorts
    * last). Domain-named alias of [[divNZ]]. */
  def cosineOver(dotE: Column, den: Column): Column = divNZ(dotE, den)

  def cosineOverSql(dotE: String, den: String): String = divNZSql(dotE, den)

  /** Pearson r from exact BIGINT sufficient statistics (n, Σx, Σy, Σxy,
    * Σx², Σy²) — the ONE closed IEEE tree the daily-series correlation
    * family (q_ts_autocorr/acf/ccf, q_stats_spearman) shares:
    * (n·sxy − sx·sy) / (√(n·sxx − sx²) · √(n·syy − sy²)), every operand
    * cast to double FIRST so both engines run the identical operation
    * order. Previously copy-pasted per query; the tree shape is the
    * cross-engine contract, so it must live in exactly one place.
    *
    * Defined as NULL for a ZERO-VARIANCE series — on both engines. The
    * naked division diverged exactly there (Spark 0/0 → IEEE NaN, DuckDB
    * double /0 → NULL; r16 device-fuzz finding, BASELINE.md class 22), and
    * a constant daily-count series is entirely reachable at scale (an
    * event_type logging exactly k events every day; all-tied ranks in the
    * Spearman rewrite). Correlation against a constant is undefined; NULL
    * is the honest answer and the twins now agree on it bitwise.
    * The sqrt legs are [[sqrtNN]], not bare sqrt: Cauchy–Schwarz guarantees
    * n·sxx−sx² ≥ 0 only in EXACT integer arithmetic — once the statistics
    * are cast to double, products around 2e19 carry ~4096 ulp and a
    * realizable near-constant large-magnitude series (n≈3000, x≈1e6,
    * true variance a few thousand) can round the difference NEGATIVE.
    * Both engines compute the identical negative double, but DuckDB
    * RAISES on sqrt of a negative where Spark yields NaN — so the guarded
    * pair defines such a below-double-precision variance as NULL on both
    * (r16 diff review; the same −ε discipline as the z-score/t-test
    * sites). Statistics must still be REALIZABLE (sums of an actual
    * sample) — that is what bounds the rounding error to the −ε case. */
  def pearson(n: Column, sx: Column, sy: Column, sxy: Column,
      sxx: Column, syy: Column): Column = {
    def D(c: Column) = c.cast(org.apache.spark.sql.types.DoubleType)
    val den = sqrtNN(D(n) * D(sxx) - D(sx) * D(sx)) *
      sqrtNN(D(n) * D(syy) - D(sy) * D(sy))
    when(den =!= lit(0.0), (D(n) * D(sxy) - D(sx) * D(sy)) / den)
  }

  /** DuckDB twin of [[pearson]], now single-homed like the Spark side (the
    * four correlation oracles previously inlined the tree by hand — the
    * copy-drift class the review sweeps keep finding — and the zero-variance
    * guard forces them all to change in lockstep anyway). Arguments are SQL
    * expressions for the six BIGINT statistics. */
  def pearsonSql(n: String, sx: String, sy: String, sxy: String,
      sxx: String, syy: String): String = {
    def d(e: String) = s"CAST($e AS DOUBLE)"
    val den = s"(${sqrtNNSql(s"${d(n)} * ${d(sxx)} - ${d(sx)} * ${d(sx)}")} * " +
      s"${sqrtNNSql(s"${d(n)} * ${d(syy)} - ${d(sy)} * ${d(sy)}")})"
    s"((${d(n)} * ${d(sxy)} - ${d(sx)} * ${d(sy)}) / NULLIF($den, 0))"
  }
}
