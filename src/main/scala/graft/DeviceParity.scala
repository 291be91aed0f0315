package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial cross-engine parity gate for the SHARED devices (Exact, Ts)
  * whose Spark/DuckDB twin pairs every gated oracle is built from.
  *
  * Why this exists: the oracle gate witnesses twin agreement only on the
  * FIXTURE value domain — all-positive money, post-1970 timestamps, no
  * ties at the rounding boundary — and every one of the 21 review-sweep
  * divergence classes (BASELINE.md) was found where that domain ends.
  * This main evaluates each device over a hand-adversarial input set
  * (negative money, pre-1970 timestamps, exact .5-cent/.5-micro ties,
  * epoch 0, zero/negative vectors, near-wrap sufficient statistics) and
  * dumps inputs + Spark results + the twin SQL; tools/device_parity.py
  * replays the twins in DuckDB and demands bitwise equality, exactly like
  * the driver's oracle compare. Usage:
  *   sbt "runMain graft.DeviceParity /tmp/devpar"
  *   python3 tools/device_parity.py /tmp/devpar
  */
object DeviceParity {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args(0))
    spark.stop()
  }

  /** Dump inputs + Spark device results + twin manifest into `outDir`
    * (session-reusable so DeviceParitySpec can gate this in `sbt test`
    * without stopping the shared session). */
  def run(spark: SparkSession, outDir: String): Unit = {
    import spark.implicits._
    new java.io.File(outDir).mkdirs()

    def dump(name: String, in: DataFrame, out: DataFrame, twin: String): (String, String) = {
      in.coalesce(1).write.mode("overwrite").parquet(s"$outDir/in_$name")
      out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/dev_$name")
      name -> twin
    }

    // ---- money: Exact.moneySum / moneySumSql ------------------------------
    // adversarial: negatives (pmod vs %-sign class 1), exact .5-cent ties
    // (x.xx5 at the 3rd decimal rounds HALF-UP via the +0.5 floor on both
    // engines), zero, large magnitudes, and 6-dp micro-unit edges.
    val money = Seq(
      0.0, 0.01, -0.01, 0.005, -0.005, 0.015, -0.015, 0.285, -0.285,
      123456789.12, -123456789.12, 0.125, -0.125, 1e9 - 0.005,
      -(1e9 - 0.005), 42.424242, -42.424242, 0.000001, -0.000001)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "x")
    val moneyTwin = dump("money_sum", money,
      money.agg(Exact.moneySum(col("x")).as("s")),
      s"SELECT ${Exact.moneySumSql("x")} AS s FROM t")

    // ---- nanoAvg: Exact.nanoAvg / nanoAvgSql ------------------------------
    val nano = Seq(0.0, 1e-9, -1e-9, 0.5, -0.5, 0.1234567895, -0.1234567895,
      0.9999999995, -0.9999999995, 1.0, -1.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "x")
    val nanoTwin = dump("nano_avg", nano,
      nano.agg(Exact.nanoAvg(col("x")).as("a")),
      s"SELECT ${Exact.nanoAvgSql("x")} AS a FROM t")

    // ---- time: Ts.epochSec / epochMicros / dayBucket ----------------------
    // adversarial: pre-1970 (floor-vs-truncation class 7 territory), the
    // last micro before epoch 0, epoch 0 itself, a pre-1970 midday, the
    // 32-bit rollover, and sub-second fractions on both sides of zero.
    val ts = Seq(
      "1969-12-31 23:59:59.999999", "1969-07-20 20:17:40",
      "1969-12-31 23:59:59.000001", "1900-01-01 12:00:00.000001",
      "1970-01-01 00:00:00", "1970-01-01 00:00:00.000001",
      "2038-01-19 03:14:08", "2262-04-11 23:47:16.854775",
      "1969-06-15 00:00:00.5", "1971-02-03 04:05:06.789")
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "s")
      .select(col("id"), to_timestamp(col("s")).as("t"))
    val tsTwin = dump("time", ts,
      ts.select(col("id"), Ts.epochSec(col("t")).as("es"),
        Ts.epochMicros(col("t")).as("eu"), Ts.dayBucket(col("t")).as("d"))
        .orderBy("id"),
      "SELECT id, CAST(epoch(t) AS DOUBLE) AS es, epoch_us(t) AS eu, " +
        s"${Ts.dayBucketSql("t")} AS d FROM t ORDER BY id")

    // ---- vectors: Exact.dot / cosine vs dotSql / cosineSql ----------------
    // adversarial: negative components, magnitude spread across float ulp
    // scales, a one-hot pair, antiparallel vectors (cosine exactly -1 only
    // if both engines run the identical double tree).
    val vecs = Seq(
      (0L, Array(1.5f, -2.25f, 3.125f), Array(-4.5f, 0.0f, 2.0f)),
      (1L, Array(1e-8f, 1e8f, -1e-8f), Array(1e8f, 1e-8f, 1e-8f)),
      (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(2.0f, -3.0f, 4.0f), Array(-2.0f, 3.0f, -4.0f)),
      (4L, Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f)),
      // class 22: the zero vector — cosine is NULL on BOTH engines under
      // the guarded device (pre-guard: Spark 0/0 → NaN vs DuckDB /0 → NULL)
      (5L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)),
      (6L, Array(0.0f, -0.0f, 0.0f), Array(0.0f, 0.0f, 0.0f)))
      .toDF("id", "a", "b")
    val vecTwin = dump("vec", vecs,
      vecs.select(col("id"), Exact.dot(col("a"), col("b")).as("d"),
        Exact.cosine(col("a"), col("b")).as("c")).orderBy("id"),
      s"SELECT id, ${Exact.dotSql("a", "b")} AS d, " +
        s"${Exact.cosineSql("a", "b")} AS c FROM t ORDER BY id")

    // ---- pearson: Exact.pearson's closed IEEE tree ------------------------
    // adversarial: sufficient statistics large enough that a cast-AFTER-
    // multiply tree (review class 2) would wrap BIGINT where this
    // cast-each-factor-first tree stays finite on both engines.
    val stats = Seq(
      (0L, 3000000000L, 2999999999L, 3000000001L, 2999999998L, 3000000002L, 3000000003L),
      (1L, 100L, -50L, 75L, -30L, 60L, 90L),
      (2L, 7L, 0L, 0L, 0L, 14L, 21L),
      // class 22: ZERO-VARIANCE series (x constant: n=5, Σx=10, Σx²=20 →
      // n·sxx − sx² = 0) — pearson is NULL on BOTH engines under the
      // guarded device (pre-guard: Spark 0/0 → NaN vs DuckDB /0 → NULL);
      // realizable stats only — DuckDB ERRORS on sqrt(negative), so an
      // unrealizable negative variance is outside the device's domain
      (3L, 5L, 10L, 15L, 30L, 20L, 55L),
      // both variances zero AND covariance zero (x and y both constant)
      (4L, 4L, 8L, 12L, 24L, 16L, 36L))
      .toDF("id", "n", "sx", "sy", "sxy", "sxx", "syy")
    val pearsonTwin = dump("pearson", stats,
      stats.select(col("id"), Exact.pearson(col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy")).as("r")).orderBy("id"),
      s"SELECT id, ${Exact.pearsonSql("n", "sx", "sy", "sxy", "sxx", "syy")}" +
        " AS r FROM t ORDER BY id")

    // ---- string guards: the \A..\z digit-guard + ANSI-cast contract -------
    // (classes 16/19, the Scalars.scala:149/153 spelling). Adversarial:
    // '3.7' (DuckDB CAST would ROUND, the guard must reject BEFORE either
    // engine casts), a trailing \n (Java $ tolerates it, \z must not),
    // whitespace, sign forms, the 9/10-digit overflow boundary, and
    // non-ASCII digits (Arabic-Indic, fullwidth, astral mathematical —
    // [0-9] must reject all three in both engines).
    val guardPat = "\\A[+-]?[0-9]{1,9}\\z"
    val strs = Seq(
      "42", "-7", "+003", "3.7", " 42", "42 ", "42\n", "", "-",
      "999999999", "1000000000", "-999999999",
      "٤٢", "４２", "𝟜𝟚")
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "s")
    val guardTwin = dump("str_guard", strs,
      strs.select(col("id"),
        when(col("s").rlike(guardPat),
          col("s").cast(org.apache.spark.sql.types.IntegerType)).as("k"))
        .orderBy("id"),
      s"SELECT id, CASE WHEN regexp_matches(s, '$guardPat') " +
        "THEN CAST(s AS INTEGER) END AS k FROM t ORDER BY id")

    // ---- string semantics: code-point length + NULL-propagating concat ----
    // (classes 13/14). length() counts CODE POINTS in both engines (astral
    // chars are 1, combining marks count separately from precomposed);
    // Spark concat() NULL-propagates like DuckDB '||' (NOT DuckDB concat(),
    // which skips NULL args — the class-14 trap).
    val uni = Seq(
      (0L, "plain", "x"), (1L, "a𝄞b", "y"), // astral G-clef
      (2L, "héllo", "z"), (3L, "héllo", "w"), // combining vs composed
      (4L, null, "q"), (5L, "p", null), (6L, null, null),
      (7L, "👩‍👩‍👧", "fam"))
      .toDF("id", "a", "b")
    val uniTwin = dump("str_semantics", uni,
      uni.select(col("id"), length(col("a")).as("n"),
        concat(col("a"), col("b")).as("ab")).orderBy("id"),
      "SELECT id, CAST(length(a) AS INT) AS n, a || b AS ab FROM t ORDER BY id")

    // ---- digests: GraftMd5 / hexPrefix16 vs DuckDB md5 --------------------
    // the custom codegen'd digest claims byte-identical UTF-8 hashing;
    // adversarial: empty string, astral/combining/ZWJ sequences (multi-byte
    // UTF-8 where a UTF-16-unit iteration bug would change the bytes), a
    // '|'-canonical string with embedded separators, and a 4 KB payload.
    val hashIn = Seq(
      "", "a", "a𝄞b", "héllo", "héllo", "👩‍👩‍👧",
      "k|v|1969-12-31|—", "x" * 4096)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "s")
    val hashTwin = dump("md5", hashIn,
      hashIn.select(col("id"),
        functions.HashExpr.md5Fast(col("s")).as("h"),
        functions.HashExpr.hexPrefix16(
          functions.HashExpr.md5Fast(col("s"))).as("p16"))
        .orderBy("id"),
      "SELECT id, md5(s) AS h, " +
        "CAST(('0x' || substr(md5(s), 1, 4))::INTEGER AS BIGINT) AS p16 " +
        "FROM t ORDER BY id")

    // ---- log guard: the lnQuant twin pair (classes 22/22b/22c) ----------
    // Pins three things at once: the domain guard (Spark's yAsymptote NULL
    // for ≤ 0 ≡ the oracle CASE), the QUANTIZED compare (raw ln is not
    // bitwise cross-engine — JDK Math.log vs libm disagree by 1 ulp, found
    // by the r16 fuzz, class 22b), and the non-finite guard (Spark's
    // floor→LONG saturates NaN→0 / Inf→Long.MaxValue where DuckDB's CAST
    // raises, class 22c — the NaN/±Inf rows below diverge without it).
    val lnIn = (Seq(0.0, -0.0, -1.0, -1e-300, 1e-300, 4.9e-324, 1.0,
      42.5, 1e300, -1e300) ++
      Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "x")
    val lnTwin = dump("ln_guard", lnIn,
      lnIn.select(col("id"), Exact.lnQuant(col("x")).as("l")).orderBy("id"),
      s"SELECT id, ${Exact.lnQuantSql("x")} AS l FROM t ORDER BY id")

    // twin SQL manifest, Verify-style
    val twins = Seq(moneyTwin, nanoTwin, tsTwin, vecTwin, pearsonTwin,
      guardTwin, uniTwin, hashTwin, lnTwin)
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/device_sql.json"),
      twins.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
  }
}
