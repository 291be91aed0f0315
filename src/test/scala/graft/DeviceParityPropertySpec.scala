package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck fuzz of the shared twin devices (r15 verdict #5).
  *
  * DeviceParitySpec gates the devices on HAND-PICKED adversarial points;
  * this spec sweeps each device's input domain systematically — ≥1000
  * generated cases per family, fixed seed (failures reproduce exactly),
  * written in the same dump format and replayed through the same
  * tools/device_parity.py in ONE batched DuckDB pass, demanding the same
  * bitwise equality as the driver's oracle compare.
  *
  * Domains are the devices' DOCUMENTED domains (Core.scala scaladoc):
  * money within ±1e9 at ≤6 dp (micro-units must fit LONG exactly), nanoAvg
  * within ±1e6 (1e-9 quantization), timestamps 1900..2262 at micros grain,
  * float vectors across ulp scales including zero/±0/NaN/Inf components and
  * antiparallel pairs, pearson statistics REALIZABLE only (computed from
  * actual generated samples — a fabricated negative variance is an ERROR in
  * DuckDB's sqrt and outside the device contract), digit-guard strings
  * including non-ASCII digits, astral/combining/ZWJ unicode for the
  * length/concat/md5 families, and the lnQuant domain (negatives, zero,
  * subnormals, NaN/±Inf) for the quantized-log family.
  *
  * First fuzz of these domains surfaced divergence class 22 (BASELINE.md):
  * DuckDB defines double x/0 as NULL and sqrt(negative) as an ERROR where
  * Spark follows IEEE (NaN/Inf) — fixed by the guarded cosine/pearson
  * devices (NULL on both engines for zero-norm / zero-variance inputs),
  * which the zero-vector and constant-series arms below pin forever. */
class DeviceParityPropertySpec extends SparkSuite {
  import spark.implicits._

  private val N = 1200 // cases per family (≥1000)

  private def cases[A](g: Gen[A]): Seq[A] =
    Gen.listOfN(N, g).pureApply(Gen.Parameters.default, Seed(20260815L))

  // ---- generators --------------------------------------------------------

  /** money: ±1e9, ≤6 dp, biased to cent/micro grids and half-cent ties. */
  private val moneyGen: Gen[Double] = Gen.frequency(
    4 -> Gen.chooseNum(-99999999999L, 99999999999L).map(_ / 100.0),
    3 -> Gen.chooseNum(-999999999999999L, 999999999999999L).map(_ / 1e6),
    2 -> Gen.chooseNum(-9999999L, 9999999L).map(c => c / 100.0 + 0.005),
    1 -> Gen.oneOf(0.0, -0.0, 0.285, -0.285, 0.125, -0.125,
      1e9 - 0.005, -(1e9 - 0.005), 0.000001, -0.000001))

  /** nanoAvg inputs: ±1e6 on the 1e-9 grid, plus half-ulp-of-grid ties. */
  private val nanoGen: Gen[Double] = Gen.frequency(
    4 -> Gen.chooseNum(-999999999999999L, 999999999999999L).map(_ / 1e9),
    3 -> Gen.chooseNum(-1000000000L, 1000000000L).map(_ / 1e9),
    2 -> Gen.chooseNum(-999999999L, 999999999L).map(k => k / 1e9 + 0.5e-9),
    1 -> Gen.oneOf(0.0, 1.0, -1.0, 0.1234567895, -0.9999999995))

  /** epoch micros, 1900..2262, dense around 0 and day boundaries. */
  private val microsGen: Gen[Long] = {
    val day = 86400000000L
    Gen.frequency(
      3 -> Gen.chooseNum(-2208988800000000L, 9214560000000000L),
      3 -> Gen.chooseNum(-3 * day, 3 * day),
      2 -> (for {
        d <- Gen.chooseNum(-40000L, 40000L)
        u <- Gen.chooseNum(-2L, 2L)
      } yield d * day + u),
      1 -> Gen.oneOf(0L, -1L, 1L, -2208988800000000L, 9214560000000000L))
  }

  /** float components across ulp scales; NaN/Inf/±0 arms included. */
  private val floatGen: Gen[Float] = Gen.frequency(
    5 -> Gen.chooseNum(-1048576, 1048576).map(i => i / 1024f),
    3 -> Gen.oneOf(1e-8f, -1e-8f, 1e8f, -1e8f, 0.1f, 0.2f, 0.3f, 1.5f, -2.25f),
    2 -> Gen.oneOf(0.0f, -0.0f, 1.0f, -1.0f),
    1 -> Gen.oneOf(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity))

  /** (a, b) same-dim pairs; arms for antiparallel, identical, and zero a. */
  private val vecPairGen: Gen[(Seq[Float], Seq[Float])] = for {
    d <- Gen.chooseNum(2, 8)
    a <- Gen.listOfN(d, floatGen)
    b <- Gen.frequency(
      5 -> Gen.listOfN(d, floatGen),
      2 -> Gen.const(a.map(x => -x)), // antiparallel
      1 -> Gen.const(a), // identical
      1 -> Gen.const(List.fill(d)(0.0f))) // zero operand (class 22)
  } yield (a, b)

  /** REALIZABLE pearson statistics: exact integer sums of an actual sample,
    * with a near-32-bit-wrap arm built from a closed-form multiset
    * {v × (n−1), v+k} so Σx crosses ±3e9 without generating 3000 points. */
  private val pearsonGen: Gen[(Long, Long, Long, Long, Long, Long)] = {
    def sums(pts: Seq[(Long, Long)]): (Long, Long, Long, Long, Long, Long) = {
      val n = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      (n, sx, sy, sxy, sxx, syy)
    }
    Gen.frequency(
      4 -> (for {
        n <- Gen.chooseNum(2, 60)
        pts <- Gen.listOfN(n,
          Gen.zip(Gen.chooseNum(-100000L, 100000L), Gen.chooseNum(-100000L, 100000L)))
      } yield sums(pts)),
      2 -> (for { // constant x (zero variance → NULL on both, class 22)
        n <- Gen.chooseNum(2, 20)
        v <- Gen.chooseNum(-1000L, 1000L)
        ys <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
      } yield sums(ys.map(y => (v, y)))),
      2 -> (for { // near-wrap: {v × (n−1), v+k} closed form, Σx ≈ ±3.6e9
        v <- Gen.chooseNum(800000L, 1200000L)
        k <- Gen.chooseNum(0L, 1000L) // k=0 → constant at scale, zero variance
        m <- Gen.chooseNum(0L, 1000L)
        w <- Gen.chooseNum(-1200000L, 1200000L)
        n <- Gen.chooseNum(2500L, 4000L)
        sign <- Gen.oneOf(1L, -1L)
      } yield {
        val (sv, sw) = (sign * v, w)
        val sx = n * sv + sign * k
        val sy = n * sw + m
        val sxy = (n - 1) * sv * sw + (sv + sign * k) * (sw + m)
        val sxx = (n - 1) * sv * sv + (sv + sign * k) * (sv + sign * k)
        val syy = (n - 1) * sw * sw + (sw + m) * (sw + m)
        (n, sx, sy, sxy, sxx, syy)
      }),
      1 -> (for { // n=1: both variances exactly zero
        x <- Gen.chooseNum(-100000L, 100000L)
        y <- Gen.chooseNum(-100000L, 100000L)
      } yield sums(Seq((x, y)))))
  }

  /** digit-guard strings: valid/overflow/signed/spaced/decimal/unicode. */
  private val guardGen: Gen[String] = {
    val digits = Gen.chooseNum(1, 12).flatMap(l => Gen.listOfN(l, Gen.numChar)).map(_.mkString)
    Gen.frequency(
      4 -> digits,
      2 -> Gen.zip(Gen.oneOf("+", "-"), digits).map(p => p._1 + p._2),
      2 -> Gen.zip(Gen.oneOf(" ", "\t", "\n", ""), digits,
        Gen.oneOf(" ", "\n", "")).map(t => t._1 + t._2 + t._3),
      1 -> Gen.zip(digits, digits).map(p => p._1 + "." + p._2),
      1 -> Gen.oneOf("", "-", "+", "٤٢", "４２", "𝟜𝟚", "1٢3", "NaN", "0x1f"))
  }

  /** full-plane unicode strings: ASCII, Latin-1, combining marks, ZWJ
    * sequences, astral code points — always whole code points (never a
    * lone surrogate, which is invalid UTF-8 and outside any text domain). */
  private val uniCharGen: Gen[String] = Gen.frequency(
    5 -> Gen.chooseNum(0x20, 0x7e).map(_.toChar.toString),
    2 -> Gen.chooseNum(0xa1, 0x2ff).map(_.toChar.toString),
    2 -> Gen.chooseNum(0x300, 0x36f).map(_.toChar.toString), // combining
    1 -> Gen.oneOf("𝄞", "👩", "‍", "👧", "é", "é", "２", "中"),
    1 -> Gen.chooseNum(0x10000, 0x10fff)
      .map(cp => new String(Character.toChars(cp))))
  private val uniStrGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(l => Gen.listOfN(l, uniCharGen)).map(_.mkString)
  private val uniOrNull: Gen[String] =
    Gen.frequency(8 -> uniStrGen, 2 -> Gen.const(null: String))
  private val md5Gen: Gen[String] = Gen.frequency(
    6 -> uniStrGen,
    2 -> Gen.zip(uniStrGen, uniStrGen, uniStrGen)
      .map(t => s"${t._1}|${t._2}|${t._3}"),
    1 -> Gen.chooseNum(100, 4096).map("y" * _),
    1 -> Gen.const(""))

  // ---- the gate ----------------------------------------------------------

  test(s"twin devices are bitwise-equal on $N generated cases per family") {
    val py = new ProcessBuilder("python3", "-c", "import duckdb, pandas")
      .redirectErrorStream(true).start()
    assume(py.waitFor(30, java.util.concurrent.TimeUnit.SECONDS) &&
      py.exitValue() == 0, "python3+duckdb unavailable — parity fuzz skipped")

    val outDir = Files.createTempDirectory("graft_devfuzz").toString
    def dump(name: String, in: DataFrame, out: DataFrame, twin: String): (String, String) = {
      in.coalesce(1).write.mode("overwrite").parquet(s"$outDir/in_$name")
      out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/dev_$name")
      name -> twin
    }

    // agg families run GROUPED (N inputs / ~N/5 group sums) so one
    // compensating-error pair can't cancel inside a single global sum
    val money = cases(moneyGen).zipWithIndex
      .map { case (v, i) => (i.toLong % 250, v) }.toDF("gid", "x")
    val moneyTwin = dump("fz_money", money,
      money.groupBy("gid").agg(Exact.moneySum(col("x")).as("s")).orderBy("gid"),
      s"SELECT gid, ${Exact.moneySumSql("x")} AS s FROM t GROUP BY gid ORDER BY gid")

    val nano = cases(nanoGen).zipWithIndex
      .map { case (v, i) => (i.toLong % 250, v) }.toDF("gid", "x")
    val nanoTwin = dump("fz_nano", nano,
      nano.groupBy("gid").agg(Exact.nanoAvg(col("x")).as("a")).orderBy("gid"),
      s"SELECT gid, ${Exact.nanoAvgSql("x")} AS a FROM t GROUP BY gid ORDER BY gid")

    val ts = cases(microsGen).zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("t"))
    val tsTwin = dump("fz_time", ts,
      ts.select(col("id"), graft.Ts.epochSec(col("t")).as("es"),
        graft.Ts.epochMicros(col("t")).as("eu"), graft.Ts.dayBucket(col("t")).as("d"))
        .orderBy("id"),
      "SELECT id, CAST(epoch(t) AS DOUBLE) AS es, epoch_us(t) AS eu, " +
        s"${graft.Ts.dayBucketSql("t")} AS d FROM t ORDER BY id")

    val vecs = cases(vecPairGen).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "a", "b")
    val vecTwin = dump("fz_vec", vecs,
      vecs.select(col("id"), Exact.dot(col("a"), col("b")).as("d"),
        Exact.cosine(col("a"), col("b")).as("c")).orderBy("id"),
      s"SELECT id, ${Exact.dotSql("a", "b")} AS d, " +
        s"${Exact.cosineSql("a", "b")} AS c FROM t ORDER BY id")

    val stats = cases(pearsonGen).zipWithIndex
      .map { case ((n, sx, sy, sxy, sxx, syy), i) => (i.toLong, n, sx, sy, sxy, sxx, syy) }
      .toDF("id", "n", "sx", "sy", "sxy", "sxx", "syy")
    val pearsonTwin = dump("fz_pearson", stats,
      stats.select(col("id"), Exact.pearson(col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy")).as("r")).orderBy("id"),
      s"SELECT id, ${Exact.pearsonSql("n", "sx", "sy", "sxy", "sxx", "syy")}" +
        " AS r FROM t ORDER BY id")

    val guardPat = "\\A[+-]?[0-9]{1,9}\\z"
    val strs = cases(guardGen).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "s")
    val guardTwin = dump("fz_str_guard", strs,
      strs.select(col("id"),
        when(col("s").rlike(guardPat),
          col("s").cast(org.apache.spark.sql.types.IntegerType)).as("k"))
        .orderBy("id"),
      s"SELECT id, CASE WHEN regexp_matches(s, '$guardPat') " +
        "THEN CAST(s AS INTEGER) END AS k FROM t ORDER BY id")

    val uni = cases(Gen.zip(uniOrNull, uniOrNull)).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "a", "b")
    val uniTwin = dump("fz_str_semantics", uni,
      uni.select(col("id"), length(col("a")).as("n"),
        concat(col("a"), col("b")).as("ab")).orderBy("id"),
      "SELECT id, CAST(length(a) AS INT) AS n, a || b AS ab FROM t ORDER BY id")

    // log-guard family (classes 22/22b/22c): ~two-thirds of the cases are
    // ≤ 0 (where Spark's log-NULL must land exactly on the oracle CASE),
    // plus a non-finite arm (where the floor→LONG quantization saturates
    // on Spark and raises in DuckDB unless finite-guarded)
    val lnGen: Gen[Double] = Gen.frequency(
      3 -> Gen.chooseNum(-999999999999L, 999999999999L).map(_ / 1e6),
      2 -> Gen.chooseNum(0L, 999999999999L).map(-_ / 1e6),
      1 -> Gen.oneOf(0.0, -0.0, 1e-300, -1e-300, 4.9e-324, 1.0, 1e300, -1e300,
        Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
    val lnIn = cases(lnGen).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "x")
    // the lnQuant twin pair — quantized like q_math_funcs, because raw ln
    // is NOT bitwise cross-engine (JDK Math.log vs libm, ±1 ulp; class 22b
    // — this very arm found it), spelled once in Exact so the three call
    // sites can't drift
    val lnTwin = dump("fz_ln_guard", lnIn,
      lnIn.select(col("id"), Exact.lnQuant(col("x")).as("l")).orderBy("id"),
      s"SELECT id, ${Exact.lnQuantSql("x")} AS l FROM t ORDER BY id")

    val hashIn = cases(md5Gen).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "s")
    val hashTwin = dump("fz_md5", hashIn,
      hashIn.select(col("id"),
        functions.HashExpr.md5Fast(col("s")).as("h"),
        functions.HashExpr.hexPrefix16(
          functions.HashExpr.md5Fast(col("s"))).as("p16"))
        .orderBy("id"),
      "SELECT id, md5(s) AS h, " +
        "CAST(('0x' || substr(md5(s), 1, 4))::INTEGER AS BIGINT) AS p16 " +
        "FROM t ORDER BY id")

    val twins = Seq(moneyTwin, nanoTwin, tsTwin, vecTwin, pearsonTwin,
      guardTwin, uniTwin, hashTwin, lnTwin)
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    Files.writeString(
      java.nio.file.Paths.get(s"$outDir/device_sql.json"),
      twins.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))

    // ONE batched DuckDB replay for all families (per-case subprocesses
    // would dominate runtime ~1000×)
    val tool = java.nio.file.Paths.get(
      sys.props("user.dir"), "tools", "device_parity.py").toString
    val p = new ProcessBuilder("python3", tool, outDir)
      .directory(new java.io.File(sys.props("user.dir"), "tools"))
      .redirectErrorStream(true).start()
    val killer = new Thread(() => {
      if (!p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS))
        p.destroyForcibly()
    })
    killer.setDaemon(true); killer.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    p.waitFor()
    assert(p.exitValue() == 0,
      s"device fuzz failed (or timed out); dump kept at $outDir:\n$out")
    assert(out.contains(", 0 fail =="), out)
  }
}
