package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based algebraic invariants (SURVEY §5.3), driven by ScalaCheck
  * generators over in-memory frames. Each property evaluates all samples in
  * one Spark job (per-sample jobs would dominate runtime). */
class AlgebraSpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("union cardinality: |A ∪ B| ≤ |A| + |B| and ≥ max(|A|,|B|) (as sets)") {
    val setGen = Gen.listOf(Gen.chooseNum(0, 30))
    samples(Gen.zip(setGen, setGen), 12).foreach { case (a, b) =>
      val da = a.toDF("k").distinct()
      val db = b.toDF("k").distinct()
      val u = da.union(db).distinct().count()
      assert(u <= da.count() + db.count())
      assert(u >= math.max(da.count(), db.count()))
    }
  }

  test("intersect + except partition the left set") {
    val setGen = Gen.listOf(Gen.chooseNum(0, 20))
    samples(Gen.zip(setGen, setGen), 12).foreach { case (a, b) =>
      val da = a.toDF("k").distinct()
      val db = b.toDF("k").distinct()
      assert(da.intersect(db).count() + da.except(db).count() == da.count())
    }
  }

  test("dedup idempotence and monotonicity on generated docs") {
    val docGen = Gen.listOfN(40, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))
    val docs = samples(docGen, 30).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = docs.dropDuplicates("text")
    assert(once.dropDuplicates("text").count() == once.count())
    assert(once.count() <= docs.count())
  }

  test("sessionization bounds: 1 ≤ sessions per user ≤ events per user") {
    val out = run("q_ts_session")
      .groupBy("user_id").agg(countDistinct(col("sid")).as("sessions"), sum(col("n")).as("events"))
      .collect()
    out.foreach { r =>
      val s = r.getAs[Long]("sessions")
      val e = r.getAs[Long]("events")
      assert(s >= 1 && s <= e)
    }
  }

  test("rank is within [1, group size]") {
    val seg = Tables.table(spark, sf, "customer").groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    run("q_win_rank").collect().foreach { r =>
      val rk = r.getAs[Int]("r")
      assert(rk >= 1 && rk <= seg(r.getAs[String]("c_mktsegment")))
    }
  }

  test("cosine symmetry and Cauchy-Schwarz on generated float vectors") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10f, 10f))
      .suchThat(v => v.exists(_ != 0f))
    val vs = samples(Gen.zip(vecGen, vecGen), 20)
    val df = vs.toDF("a", "b")
    val dots = df.select(
      functions.VectorExpr.dotF(col("a"), col("b")).as("ab"),
      functions.VectorExpr.dotF(col("b"), col("a")).as("ba"),
      functions.VectorExpr.dotF(col("a"), col("a")).as("aa"),
      functions.VectorExpr.dotF(col("b"), col("b")).as("bb")).collect()
    dots.foreach { r =>
      val (ab, ba, aa, bb) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(ab == ba) // exact: same products, same fold order
      assert(ab * ab <= aa * bb * (1 + 1e-12)) // Cauchy-Schwarz
    }
  }

  test("Exact.moneySum is partition-count invariant (plain double sum is not guaranteed)") {
    val li = Tables.table(spark, sf, "lineitem").select("l_extendedprice")
    def sumAt(parts: Int): Double =
      li.repartition(parts).agg(Exact.moneySum(col("l_extendedprice")).as("s"))
        .head().getDouble(0)
    val reference = sumAt(1)
    Seq(2, 7, 32).foreach(p => assert(sumAt(p) == reference)) // bitwise equal
  }

  test("salted aggregation ≡ direct aggregation (count and decimal sum)") {
    import operators.Skew
    val li = Tables.table(spark, sf, "lineitem")
    val directCount = li.groupBy(col("l_partkey").as("key")).agg(count(lit(1)).as("n"))
    val saltedCount = Skew.saltedCount(li, col("l_partkey"))
    assert(saltedCount.except(directCount).isEmpty && directCount.except(saltedCount).isEmpty)

    val directSum = li.groupBy(col("l_partkey").as("key"))
      .agg(Exact.moneySum(col("l_extendedprice")).as("total"))
    val saltedSum = Skew.saltedMoneySum(li, col("l_partkey"), col("l_extendedprice"))
    assert(saltedSum.except(directSum).isEmpty && directSum.except(saltedSum).isEmpty)
  }

  test("graft_dot is SQL-callable via GraftExtensions") {
    import org.apache.spark.sql.SparkSession
    val orig = spark // force the shared session into existence first
    // getOrCreate returns the active session (ignoring extensions), so build a
    // fresh session over the same SparkContext with sessions cleared
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b").createOrReplaceTempView("graft_ext_v")
      val got = s2.sql("SELECT graft_dot(a, b) AS d FROM graft_ext_v").head().getDouble(0)
      assert(got == 11.0)
      // the full custom-expression SQL surface
      val sh = s2.sql("SELECT graft_shingles(array('a','b','c','d'), 3) AS s")
        .head().getSeq[String](0)
      assert(sh == Seq("a b c", "b c d"))
      val fp = s2.sql("SELECT graft_rolling_fp(array('ab', 'xyz')) AS f").head().getLong(0)
      // h = ((0*31 + 97*2) % M)*31 + 120*3) % M
      assert(fp == (97L * 2 * 31 + 120L * 3) % 1000003L)
      val tc = s2.sql("SELECT graft_token_counts(array('a','b','a')) AS t").head()
        .getSeq[org.apache.spark.sql.Row](0)
      assert(tc.map(r => (r.getString(0), r.getLong(1))).toSet == Set(("a", 2L), ("b", 1L)))
      val st = s2.sql("SELECT graft_token_stats(array('a','b','a')).n_tok AS n").head().getLong(0)
      assert(st == 3L)
      val d2 = s2.sql(
        "SELECT graft_max_pair_dist2(array(struct(0.0d, 0.0d), struct(3.0d, 4.0d))) AS d")
        .head().getDouble(0)
      assert(d2 == 25.0)
      val nh = s2.sql("SELECT size(graft_shingle_hashes(array('a','b','c','d','b','c','d'), 3)) AS n")
        .head().getInt(0)
      assert(nh == 4) // 5 shingles, 'b c d' seen twice → 4 distinct
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("TokenRollingHash equals the composable HOF fold on random token arrays") {
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(12,
      Gen.listOfN(6, Gen.oneOf(Gen.alphaNumStr.map(_.take(5)), Gen.const(""),
        Gen.const("的是"), Gen.const("zz"))))
    val toks = gen.pureApply(Gen.Parameters.default, Seed(7L))
    import spark.implicits._
    val df = toks.map(Tuple1(_)).toDF("toks")
    val both = df.select(
      functions.VectorExpr.rollingFp(col("toks")).as("fast"),
      expr("aggregate(transform(toks, t -> CAST(ascii(t) * length(t) AS BIGINT)), " +
        "CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % 1000003)").as("ref")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }
  test("every oracle day-bucket spells Ts.dayBucketSql's canonical tree") {
    // the Spark half of the day-bucket contract is single-homed in
    // Ts.dayBucket; the DuckDB half lives inline in ~35 oracle literals.
    // This pin keeps the two from drifting: every '/ 86400' in every
    // registered oracle must be the EXACT canonical spelling
    // CAST(floor(epoch(<expr>) / 86400) AS BIGINT) — a truncating integer
    // div or an unfloored division would diverge pre-1970 (bug class #7).
    val canonical = """CAST\(floor\(epoch\([^()]*(\([^()]*\)[^()]*)*\) / 86400\) AS BIGINT\)""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val occurrences = "/ 86400".r.findAllIn(sql).size
      val canonicalHits = canonical.findAllIn(sql).size
      assert(occurrences == canonicalHits,
        s"$name: ${occurrences - canonicalHits} day-bucket division(s) not in " +
          s"the canonical Ts.dayBucketSql form")
    }
    // and the helper itself IS that spelling (construction can't drift)
    assert(canonical.findFirstIn(graft.Ts.dayBucketSql("ts")).contains(
      graft.Ts.dayBucketSql("ts")))
  }

}
