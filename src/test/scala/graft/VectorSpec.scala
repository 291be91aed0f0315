package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** FloatDotProduct expression + vector operators (SURVEY §2.11).
  * Checks both the interpreted eval path and the codegen path (the production
  * plan uses codegen; forcing wholeStage off exercises nullSafeEval). */
class VectorSpec extends SparkSuite {
  import spark.implicits._

  private def referenceDot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def sparkDot(a: Seq[Float], b: Seq[Float], codegen: Boolean): Double = {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      Seq((a, b)).toDF("a", "b")
        .select(functions.VectorExpr.dotF(col("a"), col("b")).as("d"))
        .as[Double].head()
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("dot product matches reference fold — codegen and interpreted") {
    val a = Seq(1.5f, -2.25f, 3.125f)
    val b = Seq(0.5f, 4.0f, -1.0f)
    assert(sparkDot(a, b, codegen = true) == referenceDot(a, b))
    assert(sparkDot(a, b, codegen = false) == referenceDot(a, b))
  }

  test("dot product property: matches reference on random vectors") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-100f, 100f))
    val samples = (0 until 20).flatMap { i =>
      for {
        a <- vecGen.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- vecGen.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } yield (a, b)
    }
    assert(samples.size >= 15)
    // one Spark job for all samples — per-sample jobs would dominate runtime
    import spark.implicits._
    val got = samples.toDF("a", "b")
      .select(functions.VectorExpr.dotF(col("a"), col("b")).as("d"))
      .as[Double].collect().toSeq
    val expect = samples.map { case (a, b) => referenceDot(a, b) }
    assert(got == expect)
  }

  test("null array → null result") {
    val df = Seq((Option.empty[Seq[Float]], Option(Seq(1f, 2f)))).toDF("a", "b")
    val out = df.select(functions.VectorExpr.dotF(col("a"), col("b")).as("d")).collect()
    assert(out.head.isNullAt(0))
  }

  test("type mismatch is an analysis error") {
    val df = Seq((Seq(1.0, 2.0), Seq(1f))).toDF("a", "b") // array<double> left
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(functions.VectorExpr.dotF(col("a"), col("b"))).collect()
    }
  }

  test("cosine self-similarity ≈ 1 on fixtures; knn sims within [-1,1]") {
    val e = Tables.table(spark, sf, "embeddings")
    val selfSim = e.limit(20)
      .select((Exact.dot(col("embedding"), col("embedding")) /
        (Exact.norm(col("embedding")) * Exact.norm(col("embedding")))).as("s"))
      .as[Double].collect()
    selfSim.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
    run("q_vec_knn").select("sim").as[Double].collect()
      .foreach(s => assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
  }

  test("q_vec_pair_sim pairs are strictly ordered and sims descend") {
    val rows = run("q_vec_pair_sim").collect()
    rows.foreach(r => assert(r.getAs[Long]("ida") < r.getAs[Long]("idb")))
    val sims = rows.map(_.getAs[Double]("sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("TopPairsWithin block form == the pair-materializing join form, bitwise") {
    // the shipped per-block loop against the label-blocked self-join it
    // replaced — same rounding, same tie order, every row identical
    import org.apache.spark.sql.functions._
    val e = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        Exact.norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("ida"), col("label").as("la"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("idb"), col("label").as("lb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val viaJoin = a.join(b, col("la") === col("lb") && col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        round(Exact.dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
      .orderBy(col("sim").desc, col("ida"), col("idb"))
      .limit(20).collect().toSeq
    val viaBlocks = run("q_vec_pair_sim").collect().toSeq
    assert(viaBlocks == viaJoin,
      s"blocks=${viaBlocks.mkString("\n")}\njoin=${viaJoin.mkString("\n")}")
  }

  test("TopPairsWithin property: equals the naive sort on random blocks (k boundary, ties)") {
    // random blocks sized AROUND the heap boundary (pairs < k, == k, > k) and
    // drawn from a tiny value alphabet so tied sims are common — the bounded
    // worst-first heap must agree with "compute all pairs, sort by
    // (sim desc, ida, idb), take k" on every block
    import org.apache.spark.sql.functions._
    val k = 5
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def refTop(block: Seq[(Long, Seq[Float])]): Seq[(Long, Long, Double)] = {
      def nrm(v: Seq[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
        math.sqrt(s)
      }
      (for {
        (a, i) <- block.zipWithIndex
        b <- block.drop(i + 1)
        (lo, hi) = if (a._1 < b._1) (a, b) else (b, a)
      } yield (lo._1, hi._1, round6(referenceDot(lo._2, hi._2) / (nrm(lo._2) * nrm(hi._2)))))
        .sortBy { case (ia, ib, s) => (-s, ia, ib) }.take(k)
    }
    val vecGen = Gen.listOfN(4, Gen.oneOf(1f, 2f, 3f)) // ties galore
    // block sizes 2..6: C(2,2)=1 < k, C(4,2)=6 > k, C(3,2)=3 < k=5 < 6
    val blocks = (0 until 30).flatMap { i =>
      val n = 2 + i % 5
      val vecs = (0 until n).flatMap(j =>
        vecGen.apply(Gen.Parameters.default, Seed(i * 100L + j)))
      if (vecs.size == n) Some(vecs.zipWithIndex.map { case (v, j) => ((i * 10 + j).toLong, v) })
      else None
    }
    assert(blocks.size >= 25)
    import spark.implicits._
    val df = blocks.zipWithIndex
      .flatMap { case (b, bi) => b.map { case (id, v) => (bi, id, v) } }
      .toDF("blk", "vec_id", "embedding")
    val got = df.groupBy("blk")
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("vs"))
      .select(col("blk"), explode(functions.VectorExpr.topPairs(col("vs"), k)).as("p"))
      .select(col("blk"), col("p.ida"), col("p.idb"), col("p.sim"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (blk, rows) =>
        blk -> rows.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
          .sortBy { case (ia, ib, s) => (-s, ia, ib) }.toSeq }
    blocks.zipWithIndex.foreach { case (b, bi) =>
      assert(got.getOrElse(bi, Nil) == refTop(b), s"block $bi: ${b.mkString(",")}")
    }
  }

  test("TopPairsWithin: zero-norm vectors form NO pair (guarded-cosine contract)") {
    // class 22 (r16): cosine against the zero vector is undefined — the
    // guarded Exact.cosine returns NULL on both engines and the oracle
    // filters `sim IS NOT NULL`, so the expression must exclude zero-norm
    // vectors from pairing entirely (the pre-guard 0/0 NaN ranked them
    // FIRST while DuckDB's /0 NULL ranked them last). NaN-COMPONENT vectors
    // are different: their norm is NaN (not zero), pairs form with NaN sim,
    // and round6 must pass NaN through — BigDecimal.valueOf(NaN) would
    // throw and kill the task on the first such embedding.
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq(0f, 0f, 0f)),
      (2L, Seq(0f, 0f, 0f)),
      (3L, Seq(1f, 2f, 3f)),
      (4L, Seq(1f, 2f, 3f)),
      (5L, Seq(Float.NaN, 1f, 0f))).toDF("vec_id", "embedding")
    val rows = df
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("vs"))
      .select(explode(functions.VectorExpr.topPairs(col("vs"), 10)).as("p"))
      .select(col("p.ida"), col("p.idb"), col("p.sim"))
      .collect()
    // zero-norm 1,2 pair with nothing; (3,4) real; (3,5),(4,5) NaN
    assert(rows.length == 3, rows.mkString(","))
    assert(rows.forall(r => r.getLong(0) != 1L && r.getLong(0) != 2L &&
      r.getLong(1) != 1L && r.getLong(1) != 2L))
    val identical = rows.find(r => r.getLong(0) == 3L && r.getLong(1) == 4L).get
    assert(identical.getDouble(2) == 1.0)
    assert(rows.count(_.getDouble(2).isNaN) == 2) // pairs touching the NaN vector
  }

  test("TopPairsWithin: NaN pairs rank first under heap EVICTION (Spark double order)") {
    // k < #pairs with zero-norm vectors in the block: the heap must evict
    // under the same total order Spark's sim-desc sort uses, where NaN is
    // the LARGEST double (java.lang.Double.compare) — the naive `>`/`==`
    // comparator saw NaN as tied with everything and dropped NaN pairs
    // whenever the heap was already full (r13 review finding)
    import org.apache.spark.sql.functions._
    // NaN-COMPONENT (not zero-norm — those form no pair since the class-22
    // guard) vectors: 3 NaN + 3 normal → 12 NaN pairs, 3 real
    val df = Seq(
      (1L, Seq(Float.NaN, 0f)), (2L, Seq(Float.NaN, 1f)), (3L, Seq(0f, Float.NaN)),
      (4L, Seq(1f, 0f)), (5L, Seq(1f, 1f)), (6L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val k = 4
    val got = df
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("vs"))
      .select(explode(functions.VectorExpr.topPairs(col("vs"), k)).as("p"))
      .select(col("p.ida"), col("p.idb"), col("p.sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // NaN sims sort ABOVE 1.0; ties broken by (ida, idb) ascending — so the
    // top 4 of the 12 NaN pairs by id order, none of the finite ones
    val expected = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(got.map(p => (p._1, p._2)) == expected, got.mkString(","))
    assert(got.forall(_._3.isNaN))
    // and Spark's own sim-desc sort puts NaN ABOVE every finite value —
    // the ordering the heap comparator must reproduce (literal NaNs here:
    // the join-form division would trip ANSI DIVIDE_BY_ZERO on zero norms)
    val viaSort = Seq((1L, Double.NaN), (2L, 1.0), (3L, Double.NaN))
      .toDF("id", "sim").orderBy(col("sim").desc, col("id"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSort == Seq(1L, 3L, 2L), viaSort.mkString(","))
  }

  test("TopPairsWithin: duplicate vec_ids emit no (id,id) pair (join form's strict <)") {
    // the join form's predicate is ida < idb on ID VALUES, so two rows
    // sharing a vec_id pair with everything else but never with each other
    import org.apache.spark.sql.functions._
    val df = Seq(
      (7L, Seq(1f, 0f)), (7L, Seq(0f, 1f)), (9L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val got = df
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("vs"))
      .select(explode(functions.VectorExpr.topPairs(col("vs"), 10)).as("p"))
      .select(col("p.ida"), col("p.idb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.forall { case (a, b) => a < b }, got.mkString(","))
    assert(got.sorted == Seq((7L, 9L), (7L, 9L))) // each 7-row pairs with 9
  }

  test("dedup is idempotent on fixtures") {
    val docs = Tables.table(spark, sf, "documents")
    val once = docs.dropDuplicates("text")
    assert(once.dropDuplicates("text").count() == once.count())
  }
}
