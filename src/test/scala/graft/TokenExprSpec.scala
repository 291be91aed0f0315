package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** TokenCounts / TokenStats / MaxPairDist2 expressions — pinned against the
  * relational forms they replaced, on the real fixture corpus, under both
  * the codegen and interpreted eval paths. */
class TokenExprSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables.table(spark, sf, "documents")

  private def withCodegen[A](on: Boolean)(body: => A): A = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key, "true")
    try { spark.conf.set(key, on.toString); body }
    finally spark.conf.set(key, prev)
  }

  test("TokenCounts equals explode+groupBy on the fixture corpus — both eval paths") {
    val viaExplode = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .orderBy("doc_id", "w")
      .collect().toSeq
    Seq(true, false).foreach { cg =>
      val viaExpr = withCodegen(cg) {
        docs.select(col("doc_id"),
            explode(functions.VectorExpr.tokenCounts(split(col("text"), " "))).as("kv"))
          .select(col("doc_id"), col("kv.w").as("w"), col("kv.c").as("c"))
          .orderBy("doc_id", "w")
          .collect().toSeq
      }
      assert(viaExpr == viaExplode, s"codegen=$cg")
    }
  }

  test("TokenStats equals the aggregate spelling on the fixture corpus — both eval paths") {
    val viaAgg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tok"), max(col("c")).as("top_cnt"),
        count(lit(1)).as("n_distinct"))
      .orderBy("doc_id")
      .collect().toSeq
    Seq(true, false).foreach { cg =>
      val viaExpr = withCodegen(cg) {
        docs.select(col("doc_id"),
            functions.VectorExpr.tokenStats(split(col("text"), " ")).as("st"))
          .select(col("doc_id"), col("st.n_tok").as("n_tok"),
            col("st.top_cnt").as("top_cnt"), col("st.n_distinct").as("n_distinct"))
          .orderBy("doc_id")
          .collect().toSeq
      }
      assert(viaExpr == viaAgg, s"codegen=$cg")
    }
  }

  test("TokenCounts/TokenStats property: match an in-memory reference on random token arrays") {
    val tokGen = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "d e", "", "ζ", "xyz"))
    val cases: Seq[List[String]] = (0 until 60).flatMap { i =>
      tokGen.apply(Gen.Parameters.default, Seed(i.toLong))
    }
    val df = cases.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "toks")
    val got = df.select(col("id"),
        functions.VectorExpr.tokenStats(col("toks")).as("st"),
        functions.VectorExpr.tokenCounts(col("toks")).as("tc"))
      .orderBy("id").collect()
    got.foreach { r =>
      val toks = cases(r.getInt(0))
      val ref = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val st = r.getStruct(1)
      assert(st.getLong(0) == toks.length.toLong, "n_tok")
      assert(st.getLong(1) == (if (ref.isEmpty) 0L else ref.values.max), "top_cnt")
      assert(st.getLong(2) == ref.size.toLong, "n_distinct")
      val tc = r.getSeq[org.apache.spark.sql.Row](2)
        .map(kv => kv.getString(0) -> kv.getLong(1)).toMap
      assert(tc == ref, "token counts")
    }
  }

  test("DistinctShingleHashes: per-doc set size matches the relational chain; no fixture collisions") {
    // hash CONSTANTS differ from xxhash64's on purpose (consumers only ever
    // compare these hashes to each other) — parity is on set structure:
    // per-doc count equals array_distinct(shingles) count, and corpus-wide
    // the hash↔string mapping is 1:1 (no collisions on the fixtures)
    val toks = split(col("text"), " ")
    val viaStrings = docs.filter(size(toks) >= 3)
      .select(col("doc_id"), size(array_distinct(
        functions.VectorExpr.shingles(toks))).as("n"))
      .orderBy("doc_id").collect().toSeq
    val viaHashes = docs.filter(size(toks) >= 3)
      .select(col("doc_id"), size(functions.VectorExpr.shingleHashes(toks)).as("n"))
      .orderBy("doc_id").collect().toSeq
    assert(viaStrings == viaHashes)
    val strings = docs.select(explode(array_distinct(
        functions.VectorExpr.shingles(toks))).as("g")).distinct().count()
    val hashes = docs.select(explode(
        functions.VectorExpr.shingleHashes(toks)).as("g")).distinct().count()
    assert(strings == hashes)
  }

  test("MaxPairDist2 equals the higher-order pair enumeration — both eval paths") {
    // synthetic tracks incl. the degenerate sizes (0, 1, 2 points)
    val tracks = Seq(
      Seq((0.0, 0.0), (3.0, 4.0), (-1.0, 2.5)),
      Seq((12.5, -30.25)),
      Seq.empty[(Double, Double)],
      Seq((1.0, 1.0), (1.0, 1.0)),
      Seq.tabulate(40)(i => (i * 0.5, 90.0 - i * 1.25)))
    val df = tracks.zipWithIndex
      .map { case (t, i) => (i, t.map { case (a, b) => (a, b) }) }
      .toDF("id", "raw")
      .select(col("id"), transform(col("raw"),
        x => struct(x("_1").as("lat"), x("_2").as("lon"))).as("xs"))
    val viaHof = df.select(col("id"),
        array_max(flatten(transform(col("xs"), (x, i) =>
          transform(slice(col("xs"), i + lit(2), size(col("xs"))), y =>
            (x("lat") - y("lat")) * (x("lat") - y("lat")) +
              (x("lon") - y("lon")) * (x("lon") - y("lon")))))).as("d2"))
      .orderBy("id").collect().map(r => (r.getInt(0), Option(r.get(1)))).toSeq
    Seq(true, false).foreach { cg =>
      val viaExpr = withCodegen(cg) {
        df.select(col("id"), functions.VectorExpr.maxPairDist2(col("xs")).as("d2"))
          .orderBy("id").collect().map(r => (r.getInt(0), Option(r.get(1)))).toSeq
      }
      assert(viaExpr == viaHof, s"codegen=$cg")
    }
  }

  test("MaxPairDist2 skips points with null fields, like array_max over null pairs") {
    // a misparsed point (null lat or lon) must not read as 0.0: the pair set
    // is exactly the pairs of fully-non-null points
    val df = spark.sql(
      """SELECT array(
        |  named_struct('lat', 0.0D, 'lon', 0.0D),
        |  named_struct('lat', CAST(NULL AS DOUBLE), 'lon', 50.0D),
        |  named_struct('lat', 3.0D, 'lon', 4.0D),
        |  named_struct('lat', 90.0D, 'lon', CAST(NULL AS DOUBLE))) AS xs""".stripMargin)
    Seq(true, false).foreach { cg =>
      val d2 = withCodegen(cg) {
        df.select(functions.VectorExpr.maxPairDist2(col("xs")).as("d2"))
          .head().getDouble(0)
      }
      assert(d2 == 25.0, s"codegen=$cg: null-field points leaked into the pairs, d2=$d2")
    }
    // all-null-field track → no valid pair → null (≡ array_max([]))
    val empty = spark.sql(
      """SELECT array(
        |  named_struct('lat', CAST(NULL AS DOUBLE), 'lon', 1.0D),
        |  named_struct('lat', 2.0D, 'lon', CAST(NULL AS DOUBLE))) AS xs""".stripMargin)
    Seq(true, false).foreach { cg =>
      val r = withCodegen(cg) {
        empty.select(functions.VectorExpr.maxPairDist2(col("xs")).as("d2")).head()
      }
      assert(r.isNullAt(0), s"codegen=$cg")
    }
  }

  test("geo track cap binds deterministically on a synthetic hot station") {
    // 5 points; cap 3 keeps the lexicographically-smallest 3 (sort + slice),
    // so the capped max displacement is the max pair among THOSE, regardless
    // of input order
    val pts = Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (50.0, 50.0), (9.0, 0.0))
    Seq(pts, pts.reverse, pts.sortBy(_._2)).foreach { perm =>
      val df = Seq((1, perm)).toDF("id", "raw")
        .select(transform(col("raw"),
          x => struct(x("_1").as("lat"), x("_2").as("lon"))).as("xs"))
      val capped = df.select(functions.VectorExpr.maxPairDist2(
        operators.Geo.boundedTrack(col("xs"), cap = 3)).as("d2")).head().getDouble(0)
      // smallest 3 by (lat, lon): (0,0),(1,1),(2,2) → max pair d2 = 8
      assert(capped == 8.0, s"perm=$perm")
      val uncapped = df.select(functions.VectorExpr.maxPairDist2(
        operators.Geo.boundedTrack(col("xs"))).as("d2")).head().getDouble(0)
      assert(uncapped == 5000.0) // (0,0)-(50,50): cap 8192 inert
    }
  }
}
