package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Scratch probe (NOT part of the contract): times q_assoc_lift piecewise. */
object AssocProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession()
    spark.sparkContext.setLogLevel("WARN")
    import Tables.table

    def time(name: String)(f: => Long): Unit = {
      // drop only checkpoints THIS shape creates: accumulated block-manager
      // pressure must not bias later head-to-head shapes (r15 probe sweep),
      // but a blanket unpersist would destroy the shared `ck` the piecewise
      // shapes read across calls — a local checkpoint cannot be recomputed
      // once its blocks are gone (r15 diff review #2)
      val before = spark.sparkContext.getPersistentRDDs.keySet
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%7.3f  rows=$n")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(true))
    }

    def baskets = table(spark, sfDir, "lineitem")
      .join(broadcast(table(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .groupBy("ok")
      .agg(sort_array(collect_set(col("b"))).as("bs"))

    time("baskets_count") { baskets.count() }
    time("baskets_checkpoint") { baskets.localCheckpoint(true).count() }

    val nullS = lit(null).cast(StringType)
    def pairMarks = flatten(transform(col("bs"), (x, i) => transform(
      slice(col("bs"), i + lit(2), size(col("bs"))),
      y => struct(lit("p").as("k"), x.as("b1"), y.as("b2")))))
    def marginMarks = transform(col("bs"),
      b => struct(lit("m").as("k"), b.as("b1"), nullS.as("b2")))
    def totMark = array(struct(lit("t").as("k"), nullS.as("b1"), nullS.as("b2")))

    time("marker_agg_full") {
      baskets.select(explode(concat(pairMarks, marginMarks, totMark)).as("e"))
        .groupBy(col("e.k"), col("e.b1"), col("e.b2"))
        .agg(count(lit(1))).count()
    }
    time("pairs_only_agg") {
      baskets.select(explode(pairMarks).as("e"))
        .groupBy(col("e.b1"), col("e.b2"))
        .agg(count(lit(1))).count()
    }
    val ck = baskets.localCheckpoint(true)
    time("pairs_from_ck") {
      ck.select(explode(pairMarks).as("e"))
        .groupBy(col("e.b1"), col("e.b2")).agg(count(lit(1))).count()
    }
    time("margin_from_ck") {
      ck.select(explode(col("bs")).as("b")).groupBy("b").agg(count(lit(1))).count()
    }
    time("tot_from_ck") { ck.agg(count(lit(1))).count() }

    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.DoubleType
    def finish(p12: DataFrame, margin1: DataFrame, margin2: DataFrame,
        tot: DataFrame): Long =
      p12.join(broadcast(margin1), "b1").join(broadcast(margin2), "b2")
        .crossJoin(broadcast(tot))
        .select(col("b1"), col("b2"), col("n12"), col("n1"), col("n2"),
          round((col("n12").cast(DoubleType) * col("nn").cast(DoubleType))
            / (col("n1").cast(DoubleType) * col("n2").cast(DoubleType)), 6)
            .as("lift"))
        .orderBy(col("lift").desc, col("b1"), col("b2"))
        .limit(20).count()

    // OLD shape: ck baskets + three consumer passes
    time("full_old") {
      val bk = baskets.localCheckpoint(true)
      val margin = bk.select(explode(col("bs")).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("nb"))
      val tot = bk.agg(count(lit(1)).as("nn"))
      val p12 = bk.select(explode(pairMarks).as("p"))
        .select(col("p.b1").as("b1"), col("p.b2").as("b2"))
        .groupBy("b1", "b2").agg(count(lit(1)).as("n12"))
        .filter(col("n12") >= 20)
      finish(p12, margin.select(col("b").as("b1"), col("nb").as("n1")),
        margin.select(col("b").as("b2"), col("nb").as("n2")), tot)
    }
    // V2: ck baskets + pairs pass + FUSED margin/tot (sentinel element)
    time("full_fused_mt") {
      val bk = baskets.localCheckpoint(true)
      val mt = bk.select(explode(concat(col("bs"), array(lit("\u0000T")))).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("nb")).localCheckpoint(true)
      val margin = mt.filter(col("b") =!= "\u0000T")
      val tot = mt.filter(col("b") === "\u0000T").select(col("nb").as("nn"))
      val p12 = bk.select(explode(pairMarks).as("p"))
        .select(col("p.b1").as("b1"), col("p.b2").as("b2"))
        .groupBy("b1", "b2").agg(count(lit(1)).as("n12"))
        .filter(col("n12") >= 20)
      finish(p12, margin.select(col("b").as("b1"), col("nb").as("n1")),
        margin.select(col("b").as("b2"), col("nb").as("n2")), tot)
    }
    // V3: NO checkpoint — three consumers share the ok-exchange via ReuseExchange
    time("full_nock") {
      val bk = baskets
      val margin = bk.select(explode(col("bs")).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("nb"))
      val tot = bk.agg(count(lit(1)).as("nn"))
      val p12 = bk.select(explode(pairMarks).as("p"))
        .select(col("p.b1").as("b1"), col("p.b2").as("b2"))
        .groupBy("b1", "b2").agg(count(lit(1)).as("n12"))
        .filter(col("n12") >= 20)
      finish(p12, margin.select(col("b").as("b1"), col("nb").as("n1")),
        margin.select(col("b").as("b2"), col("nb").as("n2")), tot)
    }
    // V4: marker fold (r14 committed shape)
    time("full_marker") {
      val agg = baskets
        .select(explode(concat(pairMarks, marginMarks, totMark)).as("e"))
        .groupBy(col("e.k").as("k"), col("e.b1").as("b1"), col("e.b2").as("b2"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val margin = agg.filter(col("k") === "m")
      finish(
        agg.filter(col("k") === "p" && col("n") >= 20)
          .select(col("b1"), col("b2"), col("n").as("n12")),
        margin.select(col("b1"), col("n").as("n1")),
        margin.select(col("b1").as("b2"), col("n").as("n2")),
        agg.filter(col("k") === "t").select(col("n").as("nn")))
    }
    // V5: marker fold, coalesce(1) before the checkpoint (r14 verdict candidate)
    time("full_marker_c1") {
      val agg = baskets
        .select(explode(concat(pairMarks, marginMarks, totMark)).as("e"))
        .groupBy(col("e.k").as("k"), col("e.b1").as("b1"), col("e.b2").as("b2"))
        .agg(count(lit(1)).as("n"))
        .coalesce(1)
        .localCheckpoint(true)
      val margin = agg.filter(col("k") === "m")
      finish(
        agg.filter(col("k") === "p" && col("n") >= 20)
          .select(col("b1"), col("b2"), col("n").as("n12")),
        margin.select(col("b1"), col("n").as("n1")),
        margin.select(col("b1").as("b2"), col("n").as("n2")),
        agg.filter(col("k") === "t").select(col("n").as("nn")))
    }
    // V6: collect the vocabulary²-bounded aggregate ONCE (≤326 rows); the
    // margin/total lookups are exact-integer driver map-gets; lift/round/
    // order/limit stay Spark expressions over a local relation.
    time("full_collect") {
      val rows = baskets
        .select(explode(concat(pairMarks, marginMarks, totMark)).as("e"))
        .groupBy(col("e.k").as("k"), col("e.b1").as("b1"), col("e.b2").as("b2"))
        .agg(count(lit(1)).as("n"))
        .collect()
      val margin = rows.iterator.filter(_.getString(0) == "m")
        .map(r => r.getString(1) -> r.getLong(3)).toMap
      val nnOpt = rows.iterator.filter(_.getString(0) == "t")
        .map(_.getLong(3)).nextOption()
      val pairs = rows.iterator
        .filter(r => r.getString(0) == "p" && r.getLong(3) >= 20L)
        .flatMap { r => // mirror the production shape's guarded lookups
          for { n1 <- margin.get(r.getString(1))
                n2 <- margin.get(r.getString(2))
                nn <- nnOpt }
            yield (r.getString(1), r.getString(2), r.getLong(3), n1, n2, nn)
        }.toSeq
      import spark.implicits._
      import org.apache.spark.sql.types.DoubleType
      pairs.toDF("b1", "b2", "n12", "n1", "n2", "nn")
        .select(col("b1"), col("b2"), col("n12"), col("n1"), col("n2"),
          round((col("n12").cast(DoubleType) * col("nn").cast(DoubleType))
            / (col("n1").cast(DoubleType) * col("n2").cast(DoubleType)), 6)
            .as("lift"))
        .orderBy(col("lift").desc, col("b1"), col("b2"))
        .limit(20).count()
    }
    spark.stop()
  }
}
