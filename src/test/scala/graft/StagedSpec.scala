package graft

import org.apache.spark.sql.functions._

/** Gates for the r17 staged-fold superstep device (graft.Staged): the fused
  * materialize+fold must agree with the two-job shape it replaced — the
  * relation bit-for-bit, the scalar with the replaced aggregate — and the
  * two consumers (HITS normalization, components fixpoint) must be
  * shape-insensitive: fused and legacy (graft.probe.stagefold=off) runs
  * return identical rows. */
class StagedSpec extends SparkSuite {
  import spark.implicits._

  test("eagerFold: fold equals the aggregate it replaced, relation unchanged") {
    val df = spark.range(1000).select(
      col("id").as("k"), (col("id") * 7 % 101).as("v"))
    val (staged, mx) = Staged.eagerFold(df, "v", math.max)
    assert(mx.contains(df.agg(max("v")).head.getLong(0)))
    val (staged2, sm) = Staged.eagerFold(df, "v", Math.addExact(_, _))
    assert(sm.contains(df.agg(sum("v")).head.getLong(0)))
    // relation survives the bridge bit-for-bit (same rows, same schema)
    assert(staged.schema == df.schema)
    assert(staged.exceptAll(df).isEmpty && df.exceptAll(staged).isEmpty)
    assert(staged2.count() == 1000)
  }

  test("eagerFold: empty relation folds to None; nulls are skipped like sum()") {
    val empty = spark.range(10).filter(col("id") < 0)
      .select(col("id").as("v"))
    val (stagedE, foldE) = Staged.eagerFold(empty, "v", math.max)
    assert(foldE.isEmpty && stagedE.count() == 0)
    val withNulls = spark.range(10).select(
      when(col("id") % 2 === 0, col("id")).as("v"))
    val (stagedN, foldN) = Staged.eagerFold(withNulls, "v", Math.addExact(_, _))
    assert(foldN.contains(0L + 2 + 4 + 6 + 8))
    assert(stagedN.filter(col("v").isNull).count() == 5)
  }

  test("eagerFold: staged relation keeps the source partitioning (no re-exchange)") {
    val df = spark.range(200).select(col("id").as("k"), col("id").as("v"))
      .repartition(4, col("k"))
    val (staged, _) = Staged.eagerFold(df, "v", math.max)
    val agg = staged.groupBy("k").agg(sum("v"))
    // a partitioning-blind bridge (the first cut's UnknownPartitioning)
    // would re-shuffle here; fromStaged must carry hashpartitioning(k)
    assert(!Bench.hasExchange(agg.queryExecution.executedPlan),
      "groupBy over the staged relation re-introduced an Exchange — the " +
        "bridge lost the source partitioning")
  }

  test("hits and components: fused and legacy shapes return identical rows") {
    def rows(q: String): Seq[String] =
      run(q).collect().map(_.toString).toSeq
    val prev = sys.props.get("graft.probe.stagefold")
    val fusedHits = rows("q_graph_hits")
    val fusedComp = rows("q_dedup_components")
    sys.props("graft.probe.stagefold") = "off"
    try {
      assert(rows("q_graph_hits") == fusedHits)
      assert(rows("q_dedup_components") == fusedComp)
    } finally prev match {
      case Some(v) => sys.props("graft.probe.stagefold") = v
      case None => sys.props.remove("graft.probe.stagefold")
    }
  }
}
