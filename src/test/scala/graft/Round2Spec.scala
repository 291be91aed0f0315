package graft

import org.apache.spark.sql.functions._

/** Round-2 operator invariants beyond the oracle gate: structural properties
  * the hash compare can't see (grid density, cluster arithmetic, plan shape).
  */
class Round2Spec extends SparkSuite {

  test("q_ts_resample emits a dense grid: every (hour, type) cell exactly once") {
    val df = run("q_ts_resample").cache()
    try {
      val types = df.select("event_type").distinct().count()
      val hours = df.select("h").distinct().count()
      assert(df.count() == types * hours, s"grid not dense: ${df.count()} != $types*$hours")
      assert(df.groupBy("h", "event_type").count().filter(col("count") > 1).count() == 0)
      // forward fill leaves no nulls (leading gaps coalesce to 0)
      assert(df.filter(col("s_fill").isNull).count() == 0)
    } finally df.unpersist()
  }

  test("q_ts_resample broadcasts the type dimension (no shuffle for the grid join)") {
    val p = run("q_ts_resample").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q_dedup_canonical cluster arithmetic bounds") {
    val r = run("q_dedup_canonical").head()
    val (docs, merged, canon) =
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_merged"), r.getAs[Long]("n_canon"))
    assert(docs > 0)
    // docs - merged docs are self-canonical, and each contributes its own id
    // to the canonical set, so canon >= docs - merged. Equality does NOT hold
    // in general: an A~B~C chain with no A~C edge leaves C pointing at B
    // (merged) while B points at A, so B appears as a canonical too — one
    // min-propagation step, not a components fixpoint.
    assert(canon >= docs - merged, s"docs=$docs merged=$merged canon=$canon")
    assert(canon <= docs && merged <= docs && merged >= 0)
  }

  test("q_agg_argmax picks the true per-user maximum") {
    val am = run("q_agg_argmax")
    val counts = Tables.table(spark, sf, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(max(col("n")).as("mx"))
    val joined = am.join(counts, "user_id")
    assert(joined.filter(col("n") =!= col("mx")).count() == 0)
  }

  test("q_set_except_all keeps multiplicity (bag, not set, semantics)") {
    val exAll = run("q_set_except_all").count()
    val ex = run("q_set_except").count()
    assert(exAll >= ex) // bag difference can only be larger than set difference
  }

  test("streaming dedup restores exactly the single-copy event count") {
    val n = run("q_stream_dedup").agg(sum(col("n"))).head().getLong(0)
    assert(n == Tables.table(spark, sf, "events").count())
  }
}
