package graft

import org.apache.spark.sql.functions._

/** Scans / filters / aggregations / sorts / set ops (SURVEY §2.1–2.2, 2.4,
  * 2.6–2.7) — semantics checked against independently-computed expectations
  * on the sf0.001 fixtures. End-to-end oracle parity is the driver's DuckDB
  * gate; these specs pin the per-operator semantics and wiring.
  */
class RelationalSpec extends SparkSuite {

  test("q_scan_project keeps all rows, 2 columns") {
    val df = run("q_scan_project")
    assert(df.columns.toSeq == Seq("l_orderkey", "l_extendedprice"))
    assert(df.count() == Tables.table(spark, sf, "lineitem").count())
  }

  test("q_filter_pred matches manual predicate count") {
    val li = Tables.table(spark, sf, "lineitem")
    val manual = li.where(
      "l_shipdate >= TIMESTAMP'1996-01-01' AND l_discount >= 0.03 " +
        "AND l_discount <= 0.07 AND l_quantity < 24").count()
    assert(run("q_filter_pred").count() == manual && manual > 0)
  }

  test("q_filter_null_safe counts rows with non-error type (null-safe)") {
    val ev = Tables.table(spark, sf, "events")
    val manual = ev.filter(col("value").isNotNull)
      .filter(col("event_type").isNull || col("event_type") =!= "error").count()
    assert(run("q_filter_null_safe").head().getLong(0) == manual)
  }

  test("q_agg_tpch_q1 groups sum to filtered row count") {
    val rows = run("q_agg_tpch_q1").collect()
    assert(rows.nonEmpty)
    val totalCnt = rows.map(_.getAs[Long]("cnt")).sum
    val expected = Tables.table(spark, sf, "lineitem")
      .where("l_shipdate <= TIMESTAMP'1998-09-02'").count()
    assert(totalCnt == expected)
  }

  test("q_agg_distinct users never exceeds total distinct users") {
    val total = Tables.table(spark, sf, "events").select("user_id").distinct().count()
    run("q_agg_distinct").collect().foreach { r =>
      assert(r.getAs[Long]("users") <= total)
    }
  }

  test("q_agg_rollup has grand total + per-region subtotals") {
    val rows = run("q_agg_rollup").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.table(spark, sf, "customer").count())
    // region subtotal = sum of its nation rows
    val regions = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    regions.foreach { sub =>
      val parts = rows.filter(r =>
        !r.isNullAt(0) && !r.isNullAt(1) && r.getString(0) == sub.getString(0))
      assert(parts.map(_.getAs[Long]("n")).sum == sub.getAs[Long]("n"))
    }
  }

  test("q_agg_cube covers 4 grouping-set shapes") {
    val rows = run("q_agg_cube").collect()
    val shapes = rows.map(r => (r.isNullAt(0), r.isNullAt(1))).distinct
    assert(shapes.toSet.size == 4)
  }

  test("q_agg_having all groups exceed threshold") {
    run("q_agg_having").collect().foreach(r => assert(r.getAs[Double]("q") > 150))
  }

  test("q_sort_multi returns descending prices") {
    val li = Tables.table(spark, sf, "lineitem")
    val top = li.orderBy(col("l_extendedprice").desc).limit(100)
      .select("l_orderkey", "l_linenumber").collect().toSet
    assert(run("q_sort_multi").collect().toSet.subsetOf(
      li.orderBy(col("l_extendedprice").desc).limit(120)
        .select("l_orderkey", "l_linenumber").collect().toSet))
    assert(run("q_sort_multi").count() == 100 && top.nonEmpty)
  }

  test("set ops: union ⊇ intersect; except ∩ intersect = ∅") {
    val u = run("q_set_union").collect().map(_.getInt(0)).toSet
    val i = run("q_set_intersect").collect().map(_.getInt(0)).toSet
    val e = run("q_set_except").collect().map(_.getInt(0)).toSet
    assert(i.subsetOf(u))
    assert((e & i).isEmpty)
    assert((i ++ e).subsetOf(u))
  }
}
