package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Window + time-series semantics (SURVEY §2.5, §2.9). */
class WindowsTimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  test("q_win_rank: ≤3 rows per segment beyond ties, rank within [1,3]") {
    val rows = run("q_win_rank").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("r") >= 1 && r.getAs[Int]("r") <= 3))
  }

  test("q_win_lag_lead: first event per user has null delta") {
    val rows = run("q_win_lag_lead").collect()
    val firstPerUser = rows.groupBy(_.getAs[Long]("user_id")).map(_._2.head)
    firstPerUser.foreach(r => assert(r.isNullAt(r.fieldIndex("delta"))))
  }

  test("running sum is monotone for positive prices (hand-built)") {
    val o = Seq((1L, "2024-01-01", 10.0), (1L, "2024-01-02", 5.0), (1L, "2024-01-03", 2.5))
      .toDF("k", "d", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("d")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val runs = o.withColumn("run", sum(col("v")).over(w))
      .orderBy("d").select("run").as[Double].collect()
    assert(runs.toSeq == Seq(10.0, 15.0, 17.5))
  }

  test("sessionization: 30-min gap splits, count preserved (hand-built)") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L),
      (2L, t("2024-01-01 00:10:00"), 1L), // same session (gap 10m)
      (3L, t("2024-01-01 01:00:00"), 1L), // new session (gap 50m)
      (4L, t("2024-01-01 00:00:00"), 2L)  // other user
    ).toDF("event_id", "ts", "user_id")
    // reuse the production query against a temp dir that mimics the layout
    val dir = "/tmp/graft_sess_fixture"
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_ts_session")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n")).sum == 4)
    assert(out.count(_.getAs[Long]("user_id") == 1L) == 2) // user 1 → 2 sessions
    assert(out.count(_.getAs[Long]("user_id") == 2L) == 1)
  }

  test("q_ts_tumbling bucket counts sum to event count") {
    val rows = run("q_ts_tumbling").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.table(spark, sf, "events").count())
  }

  test("GlobalRank two-pass ranks equal the global-window forms, with no global sort of the fact") {
    import graft.operators.GlobalRank
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority")

    val denseRef = orders.withColumn("dr",
      dense_rank().over(Window.orderBy(col("o_orderpriority"))))
    val dense2p = GlobalRank.denseRank(orders, col("o_orderpriority"), "dr")
    assert(dense2p.except(denseRef).isEmpty && denseRef.except(dense2p).isEmpty)

    val rankRef = orders.withColumn("r",
      rank().over(Window.orderBy(col("o_orderpriority"))))
    val rank2p = GlobalRank.rank(orders, col("o_orderpriority"), "r")
    assert(rank2p.except(rankRef).isEmpty && rankRef.except(rank2p).isEmpty)

    // the scalable property: the fact table side of the plan carries no
    // global (single-partition) sort — only the tiny distinct relation does
    val p = dense2p.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("GlobalRank keeps null keys, ranked first like the window form") {
    import graft.operators.GlobalRank
    val df = Seq(Some("b"), None, Some("a"), None).toDF("k")
    val ranked = GlobalRank.denseRank(df, col("k"), "dr")
    assert(ranked.count() == 4) // a plain === join would drop the null rows
    assert(ranked.filter(col("k").isNull).select("dr").distinct().head().getInt(0) == 1)
    assert(ranked.filter(col("k") === "a").head().getAs[Int]("dr") == 2)
  }

  test("GlobalRank collision guards reject internal/input name clashes loudly") {
    import graft.operators.GlobalRank
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    // rank: out = internal key/count names would silently join rank values
    // against key values (r14 sweep) — must throw, never mis-join
    intercept[IllegalArgumentException](GlobalRank.rank(df, col("k"), "__k"))
    intercept[IllegalArgumentException](GlobalRank.rank(df, col("k"), "__n"))
    intercept[IllegalArgumentException](GlobalRank.rank(df, col("k"), "v"))
    // rowNumberBanded: out/totalOut colliding with an INTERNAL name passed
    // the r13 input-side guards and the final drop deleted the rank column
    intercept[IllegalArgumentException](
      GlobalRank.rowNumberBanded(df, col("v"), Seq(col("v")), out = "__rn"))
    intercept[IllegalArgumentException](
      GlobalRank.rowNumberBanded(df, col("v"), Seq(col("v")),
        out = "rk", totalOut = "__off"))
    intercept[IllegalArgumentException](
      GlobalRank.rowNumberBanded(df, col("v"), Seq(col("v")),
        out = "rk", totalOut = "rk"))
    // and the legal form still works after the guards
    assert(GlobalRank.rank(df, col("k"), "r").count() == 2)
  }
}
