package graft

import org.apache.spark.sql.functions._

/** Join semantics (SURVEY §2.3) on hand-built tiny frames plus fixture-level
  * invariants for the as-of join. */
class JoinsSpec extends SparkSuite {
  import spark.implicits._

  test("left outer + count(col) skips nulls (customers with no orders count 0)") {
    val rows = run("q_join_left_outer").collect()
    val withOrders = Tables.table(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.count(_.getAs[Long]("n_orders") > 0) == withOrders)
    assert(rows.length == Tables.table(spark, sf, "customer").count())
  }

  test("semi + anti partition the customer table") {
    val semiAll = Tables.table(spark, sf, "customer")
      .join(Tables.table(spark, sf, "orders").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = run("q_join_anti").head().getLong(0)
    assert(semiAll + anti == Tables.table(spark, sf, "customer").count())
  }

  test("full outer row count = matches + left-only + right-only (hand-built)") {
    val l = Seq((1, "a"), (2, "b"), (2, "b2")).toDF("k", "lv")
    val r = Seq((2, "x"), (2, "y"), (3, "z")).toDF("rk", "rv")
    val n = l.join(r, col("k") === col("rk"), "full").count()
    // matches: k=2 → 2 left × 2 right = 4; left-only k=1 → 1; right-only k=3 → 1
    assert(n == 6)
  }

  test("theta join respects the non-equi conjunct (hand-built)") {
    val p = Seq((1L, 5), (2L, 50)).toDF("pk", "sz")
    val li = Seq((1L, 10.0), (1L, 3.0), (2L, 10.0)).toDF("lk", "qty")
    val got = li.join(p, col("pk") === col("lk") && col("qty") > col("sz")).count()
    assert(got == 1) // only (pk=1, qty=10) passes
  }

  test("as-of join: last_order never exceeds event ts, null iff no prior order") {
    val rows = run("q_ts_asof_join")
    val ev = Tables.table(spark, sf, "events").select("event_id", "ts")
    val joined = rows.join(ev, "event_id")
    val bad = joined.filter(col("last_order").isNotNull && col("last_order") > col("ts")).count()
    assert(bad == 0)
    assert(rows.count() == math.min(1000, ev.count()))
  }

  test("self join pairs are strictly ordered (no self-pairs, no dupes)") {
    // hand-built: same customer, same day, 3 orders → C(3,2)=3 pairs
    val o = Seq((1L, 10L, "2024-01-01"), (2L, 10L, "2024-01-01"), (3L, 10L, "2024-01-01"))
      .toDF("o_orderkey", "o_custkey", "d")
    val n = o.as("o1").join(o.as("o2"),
      col("o1.o_custkey") === col("o2.o_custkey") &&
        col("o1.o_orderkey") < col("o2.o_orderkey") &&
        col("o1.d") === col("o2.d")).count()
    assert(n == 3)
  }
}
