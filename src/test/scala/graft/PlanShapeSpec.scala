package graft

/** Physical-plan shape assertions (SURVEY §4) — the 100 TB design intent,
  * checked on real plans so regressions in pushdown/broadcast/top-k strategy
  * fail the build, not the cluster.
  */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q_scan_project prunes to a 2-column ReadSchema") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"), p)
  }

  test("q_filter_pred pushes predicates to the parquet scan") {
    val p = plan("q_filter_pred")
    // plan toString truncates the PushedFilters list — match the prefix
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
  }

  test("q_join_broadcast uses BroadcastHashJoin") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"), plan("q_join_broadcast"))
  }

  test("q_join_semi plans a semi join, q_join_anti an anti join") {
    assert(plan("q_join_semi").contains("LeftSemi"), plan("q_join_semi"))
    assert(plan("q_join_anti").contains("LeftAnti"), plan("q_join_anti"))
  }

  test("q_sort_multi and q_topk_global avoid a global sort (TakeOrderedAndProject)") {
    assert(plan("q_sort_multi").contains("TakeOrderedAndProject"), plan("q_sort_multi"))
    assert(plan("q_topk_global").contains("TakeOrderedAndProject"), plan("q_topk_global"))
  }

  test("q_agg_tpch_q1 uses two-phase hash aggregation") {
    val p = plan("q_agg_tpch_q1")
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("q_vec_pair_sim keeps the codegen'd dot product inside the projection") {
    val p = plan("q_vec_pair_sim")
    assert(p.contains("graft_dot"), p)
  }

  test("whole-stage codegen is active for the flagship") {
    // AQE prints codegen stages ("*(n)" prefixes) only once the final plan is
    // materialized — execute, then inspect.
    val df = run("q_agg_tpch_q1")
    df.collect() // count() would plan a separate execution; collect finalizes THIS one
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p)
  }
}
