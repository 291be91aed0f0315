package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k (SURVEY.md §2.6) and set operations (§2.7).
  *
  * orderBy+limit compiles to TakeOrderedAndProject — a per-partition top-k
  * followed by a k-row merge on the driver, never a full global sort. That is
  * the 100 TB-safe shape for every "top N" below.
  *
  * SQL UNION is union-DISTINCT: `.union()` (bag concat) + `.distinct()`.
  */
object SortsSets {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_sort_multi",
      "Multi-key sort (desc/asc mix) + limit 100 → TakeOrderedAndProject, no full sort.",
      (s, dir) =>
        table(s, dir, "lineitem")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100)
          .select("l_orderkey", "l_linenumber"),
      Some(
        "SELECT l_orderkey, l_linenumber FROM lineitem " +
          "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100")),

    GraftQuery(
      "q_sort_offset",
      "Keyset-free pagination: ORDER BY + LIMIT 25 OFFSET 50 over a fully " +
        "tie-broken sort — page 3 of the price-ranked orders. Spark's " +
        "offset() composes with limit into a single global-limit plan " +
        "(collect 75, skip 50), so the page costs O(offset+limit), which " +
        "is why deep pagination at 100 TB should switch to keyset " +
        "(WHERE sort_key > last_seen) — this gates the surface AND " +
        "documents its scale cliff. Deterministic only because the sort " +
        "key is total: price ties broken by the unique key.",
      (s, dir) =>
        table(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .offset(50)
          .limit(25)
          .select("o_orderkey", "o_totalprice"),
      Some(
        "SELECT o_orderkey, o_totalprice FROM orders " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 25 OFFSET 50")),

    GraftQuery(
      "q_topk_global",
      "Global top-10 by price.",
      (s, dir) =>
        table(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select("o_orderkey", "o_totalprice"),
      Some(
        "SELECT o_orderkey, o_totalprice FROM orders " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")),

    GraftQuery(
      "q_set_union",
      "UNION (distinct) of two key sets.",
      (s, dir) =>
        table(s, dir, "customer")
          .select(col("c_nationkey").as("k"))
          .union(table(s, dir, "supplier").select(col("s_nationkey").as("k")))
          .distinct()
          .orderBy("k"),
      Some(
        "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k")),

    GraftQuery(
      "q_set_union_all",
      "UNION ALL (bag union, no dedup shuffle) reduced to per-key multiplicities.",
      (s, dir) =>
        table(s, dir, "customer")
          .select(col("c_nationkey").as("k"))
          .union(table(s, dir, "supplier").select(col("s_nationkey").as("k")))
          .groupBy("k")
          .agg(count(lit(1)).as("n"))
          .orderBy("k"),
      Some(
        "SELECT k, count(*) AS n FROM (SELECT c_nationkey AS k FROM customer " +
          "UNION ALL SELECT s_nationkey FROM supplier) GROUP BY k ORDER BY k")),

    GraftQuery(
      "q_set_intersect",
      "INTERSECT of two key sets.",
      (s, dir) =>
        table(s, dir, "customer")
          .select(col("c_nationkey").as("k"))
          .intersect(table(s, dir, "supplier").select(col("s_nationkey").as("k")))
          .orderBy("k"),
      Some(
        "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k")),

    GraftQuery(
      "q_set_except",
      "EXCEPT of two key sets.",
      (s, dir) =>
        table(s, dir, "customer")
          .select(col("c_nationkey").as("k"))
          .except(table(s, dir, "supplier").select(col("s_nationkey").as("k")))
          .orderBy("k"),
      Some(
        "SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k")),

    GraftQuery(
      "q_set_except_all",
      "EXCEPT ALL — bag difference keeping multiplicity (max(m−n, 0) copies per key), " +
        "the SQL:2003 semantics both engines implement.",
      (s, dir) =>
        table(s, dir, "customer")
          .select(col("c_nationkey").as("k"))
          .exceptAll(table(s, dir, "supplier").select(col("s_nationkey").as("k")))
          .orderBy("k"),
      Some(
        "SELECT c_nationkey AS k FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier ORDER BY k")),

    GraftQuery(
      "q_set_intersect_all",
      "INTERSECT ALL — bag intersection keeping multiplicity (min(m, n) copies per key).",
      (s, dir) =>
        table(s, dir, "customer")
          .select(col("c_nationkey").as("k"))
          .intersectAll(table(s, dir, "supplier").select(col("s_nationkey").as("k")))
          .orderBy("k"),
      Some(
        "SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY k")),

    GraftQuery(
      "q_pareto_frontier",
      "Pareto frontier (skyline) over parts maximizing (p_size, " +
        "p_retailprice): the points no other part weakly dominates with at " +
        "least one strict improvement. The naive form is a quadratic " +
        "NOT-EXISTS self-join (exactly what the oracle runs); the " +
        "distributed form exploits frontier algebra — frontier(A ∪ B) = " +
        "frontier(frontier(A) ∪ frontier(B)) — specialized to the x-axis: " +
        "a map-side-combinable max(y) per x level (50 rows out of 2000 " +
        "parts), a running strictly-preceding max over x descending on " +
        "that tiny set (a point survives iff its level max beats every " +
        "higher-x level max), and a broadcast join back to recover point " +
        "multiplicities. One partial-agg exchange + one 50-row window + " +
        "one broadcast — no pairwise comparison ever materializes, at any " +
        "scale. Equality-only double comparisons (values copied from " +
        "data), so the gate is float-safe.",
      (s, dir) => {
        val pts = table(s, dir, "part").select(col("p_size"), col("p_retailprice").as("y"))
        val perX = pts.groupBy("p_size").agg(max(col("y")).as("ymax"))
        // 50 distinct sizes: the single-partition window is a driver-scale
        // reduction over the pre-aggregated level maxima, not the data.
        val w = Window.orderBy(col("p_size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = perX
          .withColumn("rmax", max(col("ymax")).over(w))
          .filter(col("rmax").isNull || col("ymax") > col("rmax"))
          .select(col("p_size").as("fx"), col("ymax"))
        pts.join(broadcast(frontier), col("p_size") === col("fx") && col("y") === col("ymax"))
          .groupBy("p_size", "y")
          .agg(count(lit(1)).as("n_parts"))
          .orderBy("p_size")
      },
      Some(
        """SELECT p_size, p_retailprice AS y, count(*) AS n_parts FROM part p
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM part q
          |  WHERE q.p_size >= p.p_size AND q.p_retailprice >= p.p_retailprice
          |    AND (q.p_size > p.p_size OR q.p_retailprice > p.p_retailprice))
          |GROUP BY 1, 2 ORDER BY 1""".stripMargin))
  )
}
