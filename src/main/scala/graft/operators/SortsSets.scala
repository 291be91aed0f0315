package graft.operators

import graft.{GraftQuery, Tables}
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
        "SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY k"))
  )
}
