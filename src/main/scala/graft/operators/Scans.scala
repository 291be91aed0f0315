package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scans, projections, filters, predicates (SURVEY.md §2.1–2.2).
  *
  * These exist to exercise — and let the bench verify — Catalyst's
  * pushdown machinery: `q_scan_project` must show a 2-column ReadSchema,
  * `q_filter_pred` must show PushedFilters reaching the parquet scan.
  */
object Scans {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_scan_project",
      "Full scan of lineitem projecting 2 of 11 columns — column pruning reaches the parquet reader.",
      (s, dir) => table(s, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
      Some("SELECT l_orderkey, l_extendedprice FROM lineitem")),

    GraftQuery(
      "q_filter_pred",
      "TPC-H Q6-style conjunctive range predicates — pushed down to parquet row groups.",
      (s, dir) =>
        table(s, dir, "lineitem").filter(
          col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24),
      Some(
        "SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
          "AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24")),

    GraftQuery(
      "q_filter_in_like",
      "IN-list + LIKE prefix predicate (In + StartsWith, both parquet-pushable).",
      (s, dir) =>
        table(s, dir, "orders")
          .filter(col("o_orderstatus").isin("F", "O") && col("o_orderpriority").like("1-%"))
          .select("o_orderkey", "o_orderpriority"),
      Some(
        "SELECT o_orderkey, o_orderpriority FROM orders " +
          "WHERE o_orderstatus IN ('F','O') AND o_orderpriority LIKE '1-%'")),

    GraftQuery(
      "q_filter_null_safe",
      "IS NOT NULL + null-safe inequality (IS DISTINCT FROM ≡ NOT(<=>)).",
      (s, dir) =>
        table(s, dir, "events")
          .filter(col("value").isNotNull && !(col("event_type") <=> lit("error")))
          .agg(count(lit(1)).as("n")),
      Some(
        "SELECT count(*) AS n FROM events " +
          "WHERE value IS NOT NULL AND event_type IS DISTINCT FROM 'error'")),

    GraftQuery(
      "q_case_expr",
      "3-arm CASE bucketing via when/otherwise.",
      (s, dir) =>
        table(s, dir, "orders")
          .orderBy("o_orderkey")
          .limit(1000)
          .select(
            col("o_orderkey"),
            when(col("o_totalprice") > 200000, "big")
              .when(col("o_totalprice") > 100000, "mid")
              .otherwise("small")
              .as("bucket")),
      Some(
        "SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'big' " +
          "WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket " +
          "FROM orders ORDER BY o_orderkey LIMIT 1000"))
  )
}
