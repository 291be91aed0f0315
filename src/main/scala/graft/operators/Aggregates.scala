package graft.operators

import graft.{Exact, GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregations (SURVEY.md §2.4): multi-measure hash agg, distinct agg,
  * moments, rollup/cube grouping sets, having.
  *
  * All group-bys compile to two-phase HashAggregate (partial map-side combine
  * before the shuffle) — the shape that scales: only group cardinality, not
  * row count, crosses the wire. Double sums over money use Exact.moneySum
  * (decimal accumulation) so results are partition-order-insensitive; sums of
  * integral doubles (l_quantity) are exact as-is.
  */
object Aggregates {
  import Tables.table

  /** TPC-H Q1 — the flagship (SparkEntry.entry). */
  def tpchQ1(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Exact.moneySum(col("l_extendedprice")).as("sum_base"),
        Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_agg_tpch_q1",
      "TPC-H Q1: filtered multi-measure hash aggregation (sum/avg/count).",
      tpchQ1,
      Some(
        "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
          Exact.moneySumSql("l_extendedprice") + " AS sum_base, " +
          Exact.moneySumSql("l_extendedprice*(1-l_discount)") + " AS sum_disc, " +
          "round(avg(l_quantity),6) AS avg_qty, count(*) AS cnt " +
          "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
          "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),

    GraftQuery(
      "q_agg_distinct",
      "count(DISTINCT) per group — Spark's expand + two-phase distinct aggregation.",
      (s, dir) =>
        table(s, dir, "events")
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("users"))
          .orderBy("event_type"),
      Some(
        "SELECT event_type, count(DISTINCT user_id) AS users FROM events " +
          "GROUP BY event_type ORDER BY event_type")),

    GraftQuery(
      "q_agg_minmax_stddev",
      "min/max/sample-stddev (central moment aggregate).",
      (s, dir) =>
        table(s, dir, "customer")
          .groupBy("c_mktsegment")
          .agg(
            min(col("c_acctbal")).as("mn"),
            max(col("c_acctbal")).as("mx"),
            round(stddev_samp(col("c_acctbal")), 4).as("sd"))
          .orderBy("c_mktsegment"),
      Some(
        "SELECT c_mktsegment, min(c_acctbal) AS mn, max(c_acctbal) AS mx, " +
          "round(stddev_samp(c_acctbal),4) AS sd FROM customer " +
          "GROUP BY c_mktsegment ORDER BY c_mktsegment")),

    GraftQuery(
      "q_agg_rollup",
      "ROLLUP hierarchical subtotals (Expand + grouping-id under the hood). Expressed " +
        "via spark.sql: DetectAmbiguousSelfJoin false-positives on any by-name sort over " +
        "a join→rollup Dataset (the Expand duplicates grouping attrs); the SQL path " +
        "produces the identical plan without Dataset-id metadata.",
      (s, dir) => {
        // unique per-invocation view name, dropped right after spark.sql's
        // eager analysis resolves it — no catalog state leaks, re-entrant
        val view = "graft_rollup_in_" + java.util.UUID.randomUUID().toString.replace("-", "")
        table(s, dir, "customer")
          .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .createOrReplaceTempView(view)
        try s.sql(
          s"SELECT r_name, n_name, count(*) AS n FROM $view " +
            "GROUP BY ROLLUP(r_name, n_name) " +
            "ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST")
        finally s.catalog.dropTempView(view)
      },
      Some(
        "SELECT r_name, n_name, count(*) AS n FROM customer " +
          "JOIN nation ON c_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey " +
          "GROUP BY ROLLUP(r_name, n_name) ORDER BY r_name NULLS FIRST, n_name NULLS FIRST")),

    GraftQuery(
      "q_agg_cube",
      "CUBE over two keys — all grouping-set combinations.",
      (s, dir) =>
        table(s, dir, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders " +
          "GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
          "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST")),

    GraftQuery(
      "q_agg_percentile",
      "Exact interpolated percentiles (median + p90) per group — Spark percentile ≡ " +
        "DuckDB quantile_cont (both linear interpolation at p·(n−1)).",
      (s, dir) =>
        table(s, dir, "customer")
          .groupBy("c_mktsegment")
          .agg(
            round(expr("percentile(c_acctbal, 0.5)"), 4).as("p50"),
            round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90"))
          .orderBy("c_mktsegment"),
      Some(
        "SELECT c_mktsegment, round(quantile_cont(c_acctbal, 0.5),4) AS p50, " +
          "round(quantile_cont(c_acctbal, 0.9),4) AS p90 " +
          "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment")),

    GraftQuery(
      "q_agg_approx_distinct",
      "HLL approximate distinct count per group (SURVEY §2.4 stretch), with an " +
        "oracle-checkable QUALITY BOUND: the raw estimate is engine-specific (Spark " +
        "HLL++ vs DuckDB HLL differ by design), so the query emits the EXACT distinct " +
        "count plus a relative-error-bound boolean |approx−exact|/exact ≤ 5% (HLL++ " +
        "rsd=0.02, so the bound is a 2.5σ claim; HLL is deterministic per dataset). " +
        "The DuckDB twin computes the same exact side with a literal TRUE — any HLL " +
        "drift past the bound breaks the hash. At 100 TB the sketch is the point: " +
        "one pass, fixed memory per group, no distinct-expansion shuffle for the " +
        "estimate leg; the exact leg here is the audit, not the production path.",
      (s, dir) =>
        // both legs over the DEDUPED (priority, custkey) relation: the HLL
        // sketch is duplicate-insensitive (identical estimate, same digest
        // set), and the exact side becomes a plain count — one two-phase
        // distinct shuffle, no Expand duplication of the fact rows (the
        // mixed countDistinct+HLL single agg planned an Expand that 2×'d
        // the scan through the exchange, measured 1.4s vs 0.3s)
        table(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_custkey"))
          .distinct()
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("exact_users"),
            approx_count_distinct(col("o_custkey"), 0.02).as("approx_users"))
          .select(
            col("o_orderpriority"),
            col("exact_users"),
            (abs(col("approx_users") - col("exact_users")) /
              col("exact_users") <= 0.05).as("hll_within_5pct"))
          .orderBy("o_orderpriority"),
      Some(
        "SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_users, " +
          "TRUE AS hll_within_5pct " +
          "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    GraftQuery(
      "q_pivot",
      "Pivot (long→wide conditional aggregation): order totals by priority × status. " +
        "Pivot values are pinned explicitly — at scale an inferred pivot is an extra " +
        "distinct-collect job and nondeterministic column order.",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(Exact.moneySum(col("o_totalprice")))
          .orderBy("o_orderpriority"),
      Some(
        "SELECT o_orderpriority, " +
          Seq("F", "O", "P").map(v =>
            Exact.moneySumSql(s"CASE WHEN o_orderstatus = '$v' THEN o_totalprice END") + s" AS \"$v\"")
            .mkString(", ") +
          " FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    GraftQuery(
      "q_agg_grouping_sets",
      "Arbitrary GROUPING SETS with the grouping_id marker (beyond rollup/cube): " +
        "{(status,priority), (status), ()} — SQL path, like rollup.",
      (s, dir) => {
        val view = "graft_gsets_" + java.util.UUID.randomUUID().toString.replace("-", "")
        table(s, dir, "orders").createOrReplaceTempView(view)
        try s.sql(
          s"SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
            "CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid " +
            s"FROM $view GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ()) " +
            "ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST")
        finally s.catalog.dropTempView(view)
      },
      Some(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
          "CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid " +
          "FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ()) " +
          "ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST")),

    GraftQuery(
      "q_agg_approx_quantile",
      "Approximate quantile sketch per group (SURVEY §2.4 stretch), with an " +
        "oracle-checkable QUALITY BOUND: the sketch value is engine-specific (Spark's " +
        "Greenwald-Khanna variant vs DuckDB's t-digest differ by design), so the query " +
        "emits the EXACT interpolated percentiles plus relative-error-bound booleans " +
        "|approx−exact|/exact ≤ 5% (GK accuracy=1000 ⇒ rank error ≤ 0.1% of n; the " +
        "value bound is calibrated with ≥10× margin on this distribution and the " +
        "sketch is deterministic per dataset). The DuckDB twin computes the same " +
        "exact side with literal TRUEs — sketch drift past the bound breaks the hash. " +
        "At 100 TB the sketch leg is the production path (one pass, bounded memory); " +
        "the exact percentile leg is the audit.",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            // one exact-percentile buffer for both points: two scalar
            // percentile() aggs each build their own per-group value map —
            // the array form halves the dominant (exact-audit-leg) cost,
            // identical interpolation per point
            expr("percentile(o_totalprice, array(0.5, 0.95))").as("eps"),
            expr("approx_percentile(o_totalprice, array(0.5, 0.95), 1000)").as("qs"))
          .select(
            col("o_orderstatus"),
            round(element_at(col("eps"), 1), 4).as("p50"),
            round(element_at(col("eps"), 2), 4).as("p95"),
            (abs(element_at(col("qs"), 1) - element_at(col("eps"), 1))
              / element_at(col("eps"), 1) <= 0.05).as("p50_within_5pct"),
            (abs(element_at(col("qs"), 2) - element_at(col("eps"), 2))
              / element_at(col("eps"), 2) <= 0.05).as("p95_within_5pct"))
          .orderBy("o_orderstatus"),
      Some(
        "SELECT o_orderstatus, " +
          "round(quantile_cont(o_totalprice, 0.5), 4) AS p50, " +
          "round(quantile_cont(o_totalprice, 0.95), 4) AS p95, " +
          "TRUE AS p50_within_5pct, TRUE AS p95_within_5pct " +
          "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    GraftQuery(
      "q_agg_corr",
      "Pearson correlation + sample covariance per group (co-moment aggregates).",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("r"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cv"))
          .orderBy("l_returnflag"),
      Some(
        "SELECT l_returnflag, round(corr(l_quantity, l_extendedprice),6) AS r, " +
          "round(covar_samp(l_quantity, l_extendedprice),2) AS cv " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    GraftQuery(
      "q_agg_string_agg",
      "Ordered string aggregation per group — Spark sort_array(collect_list) + " +
        "array_join ≡ DuckDB string_agg(... ORDER BY): collect_list alone is " +
        "arrival-ordered (nondeterministic), the in-group sort is load-bearing.",
      (s, dir) =>
        table(s, dir, "nation")
          .groupBy("n_regionkey")
          .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("names"))
          .orderBy("n_regionkey"),
      Some(
        "SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names " +
          "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")),

    GraftQuery(
      "q_histogram",
      "Fixed-width histogram via arithmetic bucketing (floor(x/step) clamped) — " +
        "per-row deterministic on both engines; DuckDB 1.0 lacks width_bucket.",
      (s, dir) =>
        table(s, dir, "orders")
          .select(least(floor(col("o_totalprice") / 50000), lit(9.0)).cast("int").as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"))
          .orderBy("bucket"),
      Some(
        "SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INT) AS bucket, count(*) AS n " +
          "FROM orders GROUP BY 1 ORDER BY 1")),

    GraftQuery(
      "q_agg_having",
      "Post-aggregation filter (HAVING). l_quantity is integral so the double sum is exact.",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_partkey")
          .agg(sum(col("l_quantity")).as("q"))
          .filter(col("q") > 150)
          .orderBy(col("q").desc, col("l_partkey")),
      Some(
        "SELECT l_partkey, sum(l_quantity) AS q FROM lineitem GROUP BY l_partkey " +
          "HAVING sum(l_quantity) > 150 ORDER BY q DESC, l_partkey")),

    GraftQuery(
      "q_unpivot",
      "Unpivot (wide→long): three exact money measures per return flag melted to " +
        "(flag, metric, v) rows via the stack Generator — the inverse surface of " +
        "q_pivot. Map-side fan-out after a single aggregation pass.",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            graft.Exact.moneySum(col("l_quantity")).as("qty"),
            graft.Exact.moneySum(col("l_extendedprice")).as("price"),
            graft.Exact.moneySum(col("l_discount")).as("disc"))
          .selectExpr("l_returnflag",
            "stack(3, 'qty', qty, 'price', price, 'disc', disc) AS (metric, v)")
          .orderBy("l_returnflag", "metric"),
      Some {
        def m(c: String) = graft.Exact.moneySumSql(c)
        s"""WITH a AS (SELECT l_returnflag, ${m("l_quantity")} AS qty,
           |  ${m("l_extendedprice")} AS price, ${m("l_discount")} AS disc
           |  FROM lineitem GROUP BY 1)
           |SELECT l_returnflag, metric, v FROM (
           |  SELECT l_returnflag, 'qty' AS metric, qty AS v FROM a
           |  UNION ALL SELECT l_returnflag, 'price', price FROM a
           |  UNION ALL SELECT l_returnflag, 'disc', disc FROM a)
           |ORDER BY l_returnflag, metric""".stripMargin
      }),

    GraftQuery(
      "q_agg_argmax",
      "Arg-max per group: each user's most frequent event type, deterministic " +
        "tie-break by type name — count + one windowed row_number, both " +
        "partitioned on the same user key (one shuffle).",
      (s, dir) => {
        val counts = table(s, dir, "events")
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("n").desc, col("event_type"))
        counts
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "n")
          .orderBy("user_id")
          .limit(1000)
      },
      Some(
        """SELECT user_id, event_type, n FROM (
          |  SELECT user_id, event_type, n, row_number() OVER
          |    (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
          |  FROM (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2))
          |WHERE rn = 1 ORDER BY user_id LIMIT 1000""".stripMargin)),

    GraftQuery(
      "q_agg_bool_countif",
      "Boolean/conditional aggregates per group: count_if, bool_and, bool_or — " +
        "all partial-aggregable single-pass reducers.",
      (s, dir) =>
        table(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            expr("count_if(o_totalprice > 200000)").as("n_big"),
            expr("bool_and(o_totalprice > 0)").as("all_pos"),
            expr("bool_or(o_totalprice > 400000)").as("any_huge"))
          .orderBy("o_orderstatus"),
      Some(
        // CAST: DuckDB's count_if sums BOOLEANs → HUGEINT, same class of
        // divergence as q_ts_session's sid
        "SELECT o_orderstatus, CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big, " +
          "bool_and(o_totalprice > 0) AS all_pos, bool_or(o_totalprice > 400000) AS any_huge " +
          "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    GraftQuery(
      "q_agg_salted",
      "Salted two-phase aggregation under the oracle gate — the hot-key " +
        "mitigation (Skew.saltedStats) run end-to-end: each key splits into 16 " +
        "content-hash salted sub-keys for the parallel first aggregation, a tiny " +
        "second aggregation combines partials per original key. events.event_type " +
        "has single-digit cardinality, exactly the shape whose plain groupBy " +
        "stragglers at 100 TB. Exact by construction: counts and micro-unit LONG " +
        "money partials are associative integers, and the salt is a content hash " +
        "(deterministic under task retry — a rand()/partition-id salt silently " +
        "double-counts on recompute). The oracle is the plain one-phase GROUP BY.",
      (s, dir) =>
        Skew.saltedStats(
            graft.Tables.table(s, dir, "events"), col("event_type"), col("value"))
          .select(col("key").as("event_type"), col("n"), col("total"))
          .orderBy("event_type"),
      Some(
        "SELECT event_type, count(*) AS n, " + Exact.moneySumSql("value") + " AS total " +
          "FROM events GROUP BY event_type ORDER BY event_type")),

    GraftQuery(
      "q_agg_mode",
      "Modal value per group (most frequent market segment per nation), " +
        "spelled as count-then-rank rather than a native mode() aggregate: " +
        "engines disagree on mode()'s tie rule, so the tie-break here is " +
        "explicit (count DESC, then segment ASC) and the result is " +
        "deterministic everywhere. Scale shape: the corpus reduces in a " +
        "two-phase (group, value) hash agg first; the rank window then runs " +
        "over the (groups × domain)-sized count relation only — the mode of " +
        "100 TB never windows the corpus.",
      (s, dir) => {
        val c = table(s, dir, "customer")
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("c_nationkey").orderBy(col("cnt").desc, col("c_mktsegment"))
        c.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("c_nationkey"), col("c_mktsegment").as("mode_seg"), col("cnt").as("mode_cnt"))
          .orderBy("c_nationkey")
      },
      Some(
        """WITH c AS (SELECT c_nationkey, c_mktsegment, count(*) AS cnt
          |  FROM customer GROUP BY 1, 2),
          |r AS (SELECT c_nationkey, c_mktsegment, cnt,
          |  row_number() OVER (PARTITION BY c_nationkey ORDER BY cnt DESC, c_mktsegment) AS rn
          |  FROM c)
          |SELECT c_nationkey, c_mktsegment AS mode_seg, cnt AS mode_cnt
          |FROM r WHERE rn = 1 ORDER BY c_nationkey""".stripMargin)),

    GraftQuery(
      "q_skew_profile",
      "Join-key skew diagnostics — the profile you run BEFORE choosing a " +
        "join strategy at 100 TB: per-key counts of orders.o_custkey " +
        "reduced to (total rows, distinct keys, max/min per-key count, the " +
        "hottest key with a deterministic min-key tie-break via " +
        "min(struct(-cnt, k)), and the top-1 key's share of all rows). " +
        "Two cascaded aggregations, both map-side combinable; the share is " +
        "ONE IEEE division of two exact integers then round(…, 9) — " +
        "margin from the decimal rounding tie measured at both fixture " +
        "scales before wiring. This is the measurement behind " +
        "q_join_salted's salting decision and AQE's skew-join threshold.",
      (s, dir) => {
        table(s, dir, "orders")
          .groupBy(col("o_custkey").as("k"))
          .agg(count(lit(1)).as("cnt"))
          .agg(
            sum(col("cnt")).as("n_rows"),
            count(lit(1)).as("n_keys"),
            max(col("cnt")).as("max_cnt"),
            min(col("cnt")).as("min_cnt"),
            min(struct((-col("cnt")).as("c"), col("k").as("k"))).getField("k").as("top1_key"),
            round(max(col("cnt")).cast(DoubleType) / sum(col("cnt")).cast(DoubleType), 9)
              .as("top1_share"))
      },
      Some(
        """WITH c AS (SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY 1)
          |SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys,
          |  CAST(max(cnt) AS BIGINT) AS max_cnt, CAST(min(cnt) AS BIGINT) AS min_cnt,
          |  (min({'c': -cnt, 'k': k})).k AS top1_key,
          |  round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 9) AS top1_share
          |FROM c""".stripMargin)),

    GraftQuery(
      "q_agg_multi_distinct",
      "Several COUNT(DISTINCT …) over DIFFERENT columns in one aggregation " +
        "— the profiling query that forces Spark's Expand rewrite (each " +
        "input row replicates once per distinct-aggregate with a gid, then " +
        "one two-phase agg dedups all three key spaces in a single " +
        "shuffle): distinct users, distinct active days, distinct " +
        "(user, day) pairs, plus a plain count, per event_type. The naive " +
        "alternative is one self-join per distinct column. Day derived by " +
        "epoch-day arithmetic (engine-portable; see q_ts_calendar).",
      (s, dir) => {
        val day = graft.Ts.dayBucket(col("ts"))
        table(s, dir, "events")
          .select(col("event_type"), col("user_id"), day.as("day"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            countDistinct(col("day")).as("n_days"),
            countDistinct(col("user_id"), col("day")).as("n_user_days"))
          .orderBy("event_type")
      },
      Some(
        """SELECT event_type, count(*) AS n,
          |  count(DISTINCT user_id) AS n_users,
          |  count(DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS n_days,
          |  count(DISTINCT (user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT))) AS n_user_days
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_sql_analytic",
      "The SQL front door end-to-end: a CTE + broadcast-joined dim + " +
        "window-ranked analytic expressed as SQL TEXT through spark.sql " +
        "over temp views — gating that a reference user who writes SQL, " +
        "not DataFrames, gets the same engine (parser → analyzer → same " +
        "Catalyst plans; the view is dropped after analysis, no catalog " +
        "state leaks). Top-3 customers by exact money mass per region via " +
        "dense_rank.",
      (s, dir) => {
        val v1 = "graft_sqla_o_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val v2 = "graft_sqla_c_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val v3 = "graft_sqla_n_" + java.util.UUID.randomUUID().toString.replace("-", "")
        table(s, dir, "orders").createOrReplaceTempView(v1)
        table(s, dir, "customer").createOrReplaceTempView(v2)
        table(s, dir, "nation").createOrReplaceTempView(v3)
        try s.sql(
          s"""WITH mass AS (
             |  SELECT n.n_name, c.c_custkey,
             |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             |  FROM $v1 o JOIN $v2 c ON o.o_custkey = c.c_custkey
             |  JOIN $v3 n ON c.c_nationkey = n.n_nationkey
             |  GROUP BY n.n_name, c.c_custkey),
             |r AS (SELECT n_name, c_custkey, cents,
             |    dense_rank() OVER (PARTITION BY n_name ORDER BY cents DESC, c_custkey) AS rk
             |  FROM mass)
             |SELECT n_name, rk, c_custkey, cents FROM r WHERE rk <= 3
             |ORDER BY n_name, rk, c_custkey""".stripMargin)
        finally {
          s.catalog.dropTempView(v1); s.catalog.dropTempView(v2); s.catalog.dropTempView(v3)
        }
      },
      Some(
        """WITH mass AS (
          |  SELECT n.n_name, c.c_custkey,
          |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
          |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          |  JOIN nation n ON c.c_nationkey = n.n_nationkey
          |  GROUP BY n.n_name, c.c_custkey),
          |r AS (SELECT n_name, c_custkey, cents,
          |    dense_rank() OVER (PARTITION BY n_name ORDER BY cents DESC, c_custkey) AS rk
          |  FROM mass)
          |SELECT n_name, rk, c_custkey, cents FROM r WHERE rk <= 3
          |ORDER BY n_name, rk, c_custkey""".stripMargin)),

    GraftQuery(
      "q_agg_mad",
      "Median absolute deviation per order priority — the robust scale " +
        "estimate (outlier-immune, unlike stddev): MAD = median(|x − " +
        "median(x)|) in two exact-percentile passes. The group medians " +
        "(Spark's exact percentile ≡ DuckDB's median on the same sorted " +
        "doubles — parity established by q_agg_percentile) broadcast back " +
        "over the fact rows for the deviation pass; two group-keyed " +
        "exchanges total, deviations never leave their partitions before " +
        "the second percentile's own exchange. Money stays 2-dp so every " +
        "median is either a data value or the exact midpoint of two. " +
        "Exact percentile buffers a group's values (the q_agg_percentile " +
        "caveat); at 100 TB swap both passes to approx_percentile under " +
        "the established quality-bound gate. (A one-scan variant hanging " +
        "both passes off one repartition(o_orderpriority) was measured " +
        "bench-neutral and REJECTED: repartitioning on a 5-value key caps " +
        "the percentile buffer BUILD at 5 tasks, surrendering the " +
        "map-side partial parallelism this shape keeps at scale.)",
      (s, dir) => {
        val o = table(s, dir, "orders").select(col("o_orderpriority"), col("o_totalprice"))
        val med = o.groupBy("o_orderpriority")
          .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
        o.join(broadcast(med), "o_orderpriority")
          .select(col("o_orderpriority"), abs(col("o_totalprice") - col("med")).as("dev"),
            col("med"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            round(max(col("med")), 2).as("med"),
            round(expr("percentile(dev, 0.5)"), 2).as("mad"))
          .orderBy("o_orderpriority")
      },
      Some(
        """WITH m AS (SELECT o_orderpriority, median(o_totalprice) AS med
          |  FROM orders GROUP BY o_orderpriority)
          |SELECT o.o_orderpriority, count(*) AS n,
          |  round(max(m.med), 2) AS med,
          |  round(median(abs(o.o_totalprice - m.med)), 2) AS mad
          |FROM orders o JOIN m ON o.o_orderpriority = m.o_orderpriority
          |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin)),

    GraftQuery(
      "q_agg_gini",
      "Gini coefficient of order value per priority — the inequality " +
        "metric data-curation uses on token/doc mass distributions: " +
        "G = (2·Σ i·x_(i)) / (n·Σx) − (n+1)/n over the ascending-sorted " +
        "values. Rank-weighted sums stay EXACT BIGINT (integer cents × " +
        "dense in-group row_number; ≈ n²·x̄ per group — shard to DECIMAL " +
        "past ~3e18 cent-rank mass), so the only floats are the final " +
        "two divisions on identical operands. One keyed window for the " +
        "ranks (the standard per-group sort) + one hash agg.",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("cents"), col("o_orderkey"))
        table(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents"))
          .withColumn("rk", row_number().over(w).cast(LongType))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
            sum(col("rk") * col("cents")).as("sixi"))
          .select(col("o_orderpriority"), col("n"),
            // class-22 guard: a group whose cent mass is zero (all-zero
            // prices) has no defined Gini — NULL both engines
            round(
              graft.Exact.divNZ(lit(2d) * col("sixi").cast(DoubleType),
                col("n").cast(DoubleType) * col("sx").cast(DoubleType))
                - (col("n") + lit(1L)).cast(DoubleType) / col("n").cast(DoubleType),
              6).as("gini"))
          .orderBy("o_orderpriority")
      },
      Some(
        s"""WITH c AS (SELECT o_orderpriority, o_orderkey,
          |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          |  FROM orders),
          |r AS (SELECT o_orderpriority, cents,
          |    CAST(row_number() OVER (PARTITION BY o_orderpriority
          |      ORDER BY cents, o_orderkey) AS BIGINT) AS rk
          |  FROM c),
          |a AS (SELECT o_orderpriority, count(*) AS n,
          |    CAST(sum(cents) AS BIGINT) AS sx,
          |    CAST(sum(rk * cents) AS BIGINT) AS sixi
          |  FROM r GROUP BY o_orderpriority)
          |SELECT o_orderpriority, n,
          |  round(${graft.Exact.divNZSql("2.0 * CAST(sixi AS DOUBLE)",
             "CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)")}
          |    - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
          |FROM a ORDER BY o_orderpriority""".stripMargin)),

    GraftQuery(
      "q_agg_regression",
      "Per-group OLS regression (the regr_slope/regr_intercept surface): " +
        "order value in integer cents regressed on order date in epoch " +
        "days, per priority class. The five sufficient statistics (n, Σx, " +
        "Σy, Σxy, Σx²) accumulate as EXACT BIGINTs — associative, " +
        "partition-order-free — and only the closed-form slope/intercept " +
        "arithmetic runs in double, with the SAME expression tree on both " +
        "engines (identical integer inputs → identical IEEE roundings, " +
        "even where Σxy exceeds 2^53 and the cast itself rounds). The " +
        "engine-native regr_* aggregates fold floats in partition order " +
        "and cannot promise that. One hash agg; sums stay in range to " +
        "~1e18 cent·day mass — shard to DECIMAL beyond.",
      (s, dir) => {
        val x = datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast(LongType)
        val y = floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
        // products in DOUBLE from the individually-cast exact sums: n·Σxy
        // overflows BIGINT past ~sf0.05, and both engines casting the SAME
        // integers then applying the SAME ops keeps the result bitwise equal
        def D(c: String) = col(c).cast(DoubleType)
        val d = D("n") * D("sxx") - D("sx") * D("sx")
        val slopeNum = D("n") * D("sxy") - D("sx") * D("sy")
        table(s, dir, "orders")
          .select(col("o_orderpriority"), x.as("x"), y.as("y"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("o_orderpriority"), col("n"),
            round(slopeNum / d, 6).as("slope"),
            round((D("sy") - (slopeNum / d) * D("sx")) / D("n"), 4).as("intercept"))
          .orderBy("o_orderpriority")
      },
      Some(
        """WITH s AS (
          |  SELECT o_orderpriority,
          |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
          |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
          |  FROM orders),
          |a AS (SELECT o_orderpriority, count(*) AS n,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
          |  FROM s GROUP BY o_orderpriority),
          |d AS (SELECT o_orderpriority, n,
          |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
          |    CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
          |    CAST(sxx AS DOUBLE) AS sxxd
          |  FROM a)
          |SELECT o_orderpriority, n,
          |  round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) AS slope,
          |  round((syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)) * sxd)
          |    / nd, 4) AS intercept
          |FROM d ORDER BY o_orderpriority""".stripMargin)),

    GraftQuery(
      "q_agg_moments",
      "Skewness and excess kurtosis of order value per priority — the " +
        "higher-moment surface next to stddev/MAD/Gini, the shape " +
        "diagnostic curation runs on token/doc-mass distributions. The " +
        "four power sums (Σy…Σy⁴ in integer cents) accumulate EXACTLY — " +
        "LONG for the linear sum, DECIMAL(38,0) for the higher powers " +
        "(Σy⁴ reaches ~1e35 at sf0.1, far past BIGINT; DuckDB mirrors in " +
        "HUGEINT) — so the statistics are associative and partition-" +
        "order-free where engine-native skewness()/kurtosis() fold " +
        "floats in stream order. The closed-form raw-moment arithmetic " +
        "runs in double with the SAME expression tree on both engines " +
        "(correctly-rounded big-integer→double casts of identical exact " +
        "sums; m2^1.5 spelled m2·sqrt(m2) because sqrt IS correctly " +
        "rounded where pow is not — the q_sample_mixture discipline). " +
        "One map-side-combined hash agg; the cent⁴ mass nears the " +
        "38-digit cap around 1e9 rows/group — past that, pre-aggregate " +
        "per salted sub-shard and merge the sums as two 19-digit limbs.",
      (s, dir) => {
        val dec = DecimalType(38, 0)
        val y = floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
        val yD = col("y").cast(dec)
        def D(c: String) = col(c).cast(DoubleType)
        val mean = D("sy") / D("n")
        val m2 = D("sy2") / D("n") - mean * mean
        val m3 = D("sy3") / D("n") - lit(3d) * mean * (D("sy2") / D("n")) +
          lit(2d) * mean * mean * mean
        val m4 = D("sy4") / D("n") - lit(4d) * mean * (D("sy3") / D("n")) +
          lit(6d) * mean * mean * (D("sy2") / D("n")) -
          lit(3d) * mean * mean * mean * mean
        table(s, dir, "orders")
          .select(col("o_orderpriority"), y.as("y"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            sum(col("y")).as("sy"),
            sum(yD * yD).as("sy2"),
            sum(yD * yD * yD).as("sy3"),
            sum(yD * yD * yD * yD).as("sy4"))
          .select(col("o_orderpriority"), col("n"),
            round(m3 / (m2 * sqrt(m2)), 6).as("skewness"),
            round(m4 / (m2 * m2) - lit(3d), 6).as("kurtosis"))
          .orderBy("o_orderpriority")
      },
      Some(
        """WITH s AS (SELECT o_orderpriority,
          |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y FROM orders),
          |a AS (SELECT o_orderpriority, count(*) AS n,
          |    CAST(sum(y) AS BIGINT) AS sy,
          |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS sy2,
          |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS sy3,
          |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT) * CAST(y AS HUGEINT)
          |      * CAST(y AS HUGEINT)) AS sy4
          |  FROM s GROUP BY o_orderpriority),
          |d AS (SELECT o_orderpriority, n,
          |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
          |    CAST(sy2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
          |    CAST(sy3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
          |    CAST(sy4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
          |  FROM a),
          |m AS (SELECT o_orderpriority, n,
          |    r2 - mean * mean AS m2,
          |    r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3,
          |    r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
          |      - 3.0 * mean * mean * mean * mean AS m4
          |  FROM d)
          |SELECT o_orderpriority, n,
          |  round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
          |  round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis
          |FROM m ORDER BY o_orderpriority""".stripMargin)),

    GraftQuery(
      "q_sql_modern",
      "Modern-SQL surface gate through the text front door: GROUP BY " +
        "ALL (grouping keys inferred from the select list), aggregate " +
        "FILTER (WHERE …) clauses (the per-aggregate predicate that " +
        "replaces CASE-wrapped sums), and a named WINDOW clause shared " +
        "by two functions — the three dialect features a user migrating " +
        "warehouse SQL hits first. Same engine underneath: FILTER " +
        "lowers to conditional aggregates, the named window is " +
        "resolved once and shared, GROUP BY ALL resolves to the " +
        "explicit key list — the gate proves the dialect, the plan is " +
        "the ordinary two-phase hash aggregate + one keyed window.",
      (s, dir) => {
        val v = "graft_modern_" + java.util.UUID.randomUUID().toString.replace("-", "")
        table(s, dir, "orders").createOrReplaceTempView(v)
        try s.sql(
          s"""WITH base AS (
             |  SELECT o_orderpriority,
             |    count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
             |    count(*) FILTER (WHERE o_orderstatus <> 'F') AS n_open,
             |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             |      AS finished_cents
             |  FROM $v GROUP BY ALL)
             |SELECT o_orderpriority, n_finished, n_open, finished_cents,
             |  CAST(rank() OVER w AS BIGINT) AS rk,
             |  CAST(sum(finished_cents) OVER w AS BIGINT) AS running_cents
             |FROM base
             |WINDOW w AS (ORDER BY finished_cents DESC, o_orderpriority)
             |ORDER BY o_orderpriority""".stripMargin)
        finally s.catalog.dropTempView(v)
      },
      Some(
        """WITH base AS (
          |  SELECT o_orderpriority,
          |    count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
          |    count(*) FILTER (WHERE o_orderstatus <> 'F') AS n_open,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
          |      FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
          |      AS finished_cents
          |  FROM orders GROUP BY ALL)
          |SELECT o_orderpriority, n_finished, n_open, finished_cents,
          |  CAST(rank() OVER w AS BIGINT) AS rk,
          |  CAST(sum(finished_cents) OVER w AS BIGINT) AS running_cents
          |FROM base
          |WINDOW w AS (ORDER BY finished_cents DESC, o_orderpriority)
          |ORDER BY o_orderpriority""".stripMargin)),

    GraftQuery(
      "q_agg_means_panel",
      "The Pythagorean means panel per event type — arithmetic, " +
        "geometric, and harmonic mean of the money cents (AM ≥ GM ≥ HM " +
        "is also asserted by the oracle match itself): the rate-vs-ratio " +
        "averaging primitives (GM for multiplicative growth, HM for " +
        "rates) missing from engine-native aggregates in deterministic " +
        "form. The arithmetic mean is a single division of exact " +
        "BIGINTs; the float Σ w·ln(c) and Σ w/c folds run over the " +
        "VALUE-grain relation (cents domain is bounded — ~1e5 distinct " +
        "values regardless of corpus size) in ONE ordered window (the " +
        "zipf device), so both engines fold identically; both tails are " +
        "single exp/division ops.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val byv = table(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * 100 + 0.5).cast(LongType).as("c"))
          .filter(col("c") > 0) // GM/HM are defined on positives only
          .groupBy(col("event_type"), col("c"))
          .agg(count(lit(1)).as("w"))
        val part = Window.partitionBy("event_type")
        val ord = Window.partitionBy("event_type").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byv
          .withColumn("n", sum(col("w")).over(part))
          .withColumn("sc", sum(col("w") * col("c")).over(part))
          .withColumn("lncum", sum(D(col("w")) * log(D(col("c")))).over(ord))
          .withColumn("invcum", sum(D(col("w")) / D(col("c"))).over(ord))
          .withColumn("rk", row_number().over(
            Window.partitionBy("event_type").orderBy("c")).cast(LongType))
          .withColumn("nv", count(lit(1)).over(part))
          .filter(col("rk") === col("nv"))
          .select(col("event_type"), col("n"),
            round(D(col("sc")) / D(col("n")) / lit(100d), 6).as("am"),
            round(exp(col("lncum") / D(col("n"))) / lit(100d), 6).as("gm"),
            round(D(col("n")) / col("invcum") / lit(100d), 6).as("hm"))
          .orderBy("event_type")
      },
      Some(
        """WITH byv AS (SELECT event_type,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c, count(*) AS w
          |  FROM events
          |  WHERE CAST(floor(value * 100 + 0.5) AS BIGINT) > 0
          |  GROUP BY 1, 2),
          |r AS (SELECT event_type, c, w,
          |    CAST(sum(w) OVER p AS BIGINT) AS n,
          |    CAST(sum(w * c) OVER p AS BIGINT) AS sc,
          |    sum(CAST(w AS DOUBLE) * ln(CAST(c AS DOUBLE)))
          |      OVER (PARTITION BY event_type ORDER BY c
          |        ROWS UNBOUNDED PRECEDING) AS lncum,
          |    sum(CAST(w AS DOUBLE) / CAST(c AS DOUBLE))
          |      OVER (PARTITION BY event_type ORDER BY c
          |        ROWS UNBOUNDED PRECEDING) AS invcum,
          |    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rk,
          |    count(*) OVER p AS nv
          |  FROM byv WINDOW p AS (PARTITION BY event_type))
          |SELECT event_type, n,
          |  round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS am,
          |  round(exp(lncum / CAST(n AS DOUBLE)) / 100.0, 6) AS gm,
          |  round(CAST(n AS DOUBLE) / invcum / 100.0, 6) AS hm
          |FROM r WHERE rk = nv ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_agg_weighted_median",
      "Quantity-weighted median price per return flag — the weighted " +
        "quantile primitive (each price counts by units moved, not by " +
        "line count) that inventory/pricing analytics need where plain " +
        "percentile_cont over-weights small orders. The row grain never " +
        "sorts: prices collapse to the VALUE-grain relation keyed by " +
        "exact integer CENTS (a float grouping key would be a cross-" +
        "engine hash hazard), weights are exact BIGINT unit sums, and " +
        "the median is the smallest value whose doubled cumulative " +
        "weight reaches the total (2·cum ≥ W — integer compare, no /2 " +
        "float). One value-grain window per flag shared by the " +
        "cumulative and total sums; the only float is the final " +
        "cents→price division.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // two-pass bucket decomposition (the q_hist_equidepth discipline,
        // weighted): pass 1 sums weights per deterministic fixed-width
        // cents bucket (c div 8192 — data-independent, so the split can
        // never drift with sampling or partitioning), the tiny bucket-grain
        // window locates the single bucket containing the median and its
        // prior cumulative weight, and pass 2 sorts ONLY that bucket's
        // value-grain slice. The near-unique price domain never shuffles
        // as a 500k-group aggregation and never sorts whole — measured
        // 1.6 s → ~0.5 s at sf0.1, and at 100 TB the sorted slice is
        // 1/|buckets| of the domain per flag instead of all of it.
        val li = table(s, dir, "lineitem")
          .select(col("l_returnflag"),
            floor(col("l_extendedprice") * 100 + 0.5).cast(LongType).as("c"),
            floor(col("l_quantity") + 0.5).cast(LongType).as("q"))
          .withColumn("bk", call_function("div", col("c"), lit(8192L)))
        val ordB = Window.partitionBy("l_returnflag").orderBy("bk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val subc = li.groupBy(col("l_returnflag"), col("bk"))
          .agg(sum(col("q")).as("bw"))
          .withColumn("cumb", sum(col("bw")).over(ordB))
          .withColumn("tw", sum(col("bw")).over(Window.partitionBy("l_returnflag")))
        val tgt = subc.filter(col("cumb") * 2 >= col("tw"))
          .groupBy("l_returnflag").agg(min(col("bk")).as("tbk"))
        val tinfo = subc.join(broadcast(tgt), "l_returnflag")
          .filter(col("bk") === col("tbk"))
          .select(col("l_returnflag"), col("bk").as("tbk"),
            (col("cumb") - col("bw")).as("prior"), col("tw"))
        val ordC = Window.partitionBy("l_returnflag").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li.join(broadcast(tinfo), "l_returnflag")
          .filter(col("bk") === col("tbk"))
          .groupBy(col("l_returnflag"), col("c"), col("prior"), col("tw"))
          .agg(sum(col("q")).as("w"))
          .withColumn("cum", sum(col("w")).over(ordC))
          .filter((col("prior") + col("cum")) * 2 >= col("tw"))
          .groupBy("l_returnflag")
          .agg(max(col("tw")).as("w_total"),
            round(min(col("c")).cast("double") / lit(100d), 2).as("wmedian"))
          .orderBy("l_returnflag")
      },
      Some(
        """WITH byv AS (SELECT l_returnflag,
          |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
          |    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS w
          |  FROM lineitem GROUP BY 1, 2),
          |r AS (SELECT l_returnflag, c, w,
          |    CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY c
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          |    CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
          |  FROM byv)
          |SELECT l_returnflag, max(tw) AS w_total,
          |  round(CAST(min(c) AS DOUBLE) / 100.0, 2) AS wmedian
          |FROM r WHERE cum * 2 >= tw
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
