package graft.operators

import graft.{Exact, GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, LongType, TimestampType}

/** Join families (SURVEY.md §2.3): broadcast, sort-merge, multiway, all outer
  * variants, semi/anti, theta, self, and the as-of join.
  *
  * Scale notes (100 TB design intent, validated via .explain on local data):
  *  - Dimension joins (nation/region/part-sized sides) carry an explicit
  *    `broadcast()` hint → BroadcastHashJoin, no shuffle of the fact table.
  *  - Fact-fact joins (lineitem⋈orders) are left to Catalyst/AQE → sort-merge
  *    or shuffled-hash on the join key; both sides shuffle-partition on the key.
  *  - Semi/anti joins ship only the key column of the build side.
  *  - The as-of join avoids both the O(n·m) correlated form and join-side
  *    inflation: union both relations on (user, time) and take a running max
  *    in one window pass — a single shuffle, O(n+m) rows throughout.
  */
object Joins {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_join_broadcast",
      "Equi inner join against a 25-row dim — broadcast() hint → BroadcastHashJoin.",
      (s, dir) =>
        table(s, dir, "customer")
          .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("n_name")),
      Some(
        "SELECT n_name, count(*) AS n FROM customer JOIN nation ON c_nationkey = n_nationkey " +
          "GROUP BY n_name ORDER BY n DESC, n_name")),

    GraftQuery(
      "q_join_large",
      "Fact-fact equi join (lineitem⋈orders) with a shuffle_hash hint on the smaller " +
        "side: orders is structurally ~4× smaller, so a per-partition hash build beats " +
        "sorting both sides (measured 1.5× at bench scale). Cluster caveat: SHJ's " +
        "build-side HashedRelation does NOT spill — the hint presumes partition counts " +
        "sized so each orders partition fits execution memory; when that isn't assured, " +
        "drop the hint and let AQE/sort-merge decide (sorts spill). Measured alternative " +
        "(round 3): pre-summing lineitem revenue per l_orderkey in micro-unit LONGs " +
        "below the join (exact — integer addition is associative) compresses the " +
        "shuffled fact ~4:1 but its 150k-group hash agg cost MORE than the shuffle it " +
        "saved here (~0.79 s vs ~0.61 s median); at 100 TB, where the exchange dominates " +
        "and Catalyst still has no partial-agg-through-join rewrite, that manual rewrite " +
        "plus Exact.moneyFinish over the partial sums is the shape to ship.",
      (s, dir) =>
        table(s, dir, "lineitem")
          .join(table(s, dir, "orders").hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(Exact.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .orderBy("o_orderpriority"),
      Some(
        "SELECT o_orderpriority, " + Exact.moneySumSql("l_extendedprice*(1-l_discount)") + " AS rev " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    GraftQuery(
      "q_join_multiway",
      "4-way join chain orders⋈customer⋈nation⋈region — dims broadcast, Catalyst reorders.",
      (s, dir) =>
        table(s, dir, "orders")
          .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(Exact.moneySum(col("o_totalprice")).as("tot"))
          .orderBy("r_name", "n_name"),
      Some(
        "SELECT r_name, n_name, " + Exact.moneySumSql("o_totalprice") + " AS tot " +
          "FROM orders JOIN customer ON o_custkey=c_custkey " +
          "JOIN nation ON c_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey " +
          "GROUP BY r_name, n_name ORDER BY r_name, n_name")),

    GraftQuery(
      "q_join_left_outer",
      "Left outer join + count(col) — exact outer-join null semantics (count skips nulls).",
      (s, dir) =>
        table(s, dir, "customer")
          .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer " +
          "LEFT JOIN orders ON c_custkey=o_custkey GROUP BY c_custkey ORDER BY c_custkey")),

    GraftQuery(
      "q_join_full_outer",
      "Full outer join on duplicated keys — sort-merge (broadcast invalid for full outer).",
      (s, dir) =>
        table(s, dir, "supplier")
          .select(col("s_nationkey").as("sk"))
          .join(
            table(s, dir, "customer").select(col("c_nationkey").as("ck")),
            col("sk") === col("ck"),
            "full")
          .agg(count(lit(1)).as("n")),
      Some(
        "SELECT count(*) AS n FROM (SELECT s_nationkey AS k FROM supplier) s " +
          "FULL OUTER JOIN (SELECT c_nationkey AS k FROM customer) c ON s.k = c.k")),

    GraftQuery(
      "q_join_semi",
      "Left semi join (IN subquery) — only the key column of the build side ships.",
      (s, dir) =>
        table(s, dir, "customer")
          .join(
            table(s, dir, "orders").filter(col("o_totalprice") > 300000).select("o_custkey"),
            col("c_custkey") === col("o_custkey"),
            "left_semi")
          .agg(count(lit(1)).as("n")),
      Some(
        "SELECT count(*) AS n FROM customer WHERE c_custkey IN " +
          "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000)")),

    GraftQuery(
      "q_join_anti",
      "Left anti join (NOT EXISTS).",
      (s, dir) =>
        table(s, dir, "customer")
          .join(
            table(s, dir, "orders").select("o_custkey"),
            col("c_custkey") === col("o_custkey"),
            "left_anti")
          .agg(count(lit(1)).as("n")),
      Some(
        "SELECT count(*) AS n FROM customer WHERE NOT EXISTS " +
          "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)")),

    GraftQuery(
      "q_join_range_theta",
      "Equi + non-equi conjunct: equi part hashes (broadcast dim), theta part filters post-match.",
      (s, dir) => {
        val p = table(s, dir, "part")
        val l = table(s, dir, "lineitem")
        l.join(broadcast(p), p("p_partkey") === l("l_partkey") && l("l_quantity") > p("p_size"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"))
          .orderBy("p_brand")
      },
      Some(
        "SELECT p_brand, count(*) AS n FROM part p JOIN lineitem l " +
          "ON p.p_partkey = l.l_partkey AND l.l_quantity > p.p_size " +
          "GROUP BY p_brand ORDER BY p_brand")),

    GraftQuery(
      "q_join_self",
      "Self-join with inequality — same-customer same-day order pairs.",
      (s, dir) => {
        val o1 = table(s, dir, "orders").as("o1")
        val o2 = table(s, dir, "orders").as("o2")
        o1.join(
            o2,
            col("o1.o_custkey") === col("o2.o_custkey") &&
              col("o1.o_orderkey") < col("o2.o_orderkey") &&
              col("o1.o_orderdate") === col("o2.o_orderdate"))
          .agg(count(lit(1)).as("n"))
      },
      Some(
        "SELECT count(*) AS n FROM orders o1 JOIN orders o2 ON o1.o_custkey = o2.o_custkey " +
          "AND o1.o_orderkey < o2.o_orderkey AND o1.o_orderdate = o2.o_orderdate")),

    GraftQuery(
      "q_join_cross",
      "Explicit cross join of two dims reduced to the pair count — the deliberate " +
        "cartesian surface (every other cartesian in the engine is a broadcast of a " +
        "1-row side).",
      (s, dir) =>
        table(s, dir, "region")
          .crossJoin(table(s, dir, "nation"))
          .agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM region CROSS JOIN nation")),

    GraftQuery(
      "q_scalar_subquery",
      "Uncorrelated scalar subquery in the projection (per-row compare against a " +
        "global aggregate) — Catalyst plans it as a single-row broadcast.",
      (s, dir) => {
        val view = "graft_ssq_" + java.util.UUID.randomUUID().toString.replace("-", "")
        table(s, dir, "orders").createOrReplaceTempView(view)
        try s.sql(
          s"SELECT o_orderkey, o_totalprice > (SELECT avg(o_totalprice) FROM $view) AS above_avg " +
            s"FROM $view ORDER BY o_orderkey LIMIT 1000")
        finally s.catalog.dropTempView(view)
      },
      Some(
        "SELECT o_orderkey, o_totalprice > (SELECT avg(o_totalprice) FROM orders) AS above_avg " +
          "FROM orders ORDER BY o_orderkey LIMIT 1000")),

    GraftQuery(
      "q_exists_correlated",
      "Correlated EXISTS / NOT EXISTS subqueries — Catalyst decorrelates both " +
        "into semi/anti joins on the correlation key (no per-row re-execution; " +
        "verify with .explain: LeftSemi + LeftAnti, both hash-partitionable).",
      (s, dir) => {
        val tag = java.util.UUID.randomUUID().toString.replace("-", "")
        val cv = s"graft_exc_$tag"
        val ov = s"graft_exo_$tag"
        table(s, dir, "customer").createOrReplaceTempView(cv)
        table(s, dir, "orders").createOrReplaceTempView(ov)
        try s.sql(
          s"""SELECT c_custkey, c_mktsegment FROM $cv c
             |WHERE EXISTS (SELECT 1 FROM $ov o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
             |  AND NOT EXISTS (SELECT 1 FROM $ov o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             |ORDER BY c_custkey LIMIT 1000""".stripMargin)
        finally {
          s.catalog.dropTempView(cv)
          s.catalog.dropTempView(ov)
        }
      },
      Some(
        """SELECT c_custkey, c_mktsegment FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          |  AND NOT EXISTS (SELECT 1 FROM orders o
          |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          |ORDER BY c_custkey LIMIT 1000""".stripMargin)),

    GraftQuery(
      "q_ts_asof_join",
      "As-of join: latest order date ≤ event ts per event. No native Spark as-of; " +
        "implemented as the merge shape: union both relations on (user, time), one " +
        "shuffle+sort per user, then a running max of the order date — each event row " +
        "reads the latest order at or before it. O(n+m) rows end-to-end, unlike the " +
        "join-then-max form which inflates to (event × all prior orders of that user) " +
        "before aggregating (r1 bench: 3.6× DuckDB). Orders sort before events at " +
        "equal timestamps (kind 0 < 1) so the ≤ bound stays inclusive.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(
            col("user_id"),
            col("ts").as("t"),
            lit(1).as("kind"),
            col("event_id"),
            lit(null).cast(DateType).as("odate"))
        val o = table(s, dir, "orders")
          .select(
            col("o_custkey").as("user_id"),
            col("o_orderdate").cast(TimestampType).as("t"),
            lit(0).as("kind"),
            lit(null).cast(LongType).as("event_id"),
            col("o_orderdate").as("odate"))
        val w = Window.partitionBy("user_id").orderBy(col("t"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.unionByName(o)
          .withColumn("last_order", max(col("odate")).over(w))
          .where(col("kind") === 1)
          .select("event_id", "last_order")
          .orderBy("event_id")
          .limit(1000)
      },
      Some(
        "SELECT e.event_id, (SELECT max(o.o_orderdate) FROM orders o " +
          "WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS last_order " +
          "FROM events e ORDER BY e.event_id LIMIT 1000")),

    GraftQuery(
      "q_ts_asof_forward",
      "FORWARD as-of join with a tolerance — the other half of the merge_asof " +
        "surface, as click-to-purchase attribution: for every click, the " +
        "earliest purchase by the same user at-or-after it, kept only when " +
        "within 24 hours. Same O(n+m) union-window shape as q_ts_asof_join with " +
        "the frame flipped (running MIN over current-to-unbounded-FOLLOWING); " +
        "clicks sort before purchases at equal timestamps (kind 0 < 1) so the " +
        "≥ bound stays inclusive. The tolerance gate compares exact epoch " +
        "seconds (ts.cast(double) ≡ DuckDB epoch, sub-second precision).",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("t"), lit(0).as("kind"),
            col("event_id"), lit(null).cast(ev.schema("ts").dataType).as("pts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("t"), lit(1).as("kind"),
            lit(null).cast(LongType).as("event_id"), col("ts").as("pts"))
        val w = Window.partitionBy("user_id").orderBy(col("t"), col("kind"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        clicks.unionByName(purchases)
          .withColumn("next_raw", min(col("pts")).over(w))
          .where(col("kind") === 0)
          .select(col("event_id"),
            when(graft.Ts.epochSec(col("next_raw")) - graft.Ts.epochSec(col("t")) <= 86400.0,
              col("next_raw")).as("next_purchase"))
          .orderBy("event_id")
          .limit(1000)
      },
      Some(
        """SELECT event_id, CASE WHEN epoch(np) - epoch(ts) <= 86400.0 THEN np END AS next_purchase
          |FROM (SELECT c.event_id, CAST(c.ts AS TIMESTAMP) AS ts,
          |    (SELECT min(CAST(p.ts AS TIMESTAMP)) FROM events p
          |     WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
          |       AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)) AS np
          |  FROM events c WHERE c.event_type = 'click')
          |ORDER BY event_id LIMIT 1000""".stripMargin)),

    GraftQuery(
      "q_ts_asof_nearest",
      "NEAREST as-of join — the third merge_asof direction: for every click, " +
        "the same-user purchase closest in time on EITHER side, ties to the " +
        "earlier one. BOTH direction legs ride ONE union relation and one " +
        "(user)-keyed exchange+sort: a backward running max and a forward " +
        "running min are two frames over the same window spec, so Spark " +
        "plans a single Window operator — O(n+m), never a pair join. " +
        "Purchases sort before clicks at equal timestamps (kind 0 < 1): the " +
        "backward leg is then ts-inclusive and the forward leg strictly " +
        "after — an equal-ts purchase resolves through the backward leg " +
        "with distance zero, which the tie rule prefers anyway. The " +
        "distance comparison is exact epoch-double subtraction in identical " +
        "order on both engines.",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("t"), lit(1).as("kind"),
            col("event_id"), lit(null).cast(ev.schema("ts").dataType).as("pts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("t"), lit(0).as("kind"),
            lit(null).cast(LongType).as("event_id"), col("ts").as("pts"))
        val spec = Window.partitionBy("user_id").orderBy(col("t"), col("kind"))
        val wB = spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wF = spec.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        clicks.unionByName(purchases)
          .withColumn("prev_p", max(col("pts")).over(wB))
          .withColumn("next_p", min(col("pts")).over(wF))
          .where(col("kind") === 1)
          .select(col("event_id"),
            when(col("prev_p").isNull, col("next_p"))
              .when(col("next_p").isNull, col("prev_p"))
              .when(graft.Ts.epochSec(col("t")) - graft.Ts.epochSec(col("prev_p")) <=
                graft.Ts.epochSec(col("next_p")) - graft.Ts.epochSec(col("t")), col("prev_p"))
              .otherwise(col("next_p")).as("nearest_purchase"))
          .orderBy("event_id")
          .limit(1000)
      },
      Some(
        """SELECT event_id,
          |  CASE WHEN prev_p IS NULL THEN next_p
          |       WHEN next_p IS NULL THEN prev_p
          |       WHEN epoch(ts) - epoch(prev_p) <= epoch(next_p) - epoch(ts) THEN prev_p
          |       ELSE next_p END AS nearest_purchase
          |FROM (SELECT c.event_id, CAST(c.ts AS TIMESTAMP) AS ts,
          |    (SELECT max(CAST(p.ts AS TIMESTAMP)) FROM events p
          |     WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
          |       AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP)) AS prev_p,
          |    (SELECT min(CAST(p.ts AS TIMESTAMP)) FROM events p
          |     WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
          |       AND CAST(p.ts AS TIMESTAMP) > CAST(c.ts AS TIMESTAMP)) AS next_p
          |  FROM events c WHERE c.event_type = 'click')
          |ORDER BY event_id LIMIT 1000""".stripMargin)),

    GraftQuery(
      "q_join_band",
      "Pure band (interval-distance) join with NO equi key: for each " +
        "purchase, how many clicks — by ANY user — landed within ±60 s. A " +
        "naive |Δt| ≤ 60 predicate gives Catalyst nothing to hash on and " +
        "plans a BroadcastNestedLoopJoin: quadratic, and the one join shape " +
        "that cannot survive 100 TB. The Spark-native answer is BUCKET " +
        "EXPANSION: quantize time into band-width buckets, explode the " +
        "smaller side to its bucket and both neighbors (width = band ⇒ " +
        "every qualifying pair shares a bucket, and exactly one of the " +
        "three), equi-join on the synthesized bucket key, and re-check the " +
        "exact predicate post-match. One 3× fan-out of the slim side buys a " +
        "shuffled hash join that partitions like any other equi-join. The " +
        "DuckDB twin hands the same predicate to its IEJoin. Epoch doubles " +
        "are bitwise-identical across engines, so the ±60.0 boundary is " +
        "exact; the bucket key never reaches the output.",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(graft.Ts.epochSec(col("ts")).as("ct"))
          .withColumn("b", floor(col("ct") / 60d).cast(LongType))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), graft.Ts.epochSec(col("ts")).as("pt"))
          .withColumn("b0", floor(col("pt") / 60d).cast(LongType))
          .select(col("event_id"), col("pt"),
            explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("b"))
        purchases.join(clicks, "b")
          .where(abs(col("ct") - col("pt")) <= 60d)
          .groupBy("event_id").agg(count(lit(1)).as("n_near"))
          .orderBy(col("n_near").desc, col("event_id"))
          .limit(100)
      },
      Some(
        """SELECT p.event_id, count(*) AS n_near
          |FROM events p JOIN events c
          |  ON p.event_type = 'purchase' AND c.event_type = 'click'
          | AND abs(epoch(c.ts) - epoch(p.ts)) <= 60.0
          |GROUP BY 1 ORDER BY n_near DESC, p.event_id LIMIT 100""".stripMargin)),

    GraftQuery(
      "q_join_salted",
      "SALTED fact-dim join under engineered 70% single-key skew — the join " +
        "half of the Skew module's salted-aggregation story: a plain " +
        "shuffle join on this key sends 70% of the fact through ONE reducer " +
        "(the straggler that kills a 1000-executor job). The fact side " +
        "salts each row into 16 sub-keys with a CONTENT hash of the row's " +
        "primary key (the Skew.scala discipline — a rand()/partition-id " +
        "salt re-rolls on task retry and silently corrupts the join), the " +
        "dim side replicates ×16 via explode(sequence), and the join keys " +
        "on (k, salt): the hot key's rows spread across 16 reducers. " +
        "SHUFFLE_HASH is hinted deliberately — at bench scale AQE would " +
        "broadcast the 16k-row dim and no skew exists to demonstrate; the " +
        "hint pins the exchange-on-(k,salt) shape the technique exists for " +
        "(dims beyond broadcast range), checked in PlanShapeSpec. The " +
        "oracle runs the plain unsalted join: same rows is the proof the " +
        "salt never changes the answer.",
      (s, dir) => {
        val fact = table(s, dir, "lineitem")
          .select(
            when(col("l_orderkey") % 10 < 7, 0L)
              .otherwise(col("l_orderkey") % 1000).as("k"),
            col("l_quantity"),
            pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(16)).as("salt"))
        val dim = s.range(0, 1000).select(
            col("id").as("k"),
            substring(md5(col("id").cast("string")), 1, 1).as("attr"))
          .withColumn("salt", explode(sequence(lit(0L), lit(15L))))
        fact.join(dim.hint("SHUFFLE_HASH"), Seq("k", "salt"))
          .groupBy("attr")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("qty"))
          .orderBy("attr")
      },
      Some(
        """WITH f AS (SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
          |      ELSE l_orderkey % 1000 END AS k, l_quantity FROM lineitem),
          |d AS (SELECT range AS k, substr(md5(CAST(range AS VARCHAR)), 1, 1) AS attr
          |  FROM range(0, 1000))
          |SELECT attr, count(*) AS n,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          |FROM f JOIN d USING (k)
          |GROUP BY attr ORDER BY attr""".stripMargin)),

    GraftQuery(
      "q_merge_upsert",
      "MERGE INTO semantics (the warehouse upsert Spark core lacks and " +
        "Delta/Iceberg bolt on) expressed as its relational core: a " +
        "time-bounded CDC batch (latest order per customer since " +
        "2001-06-01, latest = max(struct(date, key, price)) — the argmax " +
        "discipline) full-outer-joined with the target dim; matched keys " +
        "become 'update' rows taking the new balance, source-only keys " +
        "'insert', target-only keys 'keep' their old value. At 100 TB both " +
        "sides hash-partition on the merge key into one sort-merge " +
        "exchange — the CDC batch is usually the small side, but a " +
        "full-outer join cannot broadcast, so the co-partitioned shuffle " +
        "IS the right plan (with bucketed targets it degenerates to a " +
        "zero-shuffle merge-on-read). Output: per-action row counts and " +
        "the exact money sum of the post-merge balances (Exact.moneySum, " +
        "partition-order-insensitive).",
      (s, dir) => {
        val target = table(s, dir, "customer")
          .filter(col("c_custkey") % 4 =!= 0)
          .select(col("c_custkey"), col("c_acctbal"))
        val updates = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2001-06-01").cast(TimestampType))
          .groupBy(col("o_custkey").as("u_custkey"))
          .agg(max(struct(col("o_orderdate"), col("o_orderkey"), col("o_totalprice")))
            .getField("o_totalprice").as("new_bal"))
        target.join(updates, col("c_custkey") === col("u_custkey"), "full_outer")
          .select(
            when(col("c_custkey").isNotNull && col("u_custkey").isNotNull, "update")
              .when(col("c_custkey").isNull, "insert")
              .otherwise("keep").as("action"),
            coalesce(col("new_bal"), col("c_acctbal")).as("final_bal"))
          .groupBy("action")
          .agg(count(lit(1)).as("n_rows"), Exact.moneySum(col("final_bal")).as("sum_bal"))
          .orderBy("action")
      },
      Some(
        """WITH target AS (
          |  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 4 != 0),
          |updates AS (
          |  SELECT o_custkey AS u_custkey,
          |    (max({'d': o_orderdate, 'k': o_orderkey, 'p': o_totalprice})).p AS new_bal
          |  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01'
          |  GROUP BY o_custkey),
          |merged AS (
          |  SELECT CASE WHEN t.c_custkey IS NOT NULL AND u.u_custkey IS NOT NULL THEN 'update'
          |              WHEN t.c_custkey IS NULL THEN 'insert' ELSE 'keep' END AS action,
          |         COALESCE(u.new_bal, t.c_acctbal) AS final_bal
          |  FROM target t FULL OUTER JOIN updates u ON t.c_custkey = u.u_custkey)
          |SELECT action, count(*) AS n_rows, """.stripMargin +
          Exact.moneySumSql("final_bal") +
          """ AS sum_bal
          |FROM merged GROUP BY action ORDER BY action""".stripMargin)),

    GraftQuery(
      "q_join_interval_overlap",
      "Interval-overlap join (a.lo <= b.hi AND b.lo <= a.hi) between two " +
        "30-minute interval sets (click vs error events, [ts, ts+1800s]) — " +
        "the second inequality-join family next to q_join_band's point " +
        "predicate. Spark plans a pure inequality join as a broadcast " +
        "nested loop, so the rewrite is the partition-based spatial-join " +
        "discipline: quantize to bucket width = max interval length (every " +
        "interval then spans exactly 2 buckets), explode both sides to " +
        "their buckets, EQUI-join on bucket, re-check the exact predicate, " +
        "and count each pair exactly once in its canonical bucket — the " +
        "bucket of max(a.lo, b.lo), which overlap guarantees both " +
        "intervals occupy (no dedup shuffle, a theorem not a distinct). " +
        "Per-day overlap-pair counts; the oracle is DuckDB's native IEJoin " +
        "over the raw theta predicate, so the gate proves the bucket " +
        "rewrite exhaustive AND duplicate-free.",
      (s, dir) => {
        val w = 1800L
        val ev = table(s, dir, "events")
          .select(col("event_type"), graft.Ts.epochSec(col("ts")).as("lo"))
        def side(t: String, p: String) = {
          val lo = col(p + "_lo")
          ev.filter(col("event_type") === t)
            .select(col("lo").as(p + "_lo"), (col("lo") + lit(w.toDouble)).as(p + "_hi"))
            .withColumn(p + "_bkt",
              explode(array(floor(lo / w).cast(LongType), floor(lo / w).cast(LongType) + lit(1L))))
        }
        val a = side("click", "a")
        val b = side("error", "b")
        a.join(b,
            col("a_bkt") === col("b_bkt") &&
              col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi") &&
              col("a_bkt") === floor(greatest(col("a_lo"), col("b_lo")) / w).cast(LongType))
          .select(to_date(timestamp_seconds(greatest(col("a_lo"), col("b_lo")))).as("day"))
          .groupBy("day")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("day")
      },
      Some(
        """WITH a AS (SELECT epoch(ts) AS lo, epoch(ts)+1800 AS hi FROM events WHERE event_type='click'),
          |b AS (SELECT epoch(ts) AS lo, epoch(ts)+1800 AS hi FROM events WHERE event_type='error')
          |SELECT CAST(to_timestamp(greatest(a.lo, b.lo)) AS DATE) AS day, count(*) AS n_pairs
          |FROM a JOIN b ON a.lo <= b.hi AND b.lo <= a.hi
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_ts_feature_join",
      "Point-in-time feature join — the feature-store primitive (attach " +
        "each label event's feature values AS OF its own timestamp, never " +
        "after — the leakage-safe join every ML training pipeline needs): " +
        "for every purchase, the same user's most recent click value and " +
        "most recent view value at-or-before the purchase. BOTH features " +
        "resolve in ONE union-window pass: label and feature streams " +
        "union on (user, t, kind, event_id), one shuffle+sort per user, " +
        "and one ignore-nulls running last() per feature column — N " +
        "feature streams cost N window columns over the SAME sort, not N " +
        "sequential as-of joins (each with its own exchange) and not the " +
        "join-then-argmax form that inflates to event × prior-history " +
        "before collapsing. Ties break (t, kind, event_id) with features " +
        "sorting before labels, so an exactly-coincident feature is " +
        "visible (≤, not <) and equal-timestamp features resolve to the " +
        "highest event_id — the same total order the oracle's struct-" +
        "argmax encodes. Values in exact integer cents.",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val cents = floor(col("value") * 100 + 0.5).cast(LongType)
        val nullL = lit(null).cast(LongType)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("t"), lit(0).as("kind"),
            col("event_id"), cents.as("cv"), nullL.as("vv"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("t"), lit(1).as("kind"),
            col("event_id"), nullL.as("cv"), cents.as("vv"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("t"), lit(2).as("kind"),
            col("event_id"), nullL.as("cv"), nullL.as("vv"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("t"), col("kind"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionByName(views).unionByName(purchases)
          .withColumn("lc", last(col("cv"), ignoreNulls = true).over(w))
          .withColumn("lv", last(col("vv"), ignoreNulls = true).over(w))
          .where(col("kind") === 2)
          .select(col("event_id"), col("lc").as("last_click_cents"),
            col("lv").as("last_view_cents"))
          .orderBy("event_id")
          .limit(1000)
      },
      Some(
        """WITH p AS (SELECT event_id, user_id, ts FROM events
          |  WHERE event_type = 'purchase' ORDER BY event_id LIMIT 1000),
          |c AS (SELECT user_id, ts, event_id,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events WHERE event_type = 'click'),
          |v AS (SELECT user_id, ts, event_id,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events WHERE event_type = 'view'),
          |lc AS (SELECT p.event_id, (max({'t': c.ts, 'i': c.event_id, 'x': c.cents})).x AS f
          |  FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
          |  GROUP BY p.event_id),
          |lv AS (SELECT p.event_id, (max({'t': v.ts, 'i': v.event_id, 'x': v.cents})).x AS f
          |  FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
          |  GROUP BY p.event_id)
          |SELECT p.event_id, lc.f AS last_click_cents, lv.f AS last_view_cents
          |FROM p LEFT JOIN lc ON p.event_id = lc.event_id
          |       LEFT JOIN lv ON p.event_id = lv.event_id
          |ORDER BY p.event_id""".stripMargin)),

    GraftQuery(
      "q_assoc_lift",
      "Market-basket association mining: brand pairs that co-occur in " +
        "order baskets, scored by lift = N·n12/(n1·n2) and support-" +
        "pruned — the co-occurrence analysis recommendation and " +
        "curation pipelines run on (domain, topic) baskets. The scale " +
        "discipline is all about bounding the pair fan-out: baskets " +
        "dedup to DISTINCT (order, brand) map-side BEFORE the self-join " +
        "(so a 100-line order contributes each brand once), the pair " +
        "space is vocabulary²-bounded (25 brands → ≤300 pairs however " +
        "large the fact table), the dimension lookup broadcasts, and " +
        "the margin counts broadcast back onto the support-filtered " +
        "pairs. Counts are exact BIGINTs; lift is one (a·b)/(c·d) " +
        "double tree on identical operands; top-20 by ROUNDED lift " +
        "with full (b1, b2) tie-breaks keeps the cut deterministic.",
      (s, dir) => {
        import org.apache.spark.sql.types.{DoubleType, StringType}
        // ONE order-keyed shuffle builds sorted per-order basket arrays
        // (collect_set dedups in the same aggregation the old form spent a
        // distinct exchange on). Pair generation is MAP-SIDE — each basket
        // explodes its own sorted 2-combinations (b1 < b2 by array order),
        // bounded by basket size, never a keyed self-join that re-shuffles
        // the fact relation twice — and the SAME explode emits the margin
        // and total MARKER rows ('m' per brand, 't' per basket), so pairs,
        // margins, and total come out of ONE slim aggregation in ONE pass
        // over the baskets. At 100 TB the wide ops are the basket shuffle
        // and the vocabulary²-bounded marker agg — nothing downstream of
        // the aggregate grows with the fact table.
        //
        // r15: the ≤|vocab|²+|vocab|+1-row aggregate (~326 rows at 25
        // brands) is COLLECTED once instead of localCheckpoint'd for three
        // filter-consumers — the r14 shape paid the checkpoint job plus
        // three consumer-side broadcast-build jobs (6 jobs / 9 stages
        // total) just to re-read a driver-sized relation. The margin/total
        // lookups are exact-integer map-gets (inner-join semantics via
        // flatMap-on-Option); the float work — lift, round, the top-20
        // order — stays in Spark expressions over the local relation, so
        // cross-engine numeric semantics ride the same codepath as before
        // (review class 15: never hand-roll round()). The collect is
        // vocabulary²-bounded however large the fact table — the same
        // boundedness argument the broadcast margins already made.
        //
        // r15 census (sf0.1, graft.AssocProbe SEVEN-shape head-to-head,
        // warm): cpus=32 — collect 0.988 s < marker 1.009 < marker+
        // coalesce(1) 1.028 < no-checkpoint ReuseExchange 1.177 < old
        // 3-pass 1.254 < fused-margins 1.329; cpus=4 — collect 1.179 <
        // old 1.336 < marker 1.421 ≈ marker+c1 1.425 < nock 1.459 <
        // fused 1.626. JobCensus (eager path): 6 → 3 jobs. The r14
        // verdict's coalesce(1) candidate measured as a wash — the cost
        // was never the checkpoint partition count but the three
        // consumer jobs, which the collect removes. The basket chain
        // ALONE (scan + broadcast join + 147k-key collect_set shuffle)
        // measures ~0.6-0.7 s — the irreducible distributed part.
        val baskets = table(s, dir, "lineitem")
          .join(broadcast(table(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
          .groupBy("ok")
          .agg(sort_array(collect_set(col("b"))).as("bs"))
        val nullS = lit(null).cast(StringType)
        val pairMarks = flatten(transform(col("bs"), (x, i) => transform(
          slice(col("bs"), i + lit(2), size(col("bs"))),
          y => struct(lit("p").as("k"), x.as("b1"), y.as("b2")))))
        val marginMarks = transform(col("bs"),
          b => struct(lit("m").as("k"), b.as("b1"), nullS.as("b2")))
        val totMark = array(struct(lit("t").as("k"), nullS.as("b1"), nullS.as("b2")))
        val aggRows = baskets
          .select(explode(concat(pairMarks, marginMarks, totMark)).as("e"))
          .groupBy(col("e.k").as("k"), col("e.b1").as("b1"), col("e.b2").as("b2"))
          .agg(count(lit(1)).as("n"))
          .collect() // tiny: ≤ pairs + brands + 1 rows, bounded by |vocab|²
        val margin = aggRows.iterator.filter(_.getString(0) == "m")
          .map(r => r.getString(1) -> r.getLong(3)).toMap
        val nnOpt = aggRows.iterator.filter(_.getString(0) == "t")
          .map(_.getLong(3)).nextOption() // None ⇔ zero baskets ⇒ zero pairs
        val pairs = aggRows.iterator
          .filter(r => r.getString(0) == "p" && r.getLong(3) >= 20L)
          .flatMap { r => // flatMap-on-Option = the old INNER-join semantics
            for { n1 <- margin.get(r.getString(1))
                  n2 <- margin.get(r.getString(2))
                  nn <- nnOpt }
              yield (r.getString(1), r.getString(2), r.getLong(3), n1, n2, nn)
          }.toSeq
        import s.implicits._
        pairs.toDF("b1", "b2", "n12", "n1", "n2", "nn")
          .select(col("b1"), col("b2"), col("n12"), col("n1"), col("n2"),
            round((col("n12").cast(DoubleType) * col("nn").cast(DoubleType))
              / (col("n1").cast(DoubleType) * col("n2").cast(DoubleType)), 6)
              .as("lift"))
          .orderBy(col("lift").desc, col("b1"), col("b2"))
          .limit(20)
      },
      Some(
        """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
          |    FROM lineitem JOIN part ON l_partkey = p_partkey),
          |m AS (SELECT b, count(*) AS nb FROM ob GROUP BY b),
          |t AS (SELECT count(DISTINCT ok) AS nn FROM ob),
          |p AS (SELECT a.b AS b1, x.b AS b2, count(*) AS n12
          |  FROM ob a JOIN ob x ON a.ok = x.ok AND a.b < x.b
          |  GROUP BY 1, 2 HAVING count(*) >= 20)
          |SELECT p.b1, p.b2, p.n12, r1.nb AS n1, r2.nb AS n2,
          |  round((CAST(p.n12 AS DOUBLE) * CAST(t.nn AS DOUBLE))
          |    / (CAST(r1.nb AS DOUBLE) * CAST(r2.nb AS DOUBLE)), 6) AS lift
          |FROM p JOIN m r1 ON p.b1 = r1.b JOIN m r2 ON p.b2 = r2.b, t
          |ORDER BY lift DESC, b1, b2 LIMIT 20""".stripMargin)),

    GraftQuery(
      "q_join_lateral",
      "LATERAL correlated derived-table join through the SQL front door " +
        "— the per-row-subquery surface (top-N-per-key spelled as the " +
        "outer query's own subquery) that ports from every warehouse " +
        "dialect: for each nation, the top-2 orders by exact cents via a " +
        "correlated ORDER BY … LIMIT 2 lateral. Catalyst decorrelates " +
        "the lateral into a ranked window join (DecorrelateInnerQuery + " +
        "RewriteLateralSubquery), so the executed plan is the same " +
        "shuffle-once-per-key shape as q_win_rank — the gate proves the " +
        "SQL surface AND that the decorrelation is semantics-preserving " +
        "against an engine that executes LATERAL natively.",
      (s, dir) => {
        val vn = "graft_lat_n_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val vo = "graft_lat_o_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val vc = "graft_lat_c_" + java.util.UUID.randomUUID().toString.replace("-", "")
        table(s, dir, "nation").createOrReplaceTempView(vn)
        table(s, dir, "orders").createOrReplaceTempView(vo)
        table(s, dir, "customer").createOrReplaceTempView(vc)
        try s.sql(
          s"""SELECT n.n_name, l.o_orderkey, l.cents
             |FROM $vn n, LATERAL (
             |  SELECT o_orderkey,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             |  FROM $vo JOIN $vc ON o_custkey = c_custkey
             |  WHERE c_nationkey = n.n_nationkey
             |  ORDER BY cents DESC, o_orderkey LIMIT 2) l
             |ORDER BY n.n_name, l.cents DESC, l.o_orderkey""".stripMargin)
        finally {
          s.catalog.dropTempView(vn); s.catalog.dropTempView(vo)
          s.catalog.dropTempView(vc)
        }
      },
      Some(
        """SELECT n.n_name, l.o_orderkey, l.cents
          |FROM nation n, LATERAL (
          |  SELECT o_orderkey,
          |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  WHERE c_nationkey = n.n_nationkey
          |  ORDER BY cents DESC, o_orderkey LIMIT 2) l
          |ORDER BY n.n_name, l.cents DESC, l.o_orderkey""".stripMargin)),

    GraftQuery(
      "q_join_null_anti",
      "NOT IN with a nullable subquery — the null-aware anti join, the " +
        "one join family whose semantics silently invert under NULLs: " +
        "one NULL in the subquery makes every NOT IN row false, so the " +
        "same query shape returns 'customers without urgent orders' on a " +
        "null-free list and ZERO rows on a nullable one. Both branches " +
        "run here (clean count + nullable count, which must be 0), " +
        "expressed as SQL TEXT so Spark actually plans its null-aware " +
        "anti join (a broadcast NAAJ on the build side's key column — " +
        "only keys ship, never payloads) rather than a DataFrame " +
        "isin-rewrite. The oracle runs the identical semantics trap.",
      (s, dir) => {
        val vc = "graft_naaj_c_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val vo = "graft_naaj_o_" + java.util.UUID.randomUUID().toString.replace("-", "")
        table(s, dir, "customer").createOrReplaceTempView(vc)
        table(s, dir, "orders").createOrReplaceTempView(vo)
        try s.sql(
          s"""SELECT
             |  (SELECT count(*) FROM $vc WHERE c_custkey NOT IN
             |    (SELECT o_custkey FROM $vo WHERE o_orderpriority = '1-URGENT'))
             |    AS n_clean,
             |  (SELECT count(*) FROM $vc WHERE c_custkey NOT IN
             |    (SELECT CASE WHEN o_orderpriority = '1-URGENT'
             |       THEN o_custkey END FROM $vo))
             |    AS n_nullable""".stripMargin)
        finally {
          s.catalog.dropTempView(vc); s.catalog.dropTempView(vo)
        }
      },
      Some(
        """SELECT
          |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN
          |    (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'))
          |    AS n_clean,
          |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN
          |    (SELECT CASE WHEN o_orderpriority = '1-URGENT'
          |       THEN o_custkey END FROM orders))
          |    AS n_nullable""".stripMargin))
  )
}
