package graft.operators

import graft.{Exact, GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Warehouse-maintenance patterns (SURVEY.md §2 appendix, round-8 batch):
  * the table-evolution side of the engine next to [[Joins]]' MERGE upsert —
  * SCD Type 2 interval construction and incremental (partial-aggregate)
  * view maintenance.
  *
  * Scale notes (100 TB design intent):
  *  - SCD2 is ONE window pass: the change history hash-partitions on the
  *    business key, lead() closes each version in-partition — no self-join,
  *    no second shuffle. At 100 TB the per-key history (tens of rows) is
  *    the sort unit, never the table.
  *  - View maintenance is the partial-aggregate algebra: (count, Σdw, Σfr)
  *    partials are associative+commutative LONG sums, so base⊕delta merge
  *    equals the flat recompute bit-for-bit (the oracle IS the flat form).
  *    In production the base partial is a stored artifact and only the
  *    delta scans — the query keeps both legs live so the gate re-proves
  *    the merge identity every run.
  */
object Warehouse {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_scd2_intervals",
      "Slowly-Changing-Dimension Type 2 interval construction: each " +
        "customer's order history becomes versioned rows valid_from = " +
        "o_orderdate, valid_to = lead(o_orderdate) over (customer, date, " +
        "key) — the deterministic tie-break the SCD discipline needs — " +
        "with the open interval (valid_to IS NULL) as the current version. " +
        "One window pass, one hash exchange on the business key; the gate " +
        "aggregates per currency flag: version counts, total closed-" +
        "interval days (calendar-day diff on DATE-truncated bounds, " +
        "identical on both engines), and the exact money sum of version " +
        "balances. The companion to q_merge_upsert: MERGE keeps only the " +
        "latest state, SCD2 keeps the full validity timeline.",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        table(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
          .groupBy(col("valid_to").isNull.as("is_current"))
          .agg(
            count(lit(1)).as("n_versions"),
            coalesce(sum(datediff(to_date(col("valid_to")), to_date(col("o_orderdate")))), lit(0L))
              .cast(LongType).as("days_closed"),
            Exact.moneySum(col("o_totalprice")).as("bal_sum"))
          .orderBy("is_current")
      },
      Some(
        """WITH v AS (
          |  SELECT o_custkey, o_orderdate, o_totalprice,
          |    lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
          |  FROM orders)
          |SELECT (valid_to IS NULL) AS is_current, count(*) AS n_versions,
          |  CAST(coalesce(sum(date_diff('day', CAST(o_orderdate AS DATE), CAST(valid_to AS DATE))), 0) AS BIGINT) AS days_closed,
          |  """.stripMargin + Exact.moneySumSql("o_totalprice") +
          """ AS bal_sum
          |FROM v GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_view_maintenance",
      "Incremental aggregate-view maintenance: lineitem splits at a ship-" +
        "date cutoff into a 'base' leg (the stored materialized view in " +
        "production) and a 'delta' leg (the new batch); each leg computes " +
        "per-(returnflag, linestatus) PARTIALS — row count plus the " +
        "(whole-dollar, fractional-micro) LONG sums of moneySum — and the " +
        "view refresh is a union + re-sum + single final rounding. Because " +
        "integer addition is associative and commutative, base⊕delta " +
        "equals the flat single-pass aggregate BIT-FOR-BIT, which is " +
        "exactly what the oracle computes (the flat form). The 100 TB " +
        "posture: a refresh touches only the delta scan plus a 6-row " +
        "merge, never the history; the same algebra is why moneySum " +
        "partials can pre-aggregate below joins (SURVEY round-7 notes). " +
        "Both legs' filters push to the parquet scan.",
      (s, dir) => {
        val cutoff = lit("2000-01-01").cast(TimestampType)
        val li = table(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"), col("l_extendedprice"), col("l_shipdate"))
        def partial(df: DataFrame): DataFrame =
          df.groupBy("l_returnflag", "l_linestatus")
            .agg(
              count(lit(1)).as("n_part"),
              sum(Exact.microDw(col("l_extendedprice"))).as("sd"),
              sum(Exact.microFr(col("l_extendedprice"))).as("sf"))
        partial(li.filter(col("l_shipdate") < cutoff))
          .unionByName(partial(li.filter(col("l_shipdate") >= cutoff)))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("n_part")).as("n"),
            Exact.moneyFinish(sum(col("sd")), sum(col("sf"))).as("price_sum"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(
        "SELECT l_returnflag, l_linestatus, count(*) AS n, " +
          Exact.moneySumSql("l_extendedprice") + " AS price_sum " +
          "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2")),

    GraftQuery(
      "q_cdc_apply",
      "CDC changelog application — the third leg of the table-maintenance " +
        "family (q_merge_upsert folds ONE batch into a target; q_scd2_" +
        "intervals keeps the full history; this replays an ordered " +
        "insert/update/delete log to the final state). The event stream " +
        "is the per-user changelog in (ts, event_id) order; 'error' rows " +
        "are tombstones, everything else upserts the value. Last-writer-" +
        "wins is ONE window pass: row_number DESC over the change key " +
        "picks each key's final op in the same keyed sort every SCD/" +
        "sessionization query uses — no self-join against max(ts), which " +
        "double-scans and breaks on ts ties. Survivors (final op not a " +
        "tombstone) roll up per final event_type with exact integer-cent " +
        "money mass. At 100 TB the changelog hash-partitions on the key; " +
        "per-key history is the sort unit, never the table.",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
            floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") =!= "error")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_keys"), sum(col("cents")).as("cents_sum"))
          .orderBy("event_type")
      },
      Some(
        """WITH last AS (
          |  SELECT user_id, event_type,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM events)
          |SELECT event_type, count(*) AS n_keys,
          |  CAST(sum(cents) AS BIGINT) AS cents_sum
          |FROM last WHERE rn = 1 AND event_type != 'error'
          |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_agg_rfm",
      "RFM customer segmentation — the classic value-tiering mart: per " +
        "customer recency (days since last order, exact epoch-day " +
        "BIGINTs), frequency (order count) and monetary (exact cents), " +
        "each scored into quintiles over a FULLY tie-broken order " +
        "(metric, custkey — buckets of integer ranks are exact on both " +
        "engines once ties can't reorder), then the 5×5×5 segment grid " +
        "with customer counts and exact money mass. The fact table " +
        "collapses to customer grain in ONE hash agg before any " +
        "ranking; each quintile is the exact integer ntile bucket " +
        "formula applied to a GlobalRank.rowNumberBanded exact global " +
        "rank (monotone metric banding: per-band partitioned-window " +
        "row numbers + broadcast band offsets — recency bands on the " +
        "negated last-order day, which is the same permutation as " +
        "days-since-last-order without ever computing the global max " +
        "day; frequency on the negated count; monetary on negated " +
        "$10k cent buckets), so the customer-grain relation moves " +
        "through three band-keyed hash exchanges and never sorts " +
        "into one partition — the shape that survives 1e8+ " +
        "customers; the quintile formula's customer count rides the " +
        "first rank's offsets broadcast. The oracle keeps DuckDB's " +
        "native ntile; identical integers.",
      (s, dir) => {
        import graft.operators.GlobalRank.rowNumberBanded
        val od = datediff(to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))).cast(LongType)
        val per = table(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(max(od).as("lastd"), count(lit(1)).as("f"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast(LongType)).as("m"))
        // the three quintile ranks CHAIN over the full-width customer-grain
        // relation: each rowNumberBanded shares its band exchange between
        // its own two branches (ReuseExchange), so the orders aggregation
        // runs ONCE at the bottom of the chain and the relation moves
        // through exactly three band-keyed exchanges — no per-rank slim
        // projection, no three joins back on the customer key. (The old
        // slim-projection-and-join-back shape predates the shared-exchange
        // rowNumberBanded, which made each rank recompute its input twice.)
        // Recency ranks on lastd DESC directly: ORDER BY maxd - lastd,
        // custkey is the SAME permutation (maxd is a per-relation constant
        // and x -> maxd - x is strictly decreasing), so the global max day
        // never needs computing — which retires the old second scan of
        // orders entirely; the customer count the quintile formula needs
        // rides the first rank's band-offsets broadcast (totalOut = the
        // sum of per-band counts) instead of a countDistinct over the
        // fact table.
        val t1 = rowNumberBanded(per,
          -col("lastd"), Seq(col("lastd").desc, col("o_custkey")), "rr", "nn")
        val t2 = rowNumberBanded(t1,
          -col("f"), Seq(col("f").desc, col("o_custkey")), "rf")
        val t3 = rowNumberBanded(t2,
          -call_function("div", col("m"), lit(1000000L)),
          Seq(col("m").desc, col("o_custkey")), "rm")
        val ranked = t3 // nn rode through the chain from the t1 offsets broadcast
        // exact ntile(5) from the global rank: the first n%5 buckets take
        // one extra row — the q_hist_equidepth integer bucket formula
        def score(rk: org.apache.spark.sql.Column) = {
          val r0 = rk - lit(1L)
          val q = call_function("div", col("nn"), lit(5L))
          val rem = col("nn") % lit(5L)
          val thr = rem * (q + lit(1L))
          when(r0 < thr, call_function("div", r0, q + lit(1L)) + lit(1L))
            .otherwise(call_function("div", r0 - thr, greatest(q, lit(1L)))
              + rem + lit(1L))
            .cast(LongType)
        }
        ranked
          .withColumn("r_score", score(col("rr")))
          .withColumn("f_score", score(col("rf")))
          .withColumn("m_score", score(col("rm")))
          .groupBy("r_score", "f_score", "m_score")
          .agg(count(lit(1)).as("n_customers"), sum(col("m")).as("monetary_cents"))
          .orderBy("r_score", "f_score", "m_score")
      },
      Some(
        """WITH per AS (SELECT o_custkey,
          |    max(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT))
          |      AS lastd,
          |    count(*) AS f,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
          |      AS BIGINT) AS m
          |  FROM orders GROUP BY o_custkey),
          |t AS (SELECT max(lastd) AS maxd FROM per),
          |sc AS (SELECT
          |    ntile(5) OVER (ORDER BY t.maxd - lastd, o_custkey) AS r_score,
          |    ntile(5) OVER (ORDER BY f DESC, o_custkey) AS f_score,
          |    ntile(5) OVER (ORDER BY m DESC, o_custkey) AS m_score,
          |    m
          |  FROM per, t)
          |SELECT r_score, f_score, m_score, count(*) AS n_customers,
          |  CAST(sum(m) AS BIGINT) AS monetary_cents
          |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    GraftQuery(
      "q_audit_checksum",
      "Order-insensitive content fingerprint of the orders table per " +
        "status — the cross-cluster reconciliation primitive: after a " +
        "migration/backfill, two engines compare (row count, md5-prefix " +
        "checksum, min/max digest) per partition group and any single " +
        "changed byte in any row flips the group's fingerprint. Each row " +
        "canonicalizes to a '|'-joined string of EXACT integer renderings " +
        "(cents, epoch days — floats never print), md5 of that string is " +
        "engine-identical, and the checksum is the exact BIGINT sum of " +
        "16-bit digest prefixes — associative, so any partitioning and " +
        "any accumulation order gives the same value (a concat-based " +
        "fingerprint would be order-dependent and unusable distributed). " +
        "One map pass + one hash agg; nothing shuffles but (status, " +
        "digest) slivers. The digest is [[graft.functions.GraftMd5]] (same " +
        "32-hex contract as built-in md5/DuckDB md5, thread-local " +
        "MessageDigest — the built-in's per-row getInstance path took ~6 " +
        "bench passes to JIT-warm, so 3-sample medians timed warm-up: " +
        "r12 recorded 2.78 s for this one-map-pass shape), and the 16-bit " +
        "prefix is [[graft.functions.HexPrefix16]] byte arithmetic rather " +
        "than conv()'s NumberConverter parse.",
      (s, dir) => {
        val day = graft.Ts.dayBucket(col("o_orderdate"))
        val cents = floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
        val h = graft.functions.HashExpr.auditDigest(col("o_orderkey"),
          col("o_custkey"), cents, day, col("o_orderpriority"))
        val h16 = graft.functions.HashExpr.hexPrefix16(h)
        // NO Tables.spread here: with the digest fused into one ~0.3 µs/row
        // expression the single-row-group map stage costs ~45 ms, while the
        // spread's full-row shuffle measured +0.2 s median at sf0.1 (10-pass
        // interleaved probe: 0.26 s nospread vs 0.47 s spread). At 100 TB
        // the scan parallelizes natively over row groups — spread only earns
        // its exchange when per-row work dominates it (Tables.spread
        // contract), which stopped being true the moment the digest stopped
        // being concat_ws+DigestUtils.
        table(s, dir, "orders")
          // The canon columns are contractually non-null for the audit:
          // AuditDigest is null-intolerant (NULL row → NULL digest) while
          // DuckDB's concat_ws SKIPS a NULL argument and hashes the shorter
          // string — a row with a NULL o_orderpriority would count into n
          // but diverge in checksum/min/max. The explicit symmetric filter
          // (mirrored in the oracle WHERE) makes the exclusion the contract
          // rather than a latent divergence (advisor r13).
          .filter(col("o_orderkey").isNotNull && col("o_custkey").isNotNull &&
            col("o_totalprice").isNotNull && col("o_orderdate").isNotNull &&
            col("o_orderpriority").isNotNull)
          .select(col("o_orderstatus"), h.as("h"), h16.as("h16"))
          .groupBy("o_orderstatus")
          // min/max over the digest go through MinMax128 (two LONG buffer
          // halves), NOT min(h)/max(h): a StringType buffer field kicks the
          // whole aggregate off the HashAggregate fast path into
          // SortAggregate — two full sorts of the input (the r12 2.78 s)
          .agg(count(lit(1)).as("n"), sum(col("h16")).as("checksum"),
            graft.functions.HashExpr.minHex128(col("h")).as("h_min"),
            graft.functions.HashExpr.maxHex128(col("h")).as("h_max"))
          .orderBy("o_orderstatus")
      },
      Some(
        """WITH c AS (SELECT o_orderstatus,
          |    md5(concat_ws('|',
          |      CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
          |      CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
          |      CAST(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS VARCHAR),
          |      o_orderpriority)) AS h
          |  FROM orders
          |  WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
          |    AND o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
          |    AND o_orderpriority IS NOT NULL),
          |v AS (SELECT o_orderstatus, h,
          |    4096 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
          |    + 256 * (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
          |    + 16 * (strpos('0123456789abcdef', substr(h, 3, 1)) - 1)
          |    + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) AS h16
          |  FROM c)
          |SELECT o_orderstatus, count(*) AS n,
          |  CAST(sum(h16) AS BIGINT) AS checksum,
          |  min(h) AS h_min, max(h) AS h_max
          |FROM v GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))
  )
}
