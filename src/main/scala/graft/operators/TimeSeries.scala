package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch time-series operators (SURVEY.md §2.9): tumbling windows and
  * gaps-and-islands sessionization. Their Structured Streaming twins (window()
  * / session_window() with watermarks) live in graft.streaming and reuse the
  * same grouping expressions.
  *
  * Epoch arithmetic: graft.Ts.epochSec(ts) = microseconds/1e6 in Spark, which
  * is bitwise-identical to DuckDB's epoch(ts) (verified on the fixtures — ts
  * has sub-second precision, so integer-second unix_timestamp would be WRONG
  * here) and NTZ-safe (the direct double cast is rejected for TIMESTAMP_NTZ
  * fixtures; Ts routes through TimestampType first).
  */
object TimeSeries {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_ts_tumbling",
      "Per-hour tumbling counts/sums per event_type (batch twin of streaming window()).",
      (s, dir) =>
        table(s, dir, "events")
          .groupBy(
            date_trunc("hour", col("ts")).as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), graft.Exact.moneySum(col("value")).as("s"))
          .orderBy("w", "event_type"),
      Some(
        "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, event_type, count(*) AS n, " +
          graft.Exact.moneySumSql("value") + " AS s FROM events GROUP BY 1,2 ORDER BY 1,2")),

    GraftQuery(
      "q_ts_session",
      "30-min-gap sessionization via gaps-and-islands: lag → break flag → running sum " +
        "→ group. One shuffle on user_id; both windows share that partitioning.",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val prevTs = lag(col("ts"), 1).over(w)
        val brk = when(
          prevTs.isNull || (graft.Ts.epochSec(col("ts")) - graft.Ts.epochSec(prevTs)) > 1800, 1
        ).otherwise(0)
        table(s, dir, "events")
          .withColumn("brk", brk)
          .withColumn(
            "sid",
            sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sid")
          .agg(count(lit(1)).as("n"))
          .orderBy("user_id", "sid")
      },
      Some(
        // ts cast to micros (TIMESTAMP) up front: DuckDB reads the raw
        // fixture at nanos precision while Spark reads the micros-truncated
        // form — a gap within 1µs of exactly 1800s would otherwise split
        // sessions differently on the two engines
        "WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events), " +
          "g AS (SELECT user_id, ts, event_id, CASE WHEN " +
          "epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 " +
          "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS brk " +
          "FROM e), " +
          // CAST to BIGINT: DuckDB types sum(INTEGER) as HUGEINT (INT128), which
          // pandas fetches as object/float and hash-mismatches Spark's BIGINT sid
          // even when every value is equal — the only bare int-sum output column
          // in the contract (CORRECTNESS_r01: rows/schema matched, hash did not).
          "s AS (SELECT user_id, ts, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g) " +
          "SELECT user_id, sid, count(*) AS n FROM s GROUP BY user_id, sid ORDER BY user_id, sid")),

    GraftQuery(
      "q_ts_resample",
      "Resample + gap-fill: hourly money sums per event_type on a DENSE hour grid " +
        "(sequence over the global [min,max] hour span × distinct types), missing " +
        "hours forward-filled with the last observed value (0 before the first). " +
        "Scale: the grid is generated, not scanned (rows = hours × types, " +
        "independent of event count); the only event-sized shuffles are the hourly " +
        "aggregation and one window pass per type, both on the same (event_type) key.",
      (s, dir) => {
        val e = table(s, dir, "events")
        val hourly = e
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(graft.Exact.moneySum(col("value")).as("s"))
        val grid = e
          .agg(min(date_trunc("hour", col("ts"))).as("mn"),
               max(date_trunc("hour", col("ts"))).as("mx"))
          .select(explode(expr("sequence(mn, mx, interval 1 hour)")).as("h"))
        val types = e.select(col("event_type")).distinct()
        val w = Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.crossJoin(broadcast(types))
          .join(hourly, Seq("h", "event_type"), "left")
          .select(col("h"), col("event_type"),
            coalesce(last(col("s"), ignoreNulls = true).over(w), lit(0.0)).as("s_fill"))
          .orderBy("h", "event_type")
      },
      Some(
        """WITH e AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type, value FROM events),
          |hourly AS (SELECT h, event_type, """.stripMargin +
          graft.Exact.moneySumSql("value") + """ AS s FROM e GROUP BY 1, 2),
          |b AS (SELECT min(h) AS mn, max(h) AS mx FROM e),
          |grid AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b),
          |fg AS (SELECT g.h, t.event_type FROM grid g
          |       CROSS JOIN (SELECT DISTINCT event_type FROM e) t),
          |j AS (SELECT fg.h, fg.event_type, hourly.s FROM fg
          |      LEFT JOIN hourly ON fg.h = hourly.h AND fg.event_type = hourly.event_type)
          |SELECT h, event_type,
          |  coalesce(last_value(s IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
          |    ROWS UNBOUNDED PRECEDING), 0.0) AS s_fill
          |FROM j ORDER BY h, event_type""".stripMargin)),

    GraftQuery(
      "q_ts_sliding",
      "SLIDING (hopping) windows in batch — the twin of streaming " +
        "window(ts, '1 hour', '15 minutes'): every event belongs to 4 " +
        "overlapping hour windows, generated map-side as explode(0..3) with the " +
        "window start derived by integer epoch arithmetic " +
        "(floor(epoch/slide) − k) · slide — identical IEEE/integer steps on both " +
        "engines, sub-second timestamps included. Count + exact money sum per " +
        "(window, type); the 4× fan-out happens before the single keyed " +
        "aggregation, so the shape is one shuffle regardless of overlap factor.",
      (s, dir) => {
        val slide = 900L // 15 min; window = 4 slides = 1 h
        val e = table(s, dir, "events")
        // Spark floor(double) returns LONG; Ts.epochSec(ts) ≡ DuckDB epoch(ts)
        // bitwise (sub-second precision, NTZ-safe — the direct double cast is
        // rejected for TIMESTAMP_NTZ), so the slot index matches exactly
        e.select(col("event_type"), col("value"),
            floor(graft.Ts.epochSec(col("ts")) / lit(slide.toDouble)).as("slot"),
            explode(sequence(lit(0), lit(3))).as("k"))
          .select(col("event_type"), col("value"),
            graft.Ts.fromEpochSec((col("slot") - col("k")) * lit(slide),
              e.schema("ts").dataType).as("w_start"))
          .groupBy("w_start", "event_type")
          .agg(count(lit(1)).as("n"), graft.Exact.moneySum(col("value")).as("s"))
          .orderBy("w_start", "event_type")
      },
      Some(
        """WITH f AS (SELECT event_type, value,
          |    CAST(to_timestamp((CAST(floor(epoch(ts)/900.0) AS BIGINT) - k) * 900)
          |      AS TIMESTAMP) AS w_start
          |  FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k) ks)
          |SELECT w_start, event_type, count(*) AS n, """.stripMargin +
          graft.Exact.moneySumSql("value") + """ AS s
          |FROM f GROUP BY w_start, event_type ORDER BY w_start, event_type""".stripMargin)),

    GraftQuery(
      "q_ts_time_weighted",
      "Time-weighted average of the value signal per user — the ops/finance " +
        "staple where a reading holds until the next one: Σ value·Δt / Σ Δt " +
        "over consecutive same-user events; top-20 users. EXACT under any " +
        "partitioning: values are 2-dp money → integer cents, intervals are " +
        "exact epoch MICROSECOND longs, so every product and both sums are " +
        "associative BIGINT arithmetic — only the final two IEEE divisions " +
        "touch floating point, identically on both engines. One window pass " +
        "(lead) + one hash agg; the last event of each user carries no dt and " +
        "drops out, same as the oracle's IS NOT NULL.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val dt = e
          .withColumn("dt",
            graft.Ts.epochMicros(lead(col("ts"), 1).over(w)) - graft.Ts.epochMicros(col("ts")))
          .filter(col("dt").isNotNull)
        dt.groupBy("user_id")
          .agg(sum(col("cents") * col("dt")).as("sw"), sum(col("dt")).as("sd"))
          .select(col("user_id"),
            round(col("sw").cast("double") / col("sd").cast("double") / 100.0, 6).as("twa"))
          .orderBy(col("twa").desc, col("user_id"))
          .limit(20)
      },
      Some(
        """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
          |w AS (SELECT user_id, cents,
          |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts) AS dt
          |  FROM e),
          |a AS (SELECT user_id, CAST(sum(cents * dt) AS BIGINT) AS sw,
          |    CAST(sum(dt) AS BIGINT) AS sd
          |  FROM w WHERE dt IS NOT NULL GROUP BY user_id)
          |SELECT user_id, round(CAST(sw AS DOUBLE) / CAST(sd AS DOUBLE) / 100.0, 6) AS twa
          |FROM a ORDER BY twa DESC, user_id LIMIT 20""".stripMargin)),

    GraftQuery(
      "q_ts_funnel",
      "Ordered event funnel — the product-analytics staple: per user, the " +
        "earliest view, the earliest click STRICTLY AFTER that view, the " +
        "earliest purchase strictly after that click; output = users reaching " +
        "each stage. Stage timestamps are exact micros minima, so the strict " +
        "inequalities are deterministic. Scale shape: ONE user-keyed exchange " +
        "total — the three stage minima are STACKED WINDOWS over the same " +
        "user partitioning (t2's condition references the t1 window column, " +
        "so each Window operator reuses the exchange below it; the " +
        "q_win_global_rank_2pass exchange-reuse discipline), then a per-user " +
        "reduce (no new shuffle: same key) and a single-row count. The " +
        "previous shape — three chained agg+broadcast jobs — was " +
        "latency-bound at 3 sequential stage barriers; this is one.",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        val e = table(s, dir, "events")
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"), col("ts"))
        val staged = e
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("ts") > col("t1"),
              col("ts"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
              col("ts"))).over(w))
        staged
          .groupBy("user_id")
          .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("t3")).as("t3"))
          .agg(
            count(col("t1")).as("n_view"),
            count(col("t2")).as("n_click"),
            count(col("t3")).as("n_purchase"))
      },
      Some(
        """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
          |s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
          |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
          |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
          |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
          |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
          |SELECT (SELECT count(*) FROM s1) AS n_view,
          |       (SELECT count(*) FROM s2) AS n_click,
          |       (SELECT count(*) FROM s3) AS n_purchase""".stripMargin)),

    GraftQuery(
      "q_ts_anomaly",
      "Volume anomaly detection — hours whose event count z-scores beyond " +
        "|z| > 2 against the whole series. DETERMINISM BY CONSTRUCTION: the " +
        "mean and variance are assembled from exact BIGINT sums (Σc, Σc², n " +
        "— associative integer math under any partitioning), and the z " +
        "expression applies the IDENTICAL double operations in the identical " +
        "order on both engines — no stddev_samp aggregate, whose internal " +
        "merge order is engine-specific and would break the hash. Scale " +
        "shape: one hour-keyed hash agg, a 1-row global stats relation " +
        "broadcast back, map-side scoring.",
      (s, dir) => {
        val h = table(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("w"))
          .agg(count(lit(1)).as("c"))
        val st = h.agg(
          count(lit(1)).as("n"),
          sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("ss"))
        val mean = col("s").cast("double") / col("n").cast("double")
        // class-22 guards, identical tree in the oracle: n=1 → NULL variance
        // (divNZ on n−1), a −ε rounding of a ~0 variance → NULL sqrt
        // (DuckDB would RAISE), constant series → zero stddev → NULL z
        // (Spark's naked 0/0 NaN passes abs(z)>2 — NaN sorts above
        // everything — while DuckDB's /0 NULL fails it: every hour of a
        // constant series would be an "anomaly" on one engine and none on
        // the other)
        val varExpr = graft.Exact.divNZ(
          col("ss").cast("double") -
            col("s").cast("double") * col("s").cast("double") / col("n").cast("double"),
          (col("n") - 1).cast("double"))
        val z = graft.Exact.divNZ(
          col("c").cast("double") - mean, graft.Exact.sqrtNN(varExpr))
        h.crossJoin(broadcast(st))
          // filter on the RAW z, round only for output: the oracle's WHERE
          // resolves z to the unrounded CTE column (the alias is shadowed),
          // so filtering the rounded alias here would drop a boundary hour
          // whose raw |z| ∈ (2, 2.0000005) that DuckDB keeps — the raw
          // double tree is engine-identical, so the raw decision is too
          .select(col("w"), col("c"), z.as("zraw"))
          .filter(abs(col("zraw")) > 2.0)
          .select(col("w"), col("c"), round(col("zraw"), 6).as("z"))
          .orderBy("w")
      },
      Some(
        s"""WITH h AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, count(*) AS c
          |  FROM events GROUP BY 1),
          |st AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
          |       CAST(sum(c*c) AS BIGINT) AS ss FROM h),
          |z AS (SELECT w, c,
          |    ${graft.Exact.divNZSql(
            "CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)",
            graft.Exact.sqrtNNSql(graft.Exact.divNZSql(
              "CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)",
              "CAST(n - 1 AS DOUBLE)")))} AS z
          |  FROM h, st)
          |SELECT w, c, round(z, 6) AS z FROM z WHERE abs(z) > 2.0 ORDER BY w""".stripMargin)),

    GraftQuery(
      "q_ts_retention",
      "Cohort retention — the product-analytics staple the funnel doesn't " +
        "cover: users cohorted by FIRST active day, then the count of users " +
        "from each cohort active again at day offsets 0..7. All integer/date " +
        "math (distinct days, min date, datediff), so the triangle is " +
        "engine- and partitioning-exact. Scale shape: one distinct over slim " +
        "(user, day) rows, a user-keyed min-agg, the user-sized cohort " +
        "relation broadcast back (user-keyed shuffle join beyond broadcast " +
        "range), and one (cohort, offset) hash agg — never a corpus " +
        "self-join.",
      (s, dir) => {
        val act = table(s, dir, "events")
          .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("d"))
          .distinct()
        val coh = act.groupBy("user_id").agg(min(col("d")).as("cohort"))
        act.join(broadcast(coh), "user_id")
          .select(col("cohort"), datediff(col("d"), col("cohort")).cast("long").as("offset_days"))
          .filter(col("offset_days") <= 7)
          .groupBy("cohort", "offset_days")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort", "offset_days")
      },
      Some(
        """WITH act AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
          |coh AS (SELECT user_id, min(d) AS cohort FROM act GROUP BY user_id),
          |r AS (SELECT c.cohort, CAST(a.d - c.cohort AS BIGINT) AS offset_days
          |  FROM act a JOIN coh c ON a.user_id = c.user_id
          |  WHERE a.d - c.cohort <= 7)
          |SELECT cohort, offset_days, count(*) AS n_users
          |FROM r GROUP BY cohort, offset_days ORDER BY cohort, offset_days""".stripMargin)),

    GraftQuery(
      "q_ts_gap_fill",
      "Dense-grid gap fill — the regularization step every downstream " +
        "forecaster/anomaly model needs: per-type event counts on a complete " +
        "10-minute grid spanning [min, max] bucket, absent cells zero-filled " +
        "(13.5k of 21.6k cells are gaps at sf0.01). Buckets are exact BIGINTs " +
        "(floor(epoch/600) — identical double op then floor on both engines), " +
        "the grid is generated, never scanned. Scale shape: one (type, " +
        "bucket)-keyed hash agg over the corpus; the grid side is a 1-row " +
        "span relation broadcast onto the tiny type dimension and exploded — " +
        "grid size is (span × types), independent of corpus row count; the " +
        "fill join keys on (type, bucket) against the ALREADY-aggregated " +
        "counts, so nothing corpus-sized moves twice.",
      (s, dir) => {
        val b = table(s, dir, "events")
          .select(
            floor(graft.Ts.epochSec(col("ts")) / 600).cast("long").as("bkt"),
            col("event_type"))
        // the corpus reduces to the (type, bucket) counts relation ONCE and is
        // materialized (column pruning makes the three downstream uses
        // non-identical subtrees, so ReuseExchange alone cannot share them —
        // without this the span/type/fill branches each rescan the corpus);
        // span and the type dimension then derive from the tiny relation
        // (pinned in Round8Spec: exactly one corpus scan)
        val c = b.groupBy("event_type", "bkt").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
        val span = c.agg(min(col("bkt")).as("lo"), max(col("bkt")).as("hi"))
        val grid = c.select("event_type").distinct()
          .crossJoin(broadcast(span))
          .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("bkt"))
        grid.join(c, Seq("event_type", "bkt"), "left")
          .select(col("event_type"), col("bkt"), coalesce(col("cnt"), lit(0L)).as("cnt"))
          .orderBy("event_type", "bkt")
      },
      Some(
        """WITH b AS (SELECT CAST(floor(epoch(ts)/600) AS BIGINT) AS bkt, event_type FROM events),
          |c AS MATERIALIZED (SELECT event_type, bkt, count(*) AS cnt FROM b GROUP BY 1, 2),
          |sp AS (SELECT min(bkt) AS lo, max(bkt) AS hi FROM c),
          |grid AS (SELECT event_type, unnest(generate_series(lo, hi)) AS bkt
          |         FROM (SELECT DISTINCT event_type FROM c), sp)
          |SELECT grid.event_type, grid.bkt, coalesce(c.cnt, 0) AS cnt
          |FROM grid LEFT JOIN c ON grid.event_type = c.event_type AND grid.bkt = c.bkt
          |ORDER BY 1, 2""".stripMargin)),

    GraftQuery(
      "q_ts_trend",
      "Per-type linear trend of hourly volume — least-squares slope, " +
        "intercept, and r² over (hour index, count), the q_ts_anomaly " +
        "moment pattern extended to regression: every moment (n, Σx, Σy, " +
        "Σxy, Σx², Σy²) is an exact BIGINT from integer hour indexes and " +
        "counts, every covariance numerator/denominator is assembled in " +
        "exact integer arithmetic, and only the final divisions are IEEE — " +
        "in the identical order on both engines, so the fit is bit-exact " +
        "under any partitioning (a float regr_slope aggregate's low bits " +
        "depend on merge order). Hour indexes are rebased to the global " +
        "minimum so the integer products stay far from BIGINT range (the " +
        "bound to re-check if the series spans centuries or counts approach " +
        "2^31). Scale shape: one hour-keyed agg, a 1-row rebase broadcast, " +
        "one per-type moment agg over the tiny hourly relation.",
      (s, dir) => {
        val h = table(s, dir, "events")
          .groupBy(col("event_type"),
            floor(graft.Ts.epochSec(col("ts")) / 3600).cast("long").as("bkt"))
          .agg(count(lit(1)).as("y"))
        val mn = h.agg(min(col("bkt")).as("lo"))
        val m = h.crossJoin(broadcast(mn))
          .select(col("event_type"), (col("bkt") - col("lo")).as("x"), col("y"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        val dxy = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        val dxx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val dyy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
        m.select(col("event_type"), dxy.as("dxy"), dxx.as("dxx"), dyy.as("dyy"),
            col("sx").cast("double").as("dsx"), col("sy").cast("double").as("dsy"),
            col("n").cast("double").as("dn"))
          .select(col("event_type"),
            round(col("dxy") / col("dxx"), 6).as("slope"),
            round((col("dsy") - (col("dxy") / col("dxx")) * col("dsx")) / col("dn"), 6).as("intercept"),
            round((col("dxy") * col("dxy")) / (col("dxx") * col("dyy")), 6).as("r2"))
          .orderBy("event_type")
      },
      Some(
        """WITH h AS (SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS bkt, count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |mn AS (SELECT min(bkt) AS lo FROM h),
          |r AS (SELECT event_type, bkt - lo AS x, y FROM h, mn),
          |m AS (SELECT event_type, count(*) AS n,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
          |    CAST(sum(y*y) AS BIGINT) AS syy
          |  FROM r GROUP BY 1),
          |f AS (SELECT event_type,
          |    CAST(n*sxy - sx*sy AS DOUBLE) AS dxy,
          |    CAST(n*sxx - sx*sx AS DOUBLE) AS dxx,
          |    CAST(n*syy - sy*sy AS DOUBLE) AS dyy,
          |    CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy, CAST(n AS DOUBLE) AS dn
          |  FROM m)
          |SELECT event_type, round(dxy / dxx, 6) AS slope,
          |  round((dsy - (dxy / dxx) * dsx) / dn, 6) AS intercept,
          |  round((dxy * dxy) / (dxx * dyy), 6) AS r2
          |FROM f ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_ts_ewma",
      "Exponentially weighted moving average per user (α-decay smoothing, " +
        "the monitoring/trend primitive). The textbook recurrence " +
        "s_i = α·x_i + (1−α)·s_{i−1} is non-associative driver-bait — a " +
        "per-partition sequential fold. The scalable form is the TRUNCATED " +
        "kernel: weights (1−α)^k decay geometrically, so a 4-tap window " +
        "(α=0.2: 1, .8, .64, .512) captures all but ~41% → renormalized " +
        "over the taps actually present it is a bounded-frame window " +
        "expression — one keyed exchange, no recursion, identical on a " +
        "1000-executor cluster. The weights are written as double LITERALS " +
        "(no pow()) and the kernel as the same left-associative chain in " +
        "both engines, so every IEEE op lands bitwise-identically; lag " +
        "nulls at partition heads drop out of both numerator and " +
        "denominator via the same coalesce/indicator pair.",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val l1 = lag(col("value"), 1).over(w)
        val l2 = lag(col("value"), 2).over(w)
        val l3 = lag(col("value"), 3).over(w)
        table(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("value"), col("ts"))
          .withColumn("ewma", round(
            (col("value") + lit(0.8) * coalesce(l1, lit(0d)) +
              lit(0.64) * coalesce(l2, lit(0d)) + lit(0.512) * coalesce(l3, lit(0d))) /
              (lit(1.0) + lit(0.8) * when(l1.isNull, 0d).otherwise(1d) +
                lit(0.64) * when(l2.isNull, 0d).otherwise(1d) +
                lit(0.512) * when(l3.isNull, 0d).otherwise(1d)), 6))
          .select(col("user_id"), col("event_id"), col("ewma"))
          .orderBy("user_id", "event_id")
          .limit(1000)
      },
      Some(
        """WITH o AS (SELECT user_id, event_id, value,
          |    lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
          |    lag(value, 3) OVER w AS l3
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT user_id, event_id,
          |  round((value + 0.8 * coalesce(l1, 0.0) + 0.64 * coalesce(l2, 0.0)
          |      + 0.512 * coalesce(l3, 0.0)) /
          |    (1.0 + 0.8 * (CASE WHEN l1 IS NULL THEN 0.0 ELSE 1.0 END)
          |      + 0.64 * (CASE WHEN l2 IS NULL THEN 0.0 ELSE 1.0 END)
          |      + 0.512 * (CASE WHEN l3 IS NULL THEN 0.0 ELSE 1.0 END)), 6) AS ewma
          |FROM o ORDER BY user_id, event_id LIMIT 1000""".stripMargin)),

    GraftQuery(
      "q_ts_ohlc",
      "OHLC candlestick resample — the financial/metrics staple: per hour × " +
        "type, the opening value (first by time), high, low, and closing " +
        "value (last by time), plus the bar's sample count. Open/close are " +
        "argmin/argmax over the TOTAL key (epoch, event_id) expressed as " +
        "min/max(struct(...)) — ONE hash aggregate with partial-aggregable " +
        "reducers, no window sort anywhere (the q_dedup_cluster_rep argmax " +
        "discipline); event_id uniqueness makes the selection deterministic " +
        "even for equal timestamps, on any engine and partitioning. " +
        "High/low are plain min/max. The whole bar build is a single " +
        "two-phase agg that partitions by (hour, type) at any scale.",
      (s, dir) =>
        table(s, dir, "events")
          .filter(col("event_type").isin("purchase", "view"))
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(
            round(min(struct(graft.Ts.epochSec(col("ts")).as("e"),
              col("event_id").as("id"), col("value").as("v"))).getField("v"), 6).as("open"),
            round(max(col("value")), 6).as("high"),
            round(min(col("value")), 6).as("low"),
            round(max(struct(graft.Ts.epochSec(col("ts")).as("e"),
              col("event_id").as("id"), col("value").as("v"))).getField("v"), 6).as("close"),
            count(lit(1)).as("n"))
          .orderBy("h", "event_type")
          .limit(500),
      Some(
        """SELECT date_trunc('hour', ts) AS h, event_type,
          |  round((min({'e': epoch(ts), 'id': event_id, 'v': value})).v, 6) AS open,
          |  round(max(value), 6) AS high,
          |  round(min(value), 6) AS low,
          |  round((max({'e': epoch(ts), 'id': event_id, 'v': value})).v, 6) AS close,
          |  count(*) AS n
          |FROM events WHERE event_type IN ('purchase', 'view')
          |GROUP BY 1, 2 ORDER BY h, event_type LIMIT 500""".stripMargin)),

    GraftQuery(
      "q_ts_locf",
      "Last-observation-carried-forward imputation — the third member of " +
        "the regularization family next to zero-fill (q_ts_gap_fill) and " +
        "kernel smoothing (q_ts_ewma): at every event on a user's timeline, " +
        "the amount of their most recent purchase, NULL until the first one " +
        "(LOCF's honest prefix). last(…, ignoreNulls) over the running " +
        "frame — one user-keyed exchange + sort, values COPIED not " +
        "computed, so the gate is arithmetic-free and exact by " +
        "construction. The sparse observed column is synthesized in-query " +
        "(value where purchase, else NULL), pinning the ignore-nulls frame " +
        "semantics cross-engine — the piece a naive coalesce(lag…) chain " +
        "gets wrong at any gap length its unrolling misses.",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
              .over(w).as("last_purchase"))
          .orderBy("user_id", "event_id")
          .limit(1000)
      },
      Some(
        """SELECT user_id, event_id,
          |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
          |    OVER (PARTITION BY user_id ORDER BY ts, event_id
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
          |FROM events ORDER BY user_id, event_id LIMIT 1000""".stripMargin)),

    GraftQuery(
      "q_ts_rolling_distinct",
      "Trailing-24h DISTINCT users per hour — the rolling-distinct problem " +
        "no window frame solves (count(DISTINCT) over a frame is " +
        "unsupported in both engines) and the naive form is a range self-" +
        "join Spark would execute as a broadcast nested loop. Sweep-line " +
        "form: dedup to (hour, user) pairs map-side, merge each user's " +
        "[h, h+23] report intervals (gaps-and-islands in one sorted pass " +
        "per user — a new island opens when the next active hour is more " +
        "than 23 past the previous, so a user's islands are disjoint and " +
        "each hour counts them once), emit ±1 boundary deltas per island, " +
        "then one running sum over the boundary RELATION (≤ 2× timeline " +
        "hours after the per-hour collapse — hundreds of rows regardless " +
        "of corpus size, with observed-hour zero-delta probes carrying " +
        "plateaus). Cost is O(distinct pairs), with NO window-size fan-" +
        "out: the earlier explode×24 rewrite shipped 24 rows per pair " +
        "into a corpus-sized countDistinct exchange; this ships each pair " +
        "once and the distinct-count never shuffles at all. The oracle is " +
        "the genuinely different range-join formulation, so the gate " +
        "proves the decomposition, not just the arithmetic.",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val tsT = ev.schema("ts").dataType
        val e = ev
          .select(
            floor(graft.Ts.epochSec(date_trunc("hour", col("ts"))) / lit(3600d))
              .cast(LongType).as("hr"),
            col("user_id"))
          .distinct()
        // ONE window pass emits everything: lag marks island starts, lead
        // marks island ends (interval [start, end+24)), and every row also
        // emits a zero-delta "observed hour" marker — so the pair relation
        // is scanned exactly once and never re-derived for the hour domain
        val ord = Window.partitionBy("user_id").orderBy("hr")
        val prev = lag(col("hr"), 1).over(ord)
        val nxt = lead(col("hr"), 1).over(ord)
        val marked = e.select(col("hr"),
          (prev.isNull || col("hr") > prev + lit(23L)).as("is_start"),
          (nxt.isNull || nxt > col("hr") + lit(23L)).as("is_end"))
        val deltas = marked
          .select(explode(array(
            struct(col("hr").as("hr_id"), lit(0L).as("d"), lit(1L).as("obs")),
            struct(when(col("is_start"), col("hr")).as("hr_id"), lit(1L).as("d"),
              lit(0L).as("obs")),
            struct(when(col("is_end"), col("hr") + lit(24L)).as("hr_id"),
              lit(-1L).as("d"), lit(0L).as("obs")))).as("x"))
          .select(col("x.hr_id"), col("x.d"), col("x.obs"))
          .filter(col("hr_id").isNotNull)
        val bounds = deltas.groupBy("hr_id")
          .agg(sum(col("d")).as("nd"), max(col("obs")).as("obs"))
        bounds
          .withColumn("n_users", sum(col("nd")).over(
            Window.orderBy("hr_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("obs") === 1L)
          .select(graft.Ts.fromEpochSec(col("hr_id") * lit(3600L), tsT).as("hr"),
            col("n_users"))
          .orderBy("hr")
      },
      Some(
        """WITH h AS (SELECT DISTINCT date_trunc('hour', ts) AS hr FROM events)
          |SELECT h.hr, count(DISTINCT e.user_id) AS n_users
          |FROM h JOIN events e
          |  ON date_trunc('hour', e.ts) BETWEEN h.hr - INTERVAL 23 HOUR AND h.hr
          |GROUP BY h.hr ORDER BY h.hr""".stripMargin)),

    GraftQuery(
      "q_seq_trigram",
      "Sequential-pattern mining, the Markov-path form: the 10 most common " +
        "consecutive event-type trigrams across per-user timelines, via " +
        "double lead() over the (ts, event_id) tie-broken user window — " +
        "sequence features extracted in ONE window pass instead of two " +
        "self-joins on adjacent ranks. One user-keyed exchange; trigram " +
        "space is |types|³ = 125 so the count aggregation collapses map-" +
        "side; fully ordered (n desc, then lexicographic) before the " +
        "limit, so top-10 is deterministic under ties. At 100 TB this is " +
        "the session-path building block for next-event prediction " +
        "features — the shuffle carries only (t1,t2,t3) triples, never " +
        "the timeline.",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("t1"))
          .select(col("t1"),
            lead(col("t1"), 1).over(w).as("t2"),
            lead(col("t1"), 2).over(w).as("t3"))
          .filter(col("t3").isNotNull)
          .groupBy("t1", "t2", "t3")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
          .limit(10)
      },
      Some(
        """WITH t AS (SELECT event_type AS t1,
          |  lead(event_type, 1) OVER w AS t2, lead(event_type, 2) OVER w AS t3
          | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT t1, t2, t3, count(*) AS n FROM t WHERE t3 IS NOT NULL
          |GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 10""".stripMargin)),

    GraftQuery(
      "q_seq_markov",
      "First-order Markov transition matrix over per-user event-type " +
        "sequences: P(next | current) for every observed (from, to) pair " +
        "— the normalized model artifact next-event prediction trains " +
        "against, where q_seq_trigram only censuses raw patterns. One " +
        "lead() over the (ts, event_id) tie-broken user window emits " +
        "transition pairs; counts and row margins are exact BIGINT (the " +
        "margin via a frame-free window over the ≤|types|² cell " +
        "relation, not a second corpus pass), and each probability is a " +
        "single IEEE division of exact integers. The shuffle carries " +
        "(from, to) pairs only, never timelines.",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        def D(c: String) = col(c).cast(DoubleType)
        table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("t_from"))
          .select(col("t_from"), lead(col("t_from"), 1).over(w).as("t_to"))
          .filter(col("t_to").isNotNull)
          .groupBy("t_from", "t_to")
          .agg(count(lit(1)).as("n"))
          .withColumn("row_n", sum(col("n")).over(Window.partitionBy("t_from")))
          .select(col("t_from"), col("t_to"), col("n"),
            round(D("n") / D("row_n"), 6).as("p"))
          .orderBy("t_from", "t_to")
      },
      Some(
        """WITH t AS (SELECT event_type AS t_from,
          |    lead(event_type, 1) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS t_to
          |  FROM events),
          |c AS (SELECT t_from, t_to, count(*) AS n FROM t
          |  WHERE t_to IS NOT NULL GROUP BY 1, 2),
          |m AS (SELECT t_from, t_to, n,
          |    CAST(sum(n) OVER (PARTITION BY t_from) AS BIGINT) AS row_n
          |  FROM c)
          |SELECT t_from, t_to, n,
          |  round(CAST(n AS DOUBLE) / CAST(row_n AS DOUBLE), 6) AS p
          |FROM m ORDER BY t_from, t_to""".stripMargin)),

    GraftQuery(
      "q_seq_paths",
      "Top-10 session paths: sessionize each user's timeline with the " +
        "30-minute-gap device (q_ts_session), render each session's " +
        "first 8 event types as an ordered '>' path string, and count " +
        "path frequencies — the funnel-discovery staple that tells you " +
        "what users actually do, not what the funnel spec assumed. " +
        "Determinism: the per-session prefix is capped by row_number " +
        "BEFORE aggregation (identical strings on both engines), and " +
        "Spark's order-free collect_list is made deterministic by " +
        "sorting (rn, type) structs in-array — never relying on " +
        "partition arrival order. Two shared-sort windows per user, one " +
        "session-grain agg, one path-grain count; the full order is " +
        "(n desc, path) so top-10 cannot flip under ties.",
      (s, dir) => {
        val sec = graft.Ts.epochSec(col("ts"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val prevSec = lag(sec, 1).over(w)
        val sess = table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("t"))
          .withColumn("new_s",
            when(prevSec.isNull || (sec - prevSec) > 1800, 1L).otherwise(0L))
          .withColumn("sid", sum(col("new_s")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")))
          .filter(col("rn") <= 8)
        sess.groupBy("user_id", "sid")
          .agg(collect_list(struct(col("rn"), col("t"))).as("steps"))
          .select(array_join(
            transform(array_sort(col("steps")), x => x.getField("t")), ">")
            .as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(10)
      },
      Some(
        """WITH e AS (SELECT user_id, ts, event_id, event_type AS t,
          |    CASE WHEN lag(epoch(ts)) OVER w IS NULL
          |      OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
          |      THEN 1 ELSE 0 END AS new_s
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |s AS (SELECT user_id, ts, event_id, t,
          |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM e),
          |r AS (SELECT user_id, sid, t, ts, event_id,
          |    row_number() OVER (PARTITION BY user_id, sid
          |      ORDER BY ts, event_id) AS rn
          |  FROM s),
          |p AS (SELECT user_id, sid,
          |    string_agg(t, '>' ORDER BY rn) AS path
          |  FROM r WHERE rn <= 8 GROUP BY 1, 2)
          |SELECT path, count(*) AS n FROM p
          |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin)),

    GraftQuery(
      "q_ts_calendar",
      "Calendar heatmap — traffic and exact money mass per (day-of-week, " +
        "hour-of-day) cell, the capacity-planning staple. Day-of-week is " +
        "derived ARITHMETICALLY from epoch days ((days + 3) mod 7, " +
        "0 = Monday, anchored on 1970-01-01 being a Thursday) instead of " +
        "each engine's dayofweek() — whose numbering conventions differ " +
        "(Spark 1=Sunday, DuckDB 0=Sunday, ISO 1=Monday) and whose " +
        "session/locale sensitivity is exactly the portability trap the " +
        "epoch form avoids. All grouping keys are pure BIGINT steps from " +
        "the same micros, cents are exact; one map-side-combined hash agg " +
        "over a 168-cell key space.",
      (s, dir) => {
        val sec = graft.Ts.epochSec(col("ts"))
        table(s, dir, "events")
          .select(
            pmod(floor(sec / lit(86400d)).cast(LongType) + lit(3L), lit(7L)).as("dow"),
            pmod(floor(sec / lit(3600d)).cast(LongType), lit(24L)).as("hod"),
            floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
          .groupBy("dow", "hod")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
          .orderBy("dow", "hod")
      },
      Some(
        """SELECT (((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 3) % 7) + 7) % 7 AS dow,
          |  ((CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24) + 24) % 24 AS hod,
          |  count(*) AS n,
          |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_sum
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    GraftQuery(
      "q_ts_autocorr",
      "Lag-1 autocorrelation of the daily event-count series per type — " +
        "the burstiness/trend diagnostic run before any forecasting: " +
        "consecutive (x_t, x_{t+1}) pairs from one lead() over the tiny " +
        "per-(type, day) count relation, then Pearson r from five exact " +
        "BIGINT sufficient statistics with the closed form in doubles on " +
        "the SAME expression tree both engines (the q_agg_regression " +
        "discipline — native corr() folds floats in partition order). " +
        "Two aggregations and one window, all over day-grain relations " +
        "(≤ types × days rows regardless of corpus size); the corpus " +
        "touches only the first count.",
      (s, dir) => {
        val daily = RankStats.daily(s, dir)
        val w = Window.partitionBy("event_type").orderBy("day")
        val pairs = daily
          .withColumn("y", lead(col("x"), 1).over(w))
          .filter(col("y").isNotNull)
        val r = graft.Exact.pearson(col("n"), col("sx"), col("sy"),
          col("sxy"), col("sxx"), col("syy"))
        pairs.groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("event_type"), col("n"), round(r, 6).as("r1"))
          .orderBy("event_type")
      },
      Some(
        s"""WITH daily AS (
          |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
          |    count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |p AS (SELECT event_type, x,
          |    lead(x) OVER (PARTITION BY event_type ORDER BY day) AS y
          |  FROM daily),
          |a AS (SELECT event_type, count(*) AS n,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |    CAST(sum(x * y) AS BIGINT) AS sxy,
          |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM p WHERE y IS NOT NULL GROUP BY event_type)
          |SELECT event_type, n,
          |  round(${graft.Exact.pearsonSql("n", "sx", "sy", "sxy", "sxx", "syy")}, 6) AS r1
          |FROM a ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_ts_rolling_median",
      "7-day rolling MEDIAN of the daily count series per type — the " +
        "robust smoother (one spike day cannot move it, unlike the " +
        "rolling mean) that no built-in window aggregate expresses: " +
        "window frames can sum but not select order statistics. The " +
        "decomposition is a bounded band join on the day-grain relation " +
        "(each day collects its ≤7 trailing observations — O(7·days) " +
        "rows however large the corpus), then the lower median comes " +
        "from an in-array sort of the collected multiset (array_sort of " +
        "VALUES is deterministic regardless of collect order — the " +
        "q_seq_paths discipline) indexed at ⌈n/2⌉. All-BIGINT; only " +
        "complete 7-day windows report.",
      (s, dir) => {
        val daily = RankStats.daily(s, dir)
        val a = daily.select(col("event_type"), col("day"), col("x"))
        val b = daily.select(col("event_type").as("et2"), col("day").as("d2"),
          col("x").as("x2"))
        a.join(b, col("event_type") === col("et2") &&
            col("d2").between(col("day") - 6, col("day")))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"),
            element_at(array_sort(collect_list(col("x2"))),
              (((count(lit(1)) + 1) / 2)).cast("int")).as("med"))
          .filter(col("cnt") === 7L)
          .select(col("event_type"), col("day"), col("med"))
          .orderBy("event_type", "day")
      },
      Some(
        """WITH d AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |j AS (SELECT a.event_type, a.day, b.x AS x2
          |  FROM d a JOIN d b ON a.event_type = b.event_type
          |    AND b.day BETWEEN a.day - 6 AND a.day),
          |m AS (SELECT event_type, day, count(*) AS cnt,
          |    CAST(list_sort(list(x2))[CAST((count(*) + 1) // 2 AS INT)]
          |      AS BIGINT) AS med
          |  FROM j GROUP BY 1, 2)
          |SELECT event_type, day, med FROM m WHERE cnt = 7
          |ORDER BY event_type, day""".stripMargin)),

    GraftQuery(
      "q_ts_ccf",
      "Cross-correlation function between the click and purchase daily " +
        "series at lags −3..+3 — the lead–lag detector (does click " +
        "volume LEAD purchase volume, and by how many days?) that sits " +
        "beside the single-series ACF panel. The lag fan-out is an " +
        "explode of the 7 lag literals over the day-grain click series " +
        "(≤ 7 × days rows), one equi-join on the shifted day aligns the " +
        "purchase side, and each lag cell folds to exact BIGINT " +
        "sufficient statistics with Pearson r as the closed-form double " +
        "tree. Day-grain only; the corpus is touched by one count.",
      (s, dir) => {
        val daily = RankStats.daily(s, dir).withColumnRenamed("x", "n")
        val da = daily.filter(col("event_type") === "click")
          .select(col("day"), col("n").as("x"))
        val db = daily.filter(col("event_type") === "purchase")
          .select(col("day").as("dayb"), col("n").as("y"))
        val r = graft.Exact.pearson(col("np"), col("sx"), col("sy"),
          col("sxy"), col("sxx"), col("syy"))
        da
          .withColumn("lag_k", explode(array((-3 to 3).map(k => lit(k.toLong)): _*)))
          .join(db, col("day") + col("lag_k") === col("dayb"))
          .groupBy("lag_k")
          .agg(count(lit(1)).as("np"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("lag_k"), col("np"), round(r, 6).as("r"))
          .orderBy("lag_k")
      },
      Some(
        s"""WITH daily AS (
          |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
          |    count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |da AS (SELECT day, n AS x FROM daily WHERE event_type = 'click'),
          |db AS (SELECT day AS dayb, n AS y FROM daily
          |  WHERE event_type = 'purchase'),
          |lags AS (SELECT CAST(range AS BIGINT) AS lag_k FROM range(-3, 4)),
          |j AS (SELECT l.lag_k, a.x, b.y
          |  FROM da a CROSS JOIN lags l
          |  JOIN db b ON a.day + l.lag_k = b.dayb),
          |a AS (SELECT lag_k, count(*) AS np,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |    CAST(sum(x * y) AS BIGINT) AS sxy,
          |    CAST(sum(x * x) AS BIGINT) AS sxx,
          |    CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM j GROUP BY 1)
          |SELECT lag_k, np,
          |  round(${graft.Exact.pearsonSql("np", "sx", "sy", "sxy", "sxx", "syy")},
          |    6) AS r
          |FROM a ORDER BY lag_k""".stripMargin)),

    GraftQuery(
      "q_ts_theilsen",
      "Theil–Sen robust trend per type: the MEDIAN of all pairwise " +
        "slopes of the daily count series — the outlier-immune companion " +
        "to q_ts_trend's least squares (one corrupted day moves OLS, not " +
        "the median slope). Pair generation self-joins the DAY-GRAIN " +
        "relation (days²-bounded per type — ~5k pairs per 100-day span — " +
        "however large the corpus; the corpus is touched only by the " +
        "first count); each slope is ONE IEEE division of exact BIGINTs, " +
        "so every slope is bit-identical on both engines and the " +
        "lower-median pick (first row where 2·rank ≥ n over the fully " +
        "tie-broken (slope, d1, d2) order) can never flip. No float is " +
        "ever a grouping key — ordering by identically-computed doubles " +
        "is safe where hashing them is not.",
      (s, dir) => {
        val daily = RankStats.daily(s, dir)
        val a = daily.select(col("event_type"), col("day").as("d1"), col("x").as("x1"))
        val b = daily.select(col("event_type").as("et2"), col("day").as("d2"),
          col("x").as("x2"))
        val pairs = a.join(b,
            col("event_type") === col("et2") && col("d1") < col("d2"))
          .select(col("event_type"), col("d1"), col("d2"),
            ((col("x2") - col("x1")).cast(DoubleType) /
              (col("d2") - col("d1")).cast(DoubleType)).as("slope"))
        val w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
        pairs
          .withColumn("rn", row_number().over(w).cast(LongType))
          .withColumn("np", count(lit(1)).over(Window.partitionBy("event_type")))
          .filter(col("rn") * 2 >= col("np"))
          .groupBy("event_type")
          .agg(max(col("np")).as("n_pairs"),
            round(min(col("slope")), 6).as("theil_slope"))
          .orderBy("event_type")
      },
      Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
          |    count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |p AS (SELECT a.event_type, a.day AS d1, b.day AS d2,
          |    CAST(b.x - a.x AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
          |  FROM daily a JOIN daily b
          |    ON a.event_type = b.event_type AND a.day < b.day),
          |r AS (SELECT event_type, slope,
          |    CAST(row_number() OVER (PARTITION BY event_type
          |      ORDER BY slope, d1, d2) AS BIGINT) AS rn,
          |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
          |  FROM p)
          |SELECT event_type, max(np) AS n_pairs,
          |  round(min(slope), 6) AS theil_slope
          |FROM r WHERE rn * 2 >= np
          |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_ts_acf",
      "Autocorrelation panel, lags 1–7, of the daily count series per " +
        "type — the full ACF diagnostic behind seasonality detection " +
        "(a weekly cycle shows as r₇ ≫ r₁..r₆), extending q_ts_autocorr " +
        "beyond lag 1. ALL seven lags ride ONE keyed window sort (seven " +
        "lead() calls share the frame), the lag pairs unpivot through " +
        "stack() map-side, and each (type, lag) cell folds to five exact " +
        "BIGINT sufficient statistics with Pearson r as the closed-form " +
        "double tree (the q_agg_regression discipline — native corr() " +
        "folds floats in partition order). Day-grain relation only.",
      (s, dir) => {
        val daily = RankStats.daily(s, dir)
        val w = Window.partitionBy("event_type").orderBy("day")
        val withLeads = (1 to 7).foldLeft(daily) { (d, k) =>
          d.withColumn(s"y$k", lead(col("x"), k).over(w))
        }
        val stacked = withLeads.select(col("event_type"), col("x"),
          expr("stack(7, " +
            (1 to 7).map(k => s"${k}L, y$k").mkString(", ") +
            ") AS (lag_k, y)"))
          .filter(col("y").isNotNull)
        val r = graft.Exact.pearson(col("n"), col("sx"), col("sy"),
          col("sxy"), col("sxx"), col("syy"))
        stacked.groupBy("event_type", "lag_k")
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("event_type"), col("lag_k"), col("n"),
            round(r, 6).as("r"))
          .orderBy("event_type", "lag_k")
      },
      Some(
        s"""WITH daily AS (
          |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
          |    count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |l AS (SELECT event_type, x,
          |    lead(x, 1) OVER w AS y1, lead(x, 2) OVER w AS y2,
          |    lead(x, 3) OVER w AS y3, lead(x, 4) OVER w AS y4,
          |    lead(x, 5) OVER w AS y5, lead(x, 6) OVER w AS y6,
          |    lead(x, 7) OVER w AS y7
          |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
          |u AS (
          |  SELECT event_type, x, 1 AS lag_k, y1 AS y FROM l UNION ALL
          |  SELECT event_type, x, 2, y2 FROM l UNION ALL
          |  SELECT event_type, x, 3, y3 FROM l UNION ALL
          |  SELECT event_type, x, 4, y4 FROM l UNION ALL
          |  SELECT event_type, x, 5, y5 FROM l UNION ALL
          |  SELECT event_type, x, 6, y6 FROM l UNION ALL
          |  SELECT event_type, x, 7, y7 FROM l),
          |a AS (SELECT event_type, CAST(lag_k AS BIGINT) AS lag_k,
          |    count(*) AS n,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |    CAST(sum(x * y) AS BIGINT) AS sxy,
          |    CAST(sum(x * x) AS BIGINT) AS sxx,
          |    CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM u WHERE y IS NOT NULL GROUP BY 1, 2)
          |SELECT event_type, lag_k, n,
          |  round(${graft.Exact.pearsonSql("n", "sx", "sy", "sxy", "sxx", "syy")},
          |    6) AS r
          |FROM a ORDER BY event_type, lag_k""".stripMargin)),

    GraftQuery(
      "q_ts_interval_union",
      "Merged-interval coverage per user (the interval-union / utilization " +
        "problem): every event opens a 15-minute presence interval; " +
        "overlapping intervals merge, and the answer is each user's island " +
        "count and total covered microseconds. Classic gaps-and-islands in " +
        "ONE sorted window pass per user: an interval starts a new island " +
        "when its start exceeds the running max end of everything before " +
        "it (max-over-preceding-rows), islands are numbered by a running " +
        "sum of those start flags, then min(start)/max(end) per island. " +
        "All arithmetic is exact epoch-microsecond BIGINT, so coverage is " +
        "bit-identical on any engine and partitioning. Scale shape: hash-" +
        "partition on user_id, sort once, both windows share that one " +
        "sort; no self-join, no fan-out — the naive overlap formulation " +
        "is a per-user theta join that dies quadratically on hot users.",
      (s, dir) => {
        val iv = table(s, dir, "events")
          .select(col("user_id"), graft.Ts.epochMicros(col("ts")).as("st"))
          .withColumn("en", col("st") + lit(900000000L))
        val ord = Window.partitionBy("user_id").orderBy("st", "en")
        val prevMax = max(col("en")).over(ord.rowsBetween(Window.unboundedPreceding, -1))
        val isStart = when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L)
        iv.withColumn("island",
            sum(isStart).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "island")
          .agg(min(col("st")).as("ms"), max(col("en")).as("me"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"), sum(col("me") - col("ms")).as("covered_us"))
          .orderBy("user_id")
      },
      Some(
        """WITH iv AS (
          |  SELECT user_id, epoch_us(ts) AS st, epoch_us(ts) + 900000000 AS en
          |  FROM events),
          |m AS (SELECT user_id, st, en,
          |  max(en) OVER (PARTITION BY user_id ORDER BY st, en
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
          |  FROM iv),
          |isl AS (SELECT user_id, st, en,
          |  sum(CASE WHEN pm IS NULL OR st > pm THEN 1 ELSE 0 END)
          |    OVER (PARTITION BY user_id ORDER BY st, en ROWS UNBOUNDED PRECEDING) AS island
          |  FROM m),
          |g AS (SELECT user_id, island, min(st) AS ms, max(en) AS me
          |  FROM isl GROUP BY 1, 2)
          |SELECT user_id, count(*) AS n_islands,
          |  CAST(sum(me - ms) AS BIGINT) AS covered_us
          |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    GraftQuery(
      "q_ts_concurrency",
      "Peak concurrent sessions per hour — the sweep-line form: each event " +
        "opens a 15-minute session; concurrency is the running sum of " +
        "+1/−1 boundary deltas in time order, and the per-hour answer is " +
        "the max of that step function inside the hour. NO single-" +
        "partition global window: deltas pre-aggregate per distinct " +
        "boundary instant (which also makes the running sum tie-order-" +
        "invariant), hour subtotals give each hour its carry-in via a " +
        "window over the tiny hour RELATION (~720 rows), and the running " +
        "sum inside each hour is a per-hour-partition window — the two-" +
        "pass prefix-sum discipline of q_win_global_rank_2pass. An hour-" +
        "start probe row (delta 0) per observed hour carries the plateau " +
        "across boundaries, so the hourly max is the TRUE max: sessions " +
        "are shorter than the hour grain, so every active hour contains a " +
        "boundary, and the step function is constant between boundaries. " +
        "All-BIGINT; the oracle uses the naive single global window, so " +
        "the gate proves the distributed decomposition.",
      (s, dir) => {
        val ev = table(s, dir, "events")
        val us = graft.Ts.epochMicros(col("ts"))
        val en = us + lit(900000000L)
        def hourStart(t: org.apache.spark.sql.Column) = t - pmod(t, lit(3600000000L))
        // 4 slim rows per event, all map-side: the ±1 boundary deltas plus a
        // zero-delta hour-start probe for each boundary's hour — so the
        // probe domain needs no second pass over the boundary relation
        val rows = ev.select(explode(array(
            struct(us.as("t"), lit(1L).as("d")),
            struct(en.as("t"), lit(-1L).as("d")),
            struct(hourStart(us).as("t"), lit(0L).as("d")),
            struct(hourStart(en).as("t"), lit(0L).as("d")))).as("x"))
          .select(col("x.t").as("t"), col("x.d").as("d"))
        // pre-aggregate per boundary instant: the running sum must apply an
        // instant's deltas SIMULTANEOUSLY — row-at-a-time application would
        // let intra-instant intermediates (e.g. the first of two −1s) leak
        // into the hourly max, which is both tie-order-dependent and wrong
        val net = rows.groupBy("t").agg(sum(col("d")).as("nd"))
          .withColumn("hr", expr("t div 3600000000"))
        // pass 1: carry-in per hour — derived from the PRE-shuffle delta
        // rows, not from `net`: hour sums don't need the per-instant
        // grouping, partial aggregation collapses the slim rows map-side,
        // and the expensive instant-keyed exchange then has exactly one
        // consumer (no duplicated subtree for ReuseExchange to miss)
        val hrNet = rows.select(expr("t div 3600000000").as("hr"), col("d"))
          .groupBy("hr").agg(sum(col("d")).as("hnd"))
        val carry = hrNet.withColumn("carry",
          coalesce(sum(col("hnd")).over(
            Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        // pass 2: within-hour running sum, fully parallel across hours
        val run = net.join(broadcast(carry.select(col("hr"), col("carry"))), "hr")
          .withColumn("cur",
            col("carry") + sum(col("nd")).over(
              Window.partitionBy("hr").orderBy("t")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        run.groupBy("hr").agg(max(col("cur")).as("peak"))
          .select(col("hr").as("hr_id"), col("peak"))
          .orderBy("hr_id")
      },
      Some(
        """WITH d AS (
          |  SELECT epoch_us(ts) AS t, 1 AS nd FROM events
          |  UNION ALL SELECT epoch_us(ts) + 900000000, -1 FROM events),
          |g AS (SELECT t, CAST(sum(nd) AS BIGINT) AS nd FROM d GROUP BY t),
          |p AS (SELECT t, nd FROM g
          |  UNION ALL
          |  SELECT DISTINCT (t // 3600000000) * 3600000000, 0 FROM g),
          |u AS (SELECT t, CAST(sum(nd) AS BIGINT) AS nd FROM p GROUP BY t),
          |r AS (SELECT t, sum(nd) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cur
          |  FROM u)
          |SELECT t // 3600000000 AS hr_id, CAST(max(cur) AS BIGINT) AS peak
          |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_ts_cusum",
      "CUSUM changepoint scan per (event_type, day): over the day's " +
        "ordered money values (integer cents), the scaled CUSUM statistic " +
        "S_k = n·cumsum_k − k·total is exact BIGINT (no mean, no division " +
        "— the float mean-deviation form is reduction-order-dependent), " +
        "and the reported changepoint is the position maximizing |S_k|, " +
        "earliest position on ties via a single min(struct) aggregate — " +
        "no second window, no self-join. One sorted window pass per " +
        "(type, day) partition (both row_number and the running sum share " +
        "the sort), then one hash agg; partitions are day-bounded, so no " +
        "timeline ever serializes through one task.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"),
            col("ts"), col("event_id"),
            floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
        val w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
        val stats = Window.partitionBy("event_type", "day")
        val scored = e
          .withColumn("k", row_number().over(w).cast(LongType))
          .withColumn("cum", sum(col("cents")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", count(lit(1)).over(stats))
          .withColumn("tot", sum(col("cents")).over(stats))
          .withColumn("s_abs", abs(col("n") * col("cum") - col("k") * col("tot")))
          .withColumn("s_top", max(col("s_abs")).over(stats))
        scored.groupBy("event_type", "day")
          .agg(
            max(col("n")).as("n"),
            max(col("s_abs")).as("cusum_max"),
            min(when(col("s_abs") === col("s_top"), col("k"))).as("cp_k"))
          .orderBy("event_type", "day")
      },
      Some(
        """WITH e AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events),
          |s AS (SELECT event_type, day,
          |  row_number() OVER w AS k,
          |  sum(cents) OVER (PARTITION BY event_type, day ORDER BY ts, event_id
          |    ROWS UNBOUNDED PRECEDING) AS cum,
          |  count(*) OVER (PARTITION BY event_type, day) AS n,
          |  sum(cents) OVER (PARTITION BY event_type, day) AS tot
          |  FROM e WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id)),
          |a AS (SELECT event_type, day, k, n, abs(n * cum - k * tot) AS s_abs,
          |  max(abs(n * cum - k * tot)) OVER (PARTITION BY event_type, day) AS s_top
          |  FROM s)
          |SELECT event_type, day, CAST(max(n) AS BIGINT) AS n,
          |  CAST(max(s_abs) AS BIGINT) AS cusum_max,
          |  CAST(min(CASE WHEN s_abs = s_top THEN k END) AS BIGINT) AS cp_k
          |FROM a GROUP BY event_type, day ORDER BY event_type, day""".stripMargin)),

    GraftQuery(
      "q_ts_attribution",
      "Linear multi-touch attribution: each purchase's value splits " +
        "across the user's click/view touches in the trailing 7 days " +
        "(no touch → 'direct') — the marketing/consent-tracing ledger " +
        "where the money column must CONSERVE exactly. The split is " +
        "EXACT INTEGER cents: each touch gets the FLOOR quotient " +
        "(cents − pmod(cents,k)) div k and the non-negative remainder " +
        "r = pmod(cents,k) ∈ [0,k) goes one cent each to the r earliest " +
        "touches by (ts, event_id) — no per-touch float division whose " +
        "re-sum drifts (cents = base·k + r by construction, INCLUDING " +
        "negative refund amounts, so the channel ledger sums to the " +
        "purchase ledger bitwise). The range " +
        "join runs as the band-join decomposition: touches key by epoch " +
        "day, purchases fan out to their 8 candidate days (O(8n), " +
        "co-partitioned by (user, day)) and the exact micros predicate " +
        "prunes inside the partition — never a per-user cross join, " +
        "which quadratically dies on hot users at 100 TB. One keyed " +
        "window pass computes k and the rank together; the oracle keeps " +
        "the naive user-keyed theta join, so the gate proves the " +
        "decomposition, not just the arithmetic.",
      (s, dir) => {
        val D = 86400000000L // one day in micros
        val ev = table(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            graft.Ts.epochMicros(col("ts")).as("us"), col("event_type"),
            floor(col("value") * 100 + 0.5).cast(LongType).as("cents"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id").as("u"),
            col("us").as("pts"), col("cents"))
        val t = ev.filter(col("event_type").isin("click", "view"))
          .select(col("user_id").as("u"), col("us").as("tts"),
            col("event_id").as("tid"), col("event_type").as("channel"))
        val joined = p
          .withColumn("day",
            explode(sequence(call_function("div", col("pts"), lit(D)) - lit(7L),
              call_function("div", col("pts"), lit(D)))))
          .join(t.withColumn("day", call_function("div", col("tts"), lit(D))),
            Seq("u", "day"))
          .filter(col("tts") >= col("pts") - lit(7L * D) && col("tts") < col("pts"))
        val w = Window.partitionBy("pid")
        // ONE pass over the band join feeds both outcomes: the per-(purchase,
        // channel) rollup left-joins back onto purchases, so the no-touch
        // 'direct' case falls out of the same join as the attributed case —
        // no second computation of the join subtree for an anti-join pid set
        // FLOOR division + non-negative remainder, spelled out on BOTH
        // engines: base = (cents - pmod(cents,k)) div k is exact (the
        // numerator is divisible by k, so truncating div == floor div) and
        // r = pmod ∈ [0,k) is always distributable — base·k + r = cents
        // holds for NEGATIVE cents too (refund rows). The previous
        // div(cents,k) + pmod pair mixed truncating division with a
        // non-negative remainder (sum = cents + k for cents < 0), and the
        // oracle's `//` + `%` pair truncates with a NEGATIVE remainder that
        // `rk <= r` never distributes — three different ledgers on any
        // negative amount (r13 review; fixtures are all ≥ 0, so the gate
        // alone could not see it).
        val pm = pmod(col("cents"), col("k"))
        val perPidCh = joined
          .withColumn("k", count(lit(1)).over(w))
          .withColumn("rk",
            row_number().over(w.orderBy("tts", "tid")).cast(LongType))
          .groupBy("pid", "channel")
          .agg(count(lit(1)).as("cnt"),
            sum(call_function("div", col("cents") - pm, col("k")) +
              when(col("rk") <= pm, 1L).otherwise(0L))
              .as("ac"))
        p.join(perPidCh, Seq("pid"), "left")
          .select(coalesce(col("channel"), lit("direct")).as("channel"),
            col("pid"), coalesce(col("cnt"), lit(1L)).as("cnt"),
            coalesce(col("ac"), col("cents")).as("ac"))
          .groupBy("channel")
          .agg(sum(col("cnt")).as("n_rows"),
            countDistinct(col("pid")).as("purchases"),
            sum(col("ac")).as("attributed_cents"))
          .orderBy("channel")
      },
      Some(
        """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
          |p AS (SELECT event_id AS pid, user_id AS u, us AS pts, cents
          |  FROM ev WHERE event_type = 'purchase'),
          |t AS (SELECT user_id AS u, us AS tts, event_id AS tid,
          |    event_type AS channel
          |  FROM ev WHERE event_type IN ('click', 'view')),
          |j AS (SELECT p.pid, p.cents, t.channel, t.tts, t.tid
          |  FROM p JOIN t ON t.u = p.u
          |    AND t.tts >= p.pts - 604800000000 AND t.tts < p.pts),
          |r AS (SELECT pid, cents, channel,
          |    count(*) OVER (PARTITION BY pid) AS k,
          |    CAST(row_number() OVER (PARTITION BY pid ORDER BY tts, tid)
          |      AS BIGINT) AS rk
          |  FROM j),
          |a AS (SELECT channel, pid,
          |    (cents - ((cents % k) + k) % k) // k
          |      + CASE WHEN rk <= ((cents % k) + k) % k THEN 1 ELSE 0 END AS ac
          |  FROM r
          |  UNION ALL
          |  SELECT 'direct', pid, cents FROM p
          |  WHERE pid NOT IN (SELECT pid FROM j))
          |SELECT channel, count(*) AS n_rows, count(DISTINCT pid) AS purchases,
          |  CAST(sum(ac) AS BIGINT) AS attributed_cents
          |FROM a GROUP BY channel ORDER BY channel""".stripMargin)),

    GraftQuery(
      "q_ts_burstiness",
      "Index of dispersion (Fano factor) and the normalized burstiness " +
        "coefficient B = (σ−μ)/(σ+μ) of each event type's hourly " +
        "arrival series — the Poisson-ness diagnostic next to " +
        "q_ts_autocorr (Fano ≈ 1 ⇒ Poisson arrivals; ≫ 1 ⇒ bursty, the " +
        "signal that capacity planning and anomaly thresholds can't " +
        "assume exponential gaps). EMPTY hours count: the timeline span " +
        "H comes from the global (min, max) hour so zero-count hours " +
        "enter the mean and variance without ever materializing — the " +
        "sufficient statistics (Σn, Σn² per type over observed hours " +
        "only) are exact BIGINTs from one hash agg over the hour-grain " +
        "relation, and σ²·μ arithmetic runs the same double tree both " +
        "engines with σ = sqrt(var) (correctly rounded, unlike pow). " +
        "Corpus is touched once; everything downstream is type-grain.",
      (s, dir) => {
        val cells = table(s, dir, "events")
          .groupBy(col("event_type"),
            floor(graft.Ts.epochSec(col("ts")) / lit(3600d)).cast(LongType)
              .as("hr"))
          .agg(count(lit(1)).as("n"))
        val span = cells.agg((max(col("hr")) - min(col("hr")) + lit(1L)).as("h"))
        def D(c: String) = col(c).cast(DoubleType)
        val mean = D("nn") / D("h")
        val varp = D("s2") / D("h") - mean * mean
        // varp ≥ 0 mathematically (variance over the h-hour series with
        // implicit zero cells) but a CONSTANT hourly series rounds it to
        // ±ε in doubles — the −ε side is a DuckDB sqrt ERROR (class 22);
        // mean ≥ 1/h > 0 always, so the burstiness denominator needs no
        // zero guard of its own
        val sigma = graft.Exact.sqrtNN(varp)
        cells.groupBy("event_type")
          .agg(sum(col("n")).as("nn"), sum(col("n") * col("n")).as("s2"))
          .crossJoin(broadcast(span))
          .select(col("event_type"), col("h"), col("nn").as("events"),
            round(varp / mean, 6).as("fano"),
            round((sigma - mean) / (sigma + mean), 6).as("burstiness"))
          .orderBy("event_type")
      },
      Some(
        s"""WITH c AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr, count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |t AS (SELECT max(hr) - min(hr) + 1 AS h FROM c),
          |a AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nn,
          |    CAST(sum(n * n) AS BIGINT) AS s2
          |  FROM c GROUP BY event_type),
          |d AS (SELECT event_type, h, nn,
          |    CAST(nn AS DOUBLE) / CAST(h AS DOUBLE) AS mean,
          |    CAST(s2 AS DOUBLE) / CAST(h AS DOUBLE)
          |      - (CAST(nn AS DOUBLE) / CAST(h AS DOUBLE))
          |        * (CAST(nn AS DOUBLE) / CAST(h AS DOUBLE)) AS varp
          |  FROM a, t)
          |SELECT event_type, h, nn AS events,
          |  round(varp / mean, 6) AS fano,
          |  round((${graft.Exact.sqrtNNSql("varp")} - mean)
          |    / (${graft.Exact.sqrtNNSql("varp")} + mean), 6) AS burstiness
          |FROM d ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_ts_snaive_backtest",
      "Seasonal-naive forecast backtest: predict each day's event count " +
        "per type from the same weekday one week earlier, and score MAE " +
        "and WAPE over every scorable day — the baseline every real " +
        "forecasting deployment must beat, and the backtest-evaluation " +
        "primitive itself. The lag is a RANGE frame (7 PRECEDING TO 7 " +
        "PRECEDING over integer epoch days), not a rows-lag — rows slip " +
        "on calendar gaps, the range frame is gap-safe by construction " +
        "and keeps the whole computation in ONE keyed window pass over " +
        "the day-grain relation (≤ types × days rows regardless of " +
        "corpus size; the corpus is touched only by the first count). " +
        "Errors are exact BIGINT |n − f| sums; MAE and WAPE are single " +
        "IEEE divisions of exact integers.",
      (s, dir) => {
        val daily = RankStats.daily(s, dir).withColumnRenamed("x", "n")
        val w = Window.partitionBy("event_type").orderBy("day")
          .rangeBetween(-7, -7)
        def D(c: String) = col(c).cast(DoubleType)
        daily.withColumn("f", max(col("n")).over(w))
          .filter(col("f").isNotNull)
          .select(col("event_type"), abs(col("n") - col("f")).as("ae"), col("n"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("days_scored"), sum(col("ae")).as("sae"),
            sum(col("n")).as("sn"))
          .select(col("event_type"), col("days_scored"),
            round(D("sae") / D("days_scored"), 6).as("mae"),
            round(D("sae") / D("sn"), 6).as("wape"))
          .orderBy("event_type")
      },
      Some(
        """WITH d AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |f AS (SELECT event_type, day, n,
          |    max(n) OVER (PARTITION BY event_type ORDER BY day
          |      RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS fc
          |  FROM d),
          |a AS (SELECT event_type, count(*) AS days_scored,
          |    CAST(sum(abs(n - fc)) AS BIGINT) AS sae,
          |    CAST(sum(n) AS BIGINT) AS sn
          |  FROM f WHERE fc IS NOT NULL GROUP BY 1)
          |SELECT event_type, days_scored,
          |  round(CAST(sae AS DOUBLE) / CAST(days_scored AS DOUBLE), 6) AS mae,
          |  round(CAST(sae AS DOUBLE) / CAST(sn AS DOUBLE), 6) AS wape
          |FROM a ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_ts_gaps",
      "Silent-gap census per type — the data-freshness/outage monitor " +
        "run against every ingest feed: consecutive-event gaps from one " +
        "lead() over the (ts, event_id)-ordered keyed window, reporting " +
        "how many exceeded an hour, the largest gap, and WHEN it opened " +
        "(window-top + conditional-min argmax, earliest on ties). Where " +
        "q_ts_gap_fill repairs calendar holes, this MEASURES them. All " +
        "arithmetic is exact epoch-microsecond BIGINT; one keyed sort, " +
        "one hash agg, nothing after the gap relation scales with the " +
        "corpus beyond the first sort.",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        val us = graft.Ts.epochMicros(col("ts"))
        table(s, dir, "events")
          .select(col("event_type"), col("ts"), col("event_id"), us.as("us"))
          .withColumn("gap", lead(col("us"), 1).over(w) - col("us"))
          .filter(col("gap").isNotNull)
          .withColumn("top", max(col("gap")).over(Window.partitionBy("event_type")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            sum(when(col("gap") > 3600000000L, 1L).otherwise(0L)).as("n_gaps_1h"),
            max(col("gap")).as("max_gap_us"),
            min(when(col("gap") === col("top"), col("us"))).as("max_gap_start_us"))
          .orderBy("event_type")
      },
      Some(
        """WITH e AS (SELECT event_type, ts, event_id, epoch_us(ts) AS us
          |  FROM events),
          |g AS (SELECT event_type, us,
          |    lead(us) OVER (PARTITION BY event_type ORDER BY ts, event_id)
          |      - us AS gap
          |  FROM e),
          |t AS (SELECT event_type, us, gap,
          |    max(gap) OVER (PARTITION BY event_type) AS top
          |  FROM g WHERE gap IS NOT NULL)
          |SELECT event_type, count(*) AS n_gaps,
          |  CAST(sum(CASE WHEN gap > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_gaps_1h,
          |  CAST(max(gap) AS BIGINT) AS max_gap_us,
          |  CAST(min(CASE WHEN gap = top THEN us END) AS BIGINT)
          |    AS max_gap_start_us
          |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_ts_drawdown",
      "Maximum drawdown of the daily activity series per type: the " +
        "largest peak-to-trough decline of daily event counts (running " +
        "max minus current), with the trough day — the activity-collapse " +
        "detector that SLO/engagement monitoring runs after the anomaly " +
        "scan. Everything is exact BIGINT (counts, running max, " +
        "differences), so the answer is bit-identical on any engine and " +
        "partitioning; the argmax day uses the q_ts_cusum device (window " +
        "top + conditional min — earliest trough on ties) instead of a " +
        "second sort. One keyed window over the day-grain relation " +
        "(≤ types × days rows); both the running max and the partition " +
        "top share the one sort, and the corpus is touched only by the " +
        "first count.",
      (s, dir) => {
        val daily = RankStats.daily(s, dir).withColumnRenamed("x", "n")
        val run = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("peak", max(col("n")).over(run))
          .withColumn("dd", col("peak") - col("n"))
          .withColumn("top", max(col("dd")).over(Window.partitionBy("event_type")))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_days"),
            max(col("dd")).as("max_dd"),
            min(when(col("dd") === col("top"), col("day"))).as("trough_day"))
          .orderBy("event_type")
      },
      Some(
        """WITH d AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |r AS (SELECT event_type, day, n,
          |    max(n) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS UNBOUNDED PRECEDING) AS peak
          |  FROM d),
          |dd AS (SELECT event_type, day, peak - n AS dd,
          |    max(peak - n) OVER (PARTITION BY event_type) AS top
          |  FROM r)
          |SELECT event_type, count(*) AS n_days,
          |  CAST(max(dd) AS BIGINT) AS max_dd,
          |  CAST(min(CASE WHEN dd = top THEN day END) AS BIGINT) AS trough_day
          |FROM dd GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_ts_peaks",
      "Local-maxima detection on the observed daily count series per " +
        "type: a day is a peak iff strictly greater than BOTH observed " +
        "neighbors (series ends are never peaks) — the spike-census " +
        "primitive under alerting and seasonality review. Peaks are " +
        "defined on the OBSERVED sequence (rows-lag neighbors), which is " +
        "the standard signal-processing formulation; the gap-safe " +
        "calendar variant is q_ts_snaive_backtest's RANGE-frame device. " +
        "All comparisons are exact BIGINT; the tallest peak's day uses " +
        "the window-top + conditional-min argmax (earliest on ties). One " +
        "keyed window sort shared by lag, lead, and the partition top; " +
        "day-grain relation only.",
      (s, dir) => {
        val daily = RankStats.daily(s, dir).withColumnRenamed("x", "n")
        val w = Window.partitionBy("event_type").orderBy("day")
        val flagged = daily
          .withColumn("pv", lag(col("n"), 1).over(w))
          .withColumn("nx", lead(col("n"), 1).over(w))
          .withColumn("is_peak",
            col("pv").isNotNull && col("nx").isNotNull &&
              col("n") > col("pv") && col("n") > col("nx"))
          .withColumn("ptop",
            max(when(col("is_peak"), col("n")))
              .over(Window.partitionBy("event_type")))
        flagged.groupBy("event_type")
          .agg(
            count(lit(1)).as("n_days"),
            sum(when(col("is_peak"), 1L).otherwise(0L)).as("n_peaks"),
            max(when(col("is_peak"), col("n"))).as("top_peak"),
            min(when(col("is_peak") && col("n") === col("ptop"), col("day")))
              .as("top_peak_day"))
          .orderBy("event_type")
      },
      Some(
        """WITH d AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |f AS (SELECT event_type, day, n,
          |    lag(n) OVER w AS pv, lead(n) OVER w AS nx
          |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
          |p AS (SELECT event_type, day, n,
          |    (pv IS NOT NULL AND nx IS NOT NULL AND n > pv AND n > nx)
          |      AS is_peak
          |  FROM f),
          |t AS (SELECT event_type, day, n, is_peak,
          |    max(CASE WHEN is_peak THEN n END)
          |      OVER (PARTITION BY event_type) AS ptop
          |  FROM p)
          |SELECT event_type, count(*) AS n_days,
          |  CAST(sum(CASE WHEN is_peak THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
          |  CAST(max(CASE WHEN is_peak THEN n END) AS BIGINT) AS top_peak,
          |  CAST(min(CASE WHEN is_peak AND n = ptop THEN day END) AS BIGINT)
          |    AS top_peak_day
          |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_ts_changepoint",
      "Single best changepoint of the daily count series per type by the " +
        "binary-segmentation variance criterion: the split k maximizing " +
        "the between-segment sum of squares. Where q_ts_cusum scans " +
        "intra-day money positions with the CUSUM statistic, this is the " +
        "ACROSS-days structural break on the count series. The score " +
        "(S1·nd − S·k)² / (k·(nd−k)·nd) is computed with an exact-BIGINT " +
        "numerator (prefix sums and totals never touch a float — the " +
        "squared term stays under 2^63 to ~3e9 events/type at 100-day " +
        "spans; longer spans sub-shard like q_agg_moments) and ONE IEEE " +
        "division per candidate, so every candidate's score is " +
        "bit-identical on both engines and the argmax (window top + " +
        "conditional min, earliest k on ties) can never flip. One keyed " +
        "window sort shared by row_number, the prefix sum, and the " +
        "partition stats; day-grain relation only.",
      (s, dir) => {
        val daily = RankStats.daily(s, dir).withColumnRenamed("x", "n")
        val ord = Window.partitionBy("event_type").orderBy("day")
        val part = Window.partitionBy("event_type")
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val num = col("cum") * col("nd") - col("tot") * col("k")
        val scored = daily
          .withColumn("k", row_number().over(ord).cast(LongType))
          .withColumn("cum", sum(col("n")).over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("nd", count(lit(1)).over(part))
          .withColumn("tot", sum(col("n")).over(part))
          .filter(col("k") < col("nd"))
          .withColumn("score",
            D(num * num) / D(col("k") * (col("nd") - col("k")) * col("nd")))
          .withColumn("top", max(col("score")).over(part))
        scored.groupBy("event_type")
          .agg(
            max(col("nd")).as("n_days"),
            min(when(col("score") === col("top"), col("k"))).as("cp_k"),
            min(when(col("score") === col("top"), col("day"))).as("cp_day"),
            round(max(col("score")), 6).as("bss"),
            round(D(min(when(col("score") === col("top"), col("cum")))) /
              D(min(when(col("score") === col("top"), col("k")))), 6)
              .as("mean_before"),
            round(D(max(col("tot")) -
                min(when(col("score") === col("top"), col("cum")))) /
              D(max(col("nd")) -
                min(when(col("score") === col("top"), col("k")))), 6)
              .as("mean_after"))
          .orderBy("event_type")
      },
      Some(
        """WITH d AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |s AS (SELECT event_type, day, n,
          |    CAST(row_number() OVER w AS BIGINT) AS k,
          |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd,
          |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
          |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
          |c AS (SELECT event_type, day, k, cum, nd, tot,
          |    CAST((cum * nd - tot * k) * (cum * nd - tot * k) AS DOUBLE)
          |      / CAST(k * (nd - k) * nd AS DOUBLE) AS score
          |  FROM s WHERE k < nd),
          |t AS (SELECT event_type, day, k, cum, nd, tot, score,
          |    max(score) OVER (PARTITION BY event_type) AS top
          |  FROM c)
          |SELECT event_type, max(nd) AS n_days,
          |  min(CASE WHEN score = top THEN k END) AS cp_k,
          |  min(CASE WHEN score = top THEN day END) AS cp_day,
          |  round(max(score), 6) AS bss,
          |  round(CAST(min(CASE WHEN score = top THEN cum END) AS DOUBLE)
          |    / CAST(min(CASE WHEN score = top THEN k END) AS DOUBLE), 6)
          |    AS mean_before,
          |  round(CAST(max(tot) - min(CASE WHEN score = top THEN cum END)
          |      AS DOUBLE)
          |    / CAST(max(nd) - min(CASE WHEN score = top THEN k END)
          |      AS DOUBLE), 6) AS mean_after
          |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_ts_bollinger",
      "Bollinger-band breach census on the daily count series per type: " +
        "over a gap-safe 7-day RANGE frame, count the days falling " +
        "outside mean ± 2σ of their own trailing week — the volatility-" +
        "normalized outlier monitor next to q_ts_anomaly's global z-score. " +
        "The breach predicate is FULLY INTEGER: |x − m| > 2σ over the " +
        "w=7 window is equivalent to (7x − Σx)² > 4·(7·Σx² − (Σx)²), so " +
        "no float ever decides a breach (window sums Σx, Σx² are exact " +
        "BIGINT; the float band width is reported but never compared). " +
        "Only complete 7-day windows score. One keyed window over the " +
        "day-grain relation; Σx, Σx², and the frame count share one sort.",
      (s, dir) => {
        val daily = RankStats.daily(s, dir).withColumnRenamed("x", "n")
        val fr = Window.partitionBy("event_type").orderBy("day")
          .rangeBetween(-6, 0)
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val dev = lit(7L) * col("n") - col("sx")
        val varNum = lit(7L) * col("sxx") - col("sx") * col("sx")
        daily
          .withColumn("cnt", count(lit(1)).over(fr))
          .withColumn("sx", sum(col("n")).over(fr))
          .withColumn("sxx", sum(col("n") * col("n")).over(fr))
          .filter(col("cnt") === 7L)
          .select(col("event_type"),
            when(dev * dev > lit(4L) * varNum && dev > 0, 1L).otherwise(0L)
              .as("hi"),
            when(dev * dev > lit(4L) * varNum && dev < 0, 1L).otherwise(0L)
              .as("lo"),
            varNum.as("vn"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("days_scored"),
            sum(col("hi")).as("n_breach_hi"), sum(col("lo")).as("n_breach_lo"),
            round(D(max(col("vn"))) / lit(49d), 6).as("max_var"))
          .orderBy("event_type")
      },
      Some(
        """WITH d AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |w AS (SELECT event_type, day, n,
          |    CAST(count(*) OVER f AS BIGINT) AS cnt,
          |    CAST(sum(n) OVER f AS BIGINT) AS sx,
          |    CAST(sum(n * n) OVER f AS BIGINT) AS sxx
          |  FROM d WINDOW f AS (PARTITION BY event_type ORDER BY day
          |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)),
          |b AS (SELECT event_type,
          |    7 * n - sx AS dev, 7 * sxx - sx * sx AS vn
          |  FROM w WHERE cnt = 7)
          |SELECT event_type, count(*) AS days_scored,
          |  CAST(sum(CASE WHEN dev * dev > 4 * vn AND dev > 0
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_hi,
          |  CAST(sum(CASE WHEN dev * dev > 4 * vn AND dev < 0
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_lo,
          |  round(CAST(max(vn) AS DOUBLE) / 49.0, 6) AS max_var
          |FROM b GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
