package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Series decomposition and sequence-mining additions (round 12): the
  * classical additive decomposition (trend / weekly seasonal), MAU-style
  * growth accounting, the entropy rate of the event-type Markov chain, and
  * SAX symbolization of the daily series.
  *
  * Shared scale discipline: every operator collapses the corpus to a slim
  * keyed relation first (day-grain counts, distinct user-days, transition
  * cells) with ONE hash aggregation, then does its real work on that
  * bounded relation. Exact BIGINT sufficient statistics everywhere; IEEE
  * only in per-row divisions of exact integers or in closed final trees;
  * sums OF IEEE terms ride ordered windows (both engines fold identically).
  */
object SeriesDecomp {
  import Tables.table

  // the shared day-grain relation (one copy for the whole daily-series
  // family; this file previously carried a byte-identical private pair)
  private def daily(s: org.apache.spark.sql.SparkSession, dir: String) =
    RankStats.daily(s, dir)
  private val dailySql = RankStats.dailySql

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_ts_stl",
      "Additive seasonal decomposition of the daily count series per " +
        "type — trend via the centered 7-day moving average (only frames " +
        "that hold 7 CONTIGUOUS days qualify: count=7 AND span=6, so a " +
        "gap never fakes a week), weekly seasonal index per day-of-week " +
        "from the detrended residue. The per-dow mean of detrended " +
        "values needs NO float fold at all: Σ(xᵢ − s7ᵢ/7) = " +
        "Σxᵢ − (Σs7ᵢ)/7 over exact BIGINTs, so the seasonal index is a " +
        "closed tree of three integer sums — the decomposition is exact " +
        "until the final divisions. One keyed window over the day-grain " +
        "relation; the corpus is touched by one count.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-3, 3)
        daily(s, dir)
          .withColumn("s7", sum(col("x")).over(w))
          .withColumn("c7", count(lit(1)).over(w))
          .withColumn("span", max(col("day")).over(w) - min(col("day")).over(w))
          .filter(col("c7") === 7L && col("span") === 6L)
          .withColumn("dow", pmod(col("day") + lit(3L), lit(7L)))
          .groupBy("event_type", "dow")
          .agg(count(lit(1)).as("n_days"),
            sum(col("x")).as("sx"), sum(col("s7")).as("ss7"))
          .select(col("event_type"), col("dow"), col("n_days"),
            round((D(col("sx")) - D(col("ss7")) / lit(7d)) / D(col("n_days")), 6)
              .as("seasonal"),
            round(D(col("ss7")) / lit(7d) / D(col("n_days")), 6).as("trend_mean"))
          .orderBy("event_type", "dow")
      },
      Some(
        s"""WITH $dailySql,
           |t AS (SELECT event_type, day, x,
           |    CAST(sum(x) OVER w AS BIGINT) AS s7,
           |    CAST(count(*) OVER w AS BIGINT) AS c7,
           |    CAST(max(day) OVER w - min(day) OVER w AS BIGINT) AS span
           |  FROM daily
           |  WINDOW w AS (PARTITION BY event_type ORDER BY day
           |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
           |f AS (SELECT event_type, (((day + 3) % 7) + 7) % 7 AS dow, x, s7
           |  FROM t WHERE c7 = 7 AND span = 6),
           |a AS (SELECT event_type, dow, count(*) AS n_days,
           |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(s7) AS BIGINT) AS ss7
           |  FROM f GROUP BY 1, 2)
           |SELECT event_type, CAST(dow AS BIGINT) AS dow, n_days,
           |  round((CAST(sx AS DOUBLE) - CAST(ss7 AS DOUBLE) / 7.0)
           |    / CAST(n_days AS DOUBLE), 6) AS seasonal,
           |  round(CAST(ss7 AS DOUBLE) / 7.0 / CAST(n_days AS DOUBLE), 6)
           |    AS trend_mean
           |FROM a ORDER BY event_type, dow""".stripMargin)),

    GraftQuery(
      "q_ts_growth",
      "Growth accounting over user activity — the product-analytics " +
        "ledger that splits each day's active users into NEW (first-ever " +
        "day), RETAINED (also active yesterday) and RESURRECTED (gap ≥ 2 " +
        "days), plus the CHURNED count attached to the day a user went " +
        "dark (active on d, not on d+1; the last observed day is " +
        "censored via a broadcast max-day scalar, never a guess). " +
        "Identity n_active(d) = new+retained+resurrected holds by " +
        "construction; churned(d+1) = active(d) − retained(d+1) is the " +
        "cross-check the oracle recomputes independently. One distinct " +
        "user-day collapse, one keyed lag/lead pass, all-integer counts.",
      (s, dir) => {
        val ud = table(s, dir, "events")
          .select(col("user_id"),
            graft.Ts.dayBucket(col("ts"))
              .as("day"))
          .distinct()
        val maxd = ud.agg(max(col("day")).as("maxday"))
        val w = Window.partitionBy("user_id").orderBy("day")
        val marked = ud
          .withColumn("prev", lag(col("day"), 1).over(w))
          .withColumn("nxt", lead(col("day"), 1).over(w))
          .join(broadcast(maxd))
        val active = marked.select(col("day"),
          when(col("prev").isNull, 1L).otherwise(0L).as("n"),
          when(col("prev") === col("day") - 1, 1L).otherwise(0L).as("r"),
          when(col("prev").isNotNull && col("prev") < col("day") - 1, 1L)
            .otherwise(0L).as("s"),
          lit(0L).as("c"))
        val churn = marked
          .filter((col("nxt").isNull && col("day") < col("maxday")) ||
            col("nxt") > col("day") + 1)
          .select((col("day") + 1).as("day"),
            lit(0L).as("n"), lit(0L).as("r"), lit(0L).as("s"), lit(1L).as("c"))
        active.unionAll(churn)
          .groupBy("day")
          .agg(sum("n").as("n_new"), sum("r").as("n_retained"),
            sum("s").as("n_resurrected"), sum("c").as("n_churned"))
          .orderBy("day")
      },
      Some(
        """WITH ud AS (SELECT DISTINCT user_id,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events),
          |mx AS (SELECT max(day) AS maxday FROM ud),
          |m AS (SELECT user_id, day,
          |    lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
          |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
          |  FROM ud),
          |u AS (
          |  SELECT day,
          |    CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS n,
          |    CASE WHEN prev = day - 1 THEN 1 ELSE 0 END AS r,
          |    CASE WHEN prev IS NOT NULL AND prev < day - 1 THEN 1 ELSE 0 END AS s,
          |    0 AS c
          |  FROM m
          |  UNION ALL
          |  SELECT day + 1, 0, 0, 0, 1
          |  FROM m, mx
          |  WHERE (nxt IS NULL AND day < mx.maxday) OR nxt > day + 1)
          |SELECT day, CAST(sum(n) AS BIGINT) AS n_new,
          |  CAST(sum(r) AS BIGINT) AS n_retained,
          |  CAST(sum(s) AS BIGINT) AS n_resurrected,
          |  CAST(sum(c) AS BIGINT) AS n_churned
          |FROM u GROUP BY day ORDER BY day""".stripMargin)),

    GraftQuery(
      "q_seq_entropy_rate",
      "Entropy rate of the empirical event-type Markov chain — the " +
        "single-number predictability reading over q_seq_markov's " +
        "transition matrix: H = −Σᵢⱼ (nᵢⱼ/N)·ln(nᵢⱼ/nᵢ·), with " +
        "perplexity exp(H) as the branching-factor interpretation. One " +
        "keyed lead pass builds transitions, the matrix is ≤|types|² " +
        "cells, every ln argument is a ratio of exact BIGINTs (identical " +
        "IEEE on both engines), and the one sum OF float terms rides the " +
        "(i,j)-ordered cumulative window — the zipf/entropy fold device " +
        "— so both engines fold in the same order.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val trans = table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("a"))
          .withColumn("b", lead(col("a"), 1).over(w))
          .filter(col("b").isNotNull)
          .groupBy("a", "b")
          .agg(count(lit(1)).as("nij"))
        val tot = Window.partitionBy(lit(1))
        val rowi = Window.partitionBy("a")
        val ord = Window.partitionBy(lit(1)).orderBy("a", "b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        trans
          .withColumn("nn", sum(col("nij")).over(tot))
          .withColumn("ni", sum(col("nij")).over(rowi))
          .withColumn("cells", count(lit(1)).over(tot))
          .withColumn("term",
            -(D(col("nij")) / D(col("nn"))) * log(D(col("nij")) / D(col("ni"))))
          .withColumn("h", sum(col("term")).over(ord))
          .withColumn("rn", row_number().over(
            Window.partitionBy(lit(1)).orderBy("a", "b")).cast(LongType))
          .filter(col("rn") === col("cells"))
          .select(col("nn").as("n_transitions"), col("cells").as("n_cells"),
            round(col("h"), 6).as("entropy_rate"),
            round(exp(col("h")), 6).as("perplexity"))
      },
      Some(
        """WITH t AS (SELECT user_id, event_type AS a,
          |    lead(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS b
          |  FROM events),
          |c AS (SELECT a, b, count(*) AS nij FROM t
          |  WHERE b IS NOT NULL GROUP BY 1, 2),
          |e AS (SELECT a, b, nij,
          |    CAST(sum(nij) OVER () AS BIGINT) AS nn,
          |    CAST(sum(nij) OVER (PARTITION BY a) AS BIGINT) AS ni,
          |    CAST(count(*) OVER () AS BIGINT) AS cells
          |  FROM c),
          |f AS (SELECT nn, cells,
          |    sum(-(CAST(nij AS DOUBLE) / CAST(nn AS DOUBLE))
          |      * ln(CAST(nij AS DOUBLE) / CAST(ni AS DOUBLE)))
          |      OVER (ORDER BY a, b
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h,
          |    row_number() OVER (ORDER BY a, b) AS rn
          |  FROM e)
          |SELECT nn AS n_transitions, cells AS n_cells,
          |  round(h, 6) AS entropy_rate, round(exp(h), 6) AS perplexity
          |FROM f WHERE rn = cells""".stripMargin)),

    GraftQuery(
      "q_ts_sax",
      "SAX symbolization of the daily series per type — PAA compression " +
        "(mean over consecutive FULL 7-day segments) followed by " +
        "EQUAL-FREQUENCY discretization into the 4-letter alphabet " +
        "a-d, concatenated into the per-type SAX word (the time-series " +
        "indexing/motif primitive). The binning needs no breakpoint " +
        "table at all: symbol = ⌊4·(rank−1)/n⌋ over the (paa, w) total " +
        "order — pure integer arithmetic on ranks, with the PAA means " +
        "(one IEEE division of exact BIGINTs each) only ever COMPARED, " +
        "never hashed. The word assembles via the deterministic " +
        "in-array struct sort (the q_seq_paths device), so no " +
        "single-partition exchange anywhere.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val seg = daily(s, dir)
          .withColumn("d0", min(col("day")).over(Window.partitionBy("event_type")))
          .withColumn("w", ((col("day") - col("d0")) / 7L).cast(LongType))
          .groupBy("event_type", "w")
          .agg(count(lit(1)).as("c"), sum(col("x")).as("sx"))
          .filter(col("c") === 7L)
          .select(col("event_type"), col("w"), (D(col("sx")) / lit(7d)).as("paa"))
        val ranked = seg
          .withColumn("rk", row_number().over(
            Window.partitionBy("event_type").orderBy(col("paa"), col("w")))
            .cast(LongType) - 1)
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
          .withColumn("sym", chr(lit(97L) + (col("rk") * 4 / col("n"))))
        ranked.groupBy("event_type")
          .agg(max(col("n")).as("n_seg"),
            array_join(transform(array_sort(collect_list(struct(col("w"),
              col("sym")))), x => x.getField("sym")), "").as("sax"))
          .orderBy("event_type")
      },
      Some(
        s"""WITH $dailySql,
           |b AS (SELECT event_type, day, x,
           |    min(day) OVER (PARTITION BY event_type) AS d0
           |  FROM daily),
           |seg AS (SELECT event_type,
           |    CAST((day - d0) // 7 AS BIGINT) AS w,
           |    count(*) AS c, CAST(sum(x) AS BIGINT) AS sx
           |  FROM b GROUP BY 1, 2),
           |paa AS (SELECT event_type, w, CAST(sx AS DOUBLE) / 7.0 AS paa
           |  FROM seg WHERE c = 7),
           |r AS (SELECT event_type, w,
           |    CAST(row_number() OVER (PARTITION BY event_type
           |      ORDER BY paa, w) AS BIGINT) - 1 AS rk,
           |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           |  FROM paa),
           |sym AS (SELECT event_type, w, n,
           |    chr(CAST(97 + (rk * 4 // n) AS INTEGER)) AS s
           |  FROM r)
           |SELECT event_type, max(n) AS n_seg,
           |  string_agg(s, '' ORDER BY w) AS sax
           |FROM sym GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_ts_hurst",
      "Hurst exponent estimate of the daily series per type via " +
        "rescaled-range (R/S) analysis at segment sizes 4/8/16 days — " +
        "the long-memory diagnostic (H≈0.5 random walk, H>0.5 trending). " +
        "Determinism ladder: per full L-day segment (count=L guarantees " +
        "contiguity, since the segment id is day arithmetic), the " +
        "cumulative-deviation range R and the population sd are closed " +
        "IEEE trees over exact BIGINT (cum, S, SS); zero-variance " +
        "segments are excluded by the EXACT integer predicate " +
        "SS·L = S² (a float sd==0 test could flip); the per-size mean " +
        "R/S and the 3-point log-log OLS slope both ride ordered " +
        "cumulative windows (the fold device), with the regressor " +
        "log₂L ∈ {2,3,4} as exact literals — no libm on the x side. " +
        "Everything after the day-grain collapse is segment-grain.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val d = daily(s, dir)
          .withColumn("d0", min(col("day")).over(Window.partitionBy("event_type")))
          .withColumn("l", explode(array(lit(4L), lit(8L), lit(16L))))
          .withColumn("seg", call_function("div", col("day") - col("d0"), col("l")))
        val ws = Window.partitionBy("event_type", "l", "seg")
        val wo = ws.orderBy("day")
        val scored = d
          .withColumn("cnt", count(lit(1)).over(ws))
          .withColumn("ss", sum(col("x")).over(ws))
          .withColumn("sxx", sum(col("x") * col("x")).over(ws))
          .withColumn("k", row_number().over(wo).cast(LongType))
          .withColumn("cum", sum(col("x")).over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cdev",
            D(col("cum")) - D(col("k")) * D(col("ss")) / D(col("l")))
          .withColumn("rng", max(col("cdev")).over(ws) - min(col("cdev")).over(ws))
          .filter(col("cnt") === col("l") && col("k") === col("l") &&
            col("sxx") * col("l") =!= col("ss") * col("ss"))
          .select(col("event_type"), col("l"), col("seg"),
            // the integer filter above excludes EXACT zero variance, but a
            // tiny variance can still round to ≤0 in doubles (sxx/l nearly
            // cancelling (ss/l)²) — unguarded, DuckDB RAISES on the sqrt
            // where Spark yields NaN (class 22); the guarded pair defines
            // such segments' R/S as NULL on both engines
            graft.Exact.divNZ(col("rng"),
              graft.Exact.sqrtNN(D(col("sxx")) / D(col("l")) -
                (D(col("ss")) / D(col("l"))) * (D(col("ss")) / D(col("l")))))
              .as("rs"))
        val wl = Window.partitionBy("event_type", "l").orderBy("seg")
        val meanRs = scored
          .withColumn("cumrs", sum(col("rs")).over(
            wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rn", row_number().over(wl).cast(LongType))
          .withColumn("nseg", count(lit(1)).over(Window.partitionBy("event_type", "l")))
          .filter(col("rn") === col("nseg"))
          .select(col("event_type"), col("l"),
            (col("cumrs") / D(col("nseg"))).as("mrs"))
        val x = when(col("l") === 4L, lit(2d)).when(col("l") === 8L, lit(3d))
          .otherwise(lit(4d))
        val wt = Window.partitionBy("event_type").orderBy("l")
        val folded = meanRs
          .withColumn("x", x)
          .withColumn("sy", sum(log(col("mrs"))).over(
            wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("sxy", sum(col("x") * log(col("mrs"))).over(
            wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rn", row_number().over(wt).cast(LongType))
        val slope = folded.filter(col("rn") === 3L)
          .select(col("event_type").as("et"),
            // (3·Σxy − Σx·Σy)/(3·Σxx − (Σx)²) with Σx=9, Σxx=29 exact;
            // ln2 divisor converts the natural-log fold to the log₂ grid
            (((lit(3d) * col("sxy") - lit(9d) * col("sy")) / lit(6d)) /
              log(lit(2d))).as("h"))
        meanRs.groupBy("event_type")
          .agg(round(min(when(col("l") === 4L, col("mrs"))), 6).as("rs4"),
            round(min(when(col("l") === 8L, col("mrs"))), 6).as("rs8"),
            round(min(when(col("l") === 16L, col("mrs"))), 6).as("rs16"))
          .join(slope, col("event_type") === col("et"))
          .select(col("event_type"), col("rs4"), col("rs8"), col("rs16"),
            round(col("h"), 6).as("hurst"))
          .orderBy("event_type")
      },
      Some(
        s"""WITH $dailySql,
           |b AS (SELECT event_type, day, x,
           |    min(day) OVER (PARTITION BY event_type) AS d0
           |  FROM daily),
           |e AS (SELECT event_type, day, x, d0, CAST(l.l AS BIGINT) AS l
           |  FROM b CROSS JOIN (SELECT unnest([4, 8, 16]) AS l) l),
           |g AS (SELECT event_type, day, x, l, (day - d0) // l AS seg FROM e),
           |t AS (SELECT event_type, l, seg, day, x,
           |    CAST(count(*) OVER ws AS BIGINT) AS cnt,
           |    CAST(sum(x) OVER ws AS BIGINT) AS ss,
           |    CAST(sum(x * x) OVER ws AS BIGINT) AS sxx,
           |    CAST(row_number() OVER wo AS BIGINT) AS k,
           |    CAST(sum(x) OVER (wo ROWS BETWEEN UNBOUNDED PRECEDING
           |      AND CURRENT ROW) AS BIGINT) AS cum
           |  FROM g
           |  WINDOW ws AS (PARTITION BY event_type, l, seg),
           |    wo AS (PARTITION BY event_type, l, seg ORDER BY day)),
           |cd AS (SELECT event_type, l, seg, cnt, ss, sxx, k,
           |    CAST(cum AS DOUBLE) - CAST(k AS DOUBLE) * CAST(ss AS DOUBLE)
           |      / CAST(l AS DOUBLE) AS cdev
           |  FROM t),
           |rngd AS (SELECT event_type, l, seg, cnt, ss, sxx, k,
           |    max(cdev) OVER ws - min(cdev) OVER ws AS rng
           |  FROM cd
           |  WINDOW ws AS (PARTITION BY event_type, l, seg)),
           |rs AS (SELECT event_type, l, seg,
           |    ${graft.Exact.divNZSql("rng", graft.Exact.sqrtNNSql(
                 "CAST(sxx AS DOUBLE) / CAST(l AS DOUBLE)" +
                 " - (CAST(ss AS DOUBLE) / CAST(l AS DOUBLE))" +
                 " * (CAST(ss AS DOUBLE) / CAST(l AS DOUBLE))"))} AS rs
           |  FROM rngd
           |  WHERE cnt = l AND k = l AND sxx * l <> ss * ss),
           |mrs AS (SELECT event_type, l, mrs FROM (
           |  SELECT event_type, l, seg,
           |    sum(rs) OVER (wl ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      / CAST(count(*) OVER (PARTITION BY event_type, l) AS DOUBLE) AS mrs,
           |    row_number() OVER wl AS rn,
           |    count(*) OVER (PARTITION BY event_type, l) AS nseg
           |  FROM rs
           |  WINDOW wl AS (PARTITION BY event_type, l ORDER BY seg))
           |  WHERE rn = nseg),
           |sl AS (SELECT event_type, h FROM (
           |  SELECT event_type,
           |    (((3.0 * sum((CASE l WHEN 4 THEN 2.0 WHEN 8 THEN 3.0 ELSE 4.0 END)
           |        * ln(mrs)) OVER (wt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      - 9.0 * sum(ln(mrs)) OVER (wt ROWS BETWEEN UNBOUNDED PRECEDING
           |        AND CURRENT ROW)) / 6.0) / ln(2.0)) AS h,
           |    row_number() OVER wt AS rn
           |  FROM mrs
           |  WINDOW wt AS (PARTITION BY event_type ORDER BY l))
           |  WHERE rn = 3)
           |SELECT m.event_type,
           |  round(min(CASE WHEN l = 4 THEN mrs END), 6) AS rs4,
           |  round(min(CASE WHEN l = 8 THEN mrs END), 6) AS rs8,
           |  round(min(CASE WHEN l = 16 THEN mrs END), 6) AS rs16,
           |  round(max(sl.h), 6) AS hurst
           |FROM mrs m JOIN sl ON m.event_type = sl.event_type
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_ts_m4",
      "M4 downsampling of the money series per type — first/last/min/max " +
        "cents per 6-hour bucket, the error-free line-chart reduction " +
        "(M4 preserves the exact rendered envelope at any zoom; LTTB and " +
        "friends are lossy AND sequential). Spark shape: ONE hash " +
        "aggregation with four min/max(struct) arguments — the argmax " +
        "discipline; no window, no sort, fully map-side combinable, " +
        "which is why M4 is the downsample that scales (the oracle " +
        "spells the same four tie-broken picks as window row_numbers — " +
        "a genuinely different formulation). All-integer: epoch-micros " +
        "buckets, cents values, (tsm, event_id) total order.",
      (s, dir) => {
        val bw = 21600000000L // 6 h in micros
        val e = table(s, dir, "events")
          .select(col("event_type"),
            graft.Ts.epochMicros(col("ts")).as("tsm"), col("event_id"),
            floor(col("value") * 100 + lit(0.5d)).cast(LongType).as("c"))
          .withColumn("bkt", call_function("div", col("tsm"), lit(bw)))
        // The picks stay HASH-aggregable by construction: min/max(c) need no
        // tie-break at all (only the VALUE is emitted), and first/last order
        // by ONE packed BIGINT — (tsm − bucket_start)·2^28 + event_id, exact
        // because the in-bucket offset is < 2^35 µs and ids are < 2^28. The
        // id-domain precondition is ENFORCED, not assumed: an event_id at or
        // above 2^28 raises at runtime instead of silently mis-ordering the
        // first/last picks (widen the multiplier with the id domain then).
        // Any STRUCT-ordered min/max/min_by silently plans a SortAggregate,
        // sorting every group (pinned in PlanShapeSpec).
        val ord = when(col("event_id") < lit(1L << 28),
          (col("tsm") - col("bkt") * lit(bw)) * lit(1L << 28) + col("event_id"))
          .otherwise(raise_error(lit(
            "q_ts_m4: event_id >= 2^28 overflows the packed first/last " +
              "ordering key — widen the multiplier to cover the id domain")))
        e.groupBy("event_type", "bkt")
          .agg(count(lit(1)).as("n"),
            min_by(col("c"), ord).as("first_c"),
            max_by(col("c"), ord).as("last_c"),
            min(col("c")).as("min_c"),
            max(col("c")).as("max_c"))
          .orderBy("event_type", "bkt")
      },
      Some(
        """WITH e AS (SELECT event_type, epoch_us(ts) AS tsm, event_id,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
          |  FROM events),
          |b AS (SELECT event_type, tsm // 21600000000 AS bkt, tsm, event_id, c
          |  FROM e),
          |r AS (SELECT event_type, bkt, c,
          |    row_number() OVER (PARTITION BY event_type, bkt
          |      ORDER BY tsm, event_id) AS rf,
          |    row_number() OVER (PARTITION BY event_type, bkt
          |      ORDER BY tsm DESC, event_id DESC) AS rl,
          |    row_number() OVER (PARTITION BY event_type, bkt
          |      ORDER BY c, tsm, event_id) AS rmin,
          |    row_number() OVER (PARTITION BY event_type, bkt
          |      ORDER BY c DESC, tsm DESC, event_id DESC) AS rmax,
          |    count(*) OVER (PARTITION BY event_type, bkt) AS n
          |  FROM b)
          |SELECT event_type, bkt, max(n) AS n,
          |  min(CASE WHEN rf = 1 THEN c END) AS first_c,
          |  min(CASE WHEN rl = 1 THEN c END) AS last_c,
          |  min(CASE WHEN rmin = 1 THEN c END) AS min_c,
          |  min(CASE WHEN rmax = 1 THEN c END) AS max_c
          |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    GraftQuery(
      "q_ts_session_native",
      "30-min sessionization through Spark's NATIVE batch session_window() " +
        "operator (SessionWindowing + MergingSessionsExec — a genuinely " +
        "different execution path from q_ts_session's gaps-and-islands " +
        "window rewrite, and the same operator the streaming pipeline " +
        "runs with state): per-user session count + exact cents mass. " +
        "The oracle is the relational break-flag formulation with the " +
        "native operator's boundary rule (an event exactly gap seconds " +
        "after the previous starts a NEW session — sessions [t, t+gap) " +
        "merge only on strict overlap, so the break is >= 1800 where the " +
        "island rewrite uses > 1800), which makes this gate the " +
        "machine-checked spec of that off-by-boundary difference. One " +
        "shuffle on user_id; session merging is per-partition state, " +
        "exactly the shape that scales.",
      (s, dir) => {
        table(s, dir, "events")
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n"),
            graft.Exact.moneySum(col("value")).as("cents"))
          .select(col("user_id"), col("sw.start").as("ws"),
            col("sw.end").as("we"), col("n"), col("cents"))
          .orderBy("user_id", "ws")
      },
      Some(
        """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
          |    value FROM events),
          |g AS (SELECT user_id, ts, event_id, value, CASE WHEN
          |  epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000000
          |  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS brk
          |  FROM e),
          |s AS (SELECT user_id, ts, value,
          |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g)
          |SELECT user_id, min(ts) AS ws,
          |  max(ts) + INTERVAL 30 MINUTE AS we, count(*) AS n, """.stripMargin +
          graft.Exact.moneySumSql("value") +
          """ AS cents
          |FROM s GROUP BY user_id, sid
          |ORDER BY user_id, ws""".stripMargin)),

    GraftQuery(
      "q_ts_tumbling_native",
      "Hourly tumbling aggregation through Spark's NATIVE window() " +
        "function (the TimeWindow expression — the same operator the " +
        "streaming pipeline runs; q_ts_tumbling's date_trunc form is the " +
        "manual rewrite): count + exact cents per (hour window, type), " +
        "window START reported as its NTZ-safe epoch-seconds integer. " +
        "TimeWindow lowers to the same integer epoch arithmetic the " +
        "oracle spells directly (epoch − epoch mod 3600), so the gate " +
        "pins that lowering. One hash aggregation, map-side combinable; " +
        "the window struct is computed per row with no fan-out (tumbling " +
        "⇒ exactly one window per event).",
      (s, dir) => {
        table(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            graft.Exact.moneySum(col("value")).as("cents"))
          .select(
            graft.Ts.epochSec(col("w.start")).cast(LongType).as("hr_start"),
            col("event_type"), col("n"), col("cents"))
          .orderBy("hr_start", "event_type")
      },
      Some(
        """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
          |  FROM events),
          |g AS (SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
          |      AS hr_start,
          |    event_type, value FROM e)
          |SELECT hr_start, event_type, count(*) AS n, """.stripMargin +
          graft.Exact.moneySumSql("value") +
          """ AS cents
          |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    GraftQuery(
      "q_seq_stationary",
      "Stationary distribution of the event-type Markov chain via THREE " +
        "integer fixed-point power steps over the transition-cell " +
        "relation (π·P iterated from uniform, the q_graph_pagerank " +
        "discipline on q_seq_markov's matrix): each step sums " +
        "⌊π(a)·n_ab/n_a·⌋ per target state, then renormalizes to the " +
        "2^20 scale by ⌊π·2^20/Σπ⌋ — every operation exact BIGINT, so " +
        "the fixpoint is bit-identical anywhere. Reported next to the " +
        "EMPIRICAL state frequency: their agreement (the chain is " +
        "ergodic and the data is near-stationary) is the analytic " +
        "payload, and both columns are closed IEEE divisions of exact " +
        "integers. The matrix is ≤|types|² cells — the iteration " +
        "touches the corpus once, for the transition count.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val cells = table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("a"))
          .withColumn("b", lead(col("a"), 1).over(w))
          .filter(col("b").isNotNull)
          .groupBy("a", "b").agg(count(lit(1)).as("nij"))
          .withColumn("ni", sum(col("nij")).over(Window.partitionBy("a")))
          .localCheckpoint(true)
        val states = cells.select(col("a").as("state")).distinct()
        val wAll = Window.partitionBy(lit(1))
        def step(p: org.apache.spark.sql.DataFrame) = {
          val raw = cells
            .join(broadcast(p), col("a") === col("state"))
            .groupBy(col("b").as("state"))
            .agg(sum(call_function("div", col("pi") * col("nij"), col("ni")))
              .as("praw"))
          raw.withColumn("tot", sum(col("praw")).over(wAll))
            .select(col("state"),
              call_function("div", col("praw") * lit(1048576L), col("tot"))
                .as("pi"))
        }
        val p0 = states.select(col("state"), lit(1048576L).as("pi"))
        val p3 = step(step(step(p0)))
        val emp = cells.groupBy(col("a").as("st"))
          .agg(sum(col("nij")).as("na"))
          .withColumn("nn", sum(col("na")).over(wAll))
        p3.join(emp, col("state") === col("st"))
          .select(col("state"),
            round(D(col("pi")) / lit(1048576d), 6).as("stationary"),
            round(D(col("na")) / D(col("nn")), 6).as("empirical"))
          .orderBy("state")
      },
      Some(
        """WITH t AS (SELECT user_id, event_type AS a,
          |    lead(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS b
          |  FROM events),
          |c0 AS (SELECT a, b, count(*) AS nij FROM t
          |  WHERE b IS NOT NULL GROUP BY 1, 2),
          |cells AS (SELECT a, b, nij,
          |    CAST(sum(nij) OVER (PARTITION BY a) AS BIGINT) AS ni
          |  FROM c0),
          |p0 AS (SELECT DISTINCT a AS state, CAST(1048576 AS BIGINT) AS pi
          |  FROM cells),
          |r1 AS (SELECT c.b AS state,
          |    CAST(sum((p.pi * c.nij) // c.ni) AS BIGINT) AS praw
          |  FROM cells c JOIN p0 p ON c.a = p.state GROUP BY 1),
          |p1 AS (SELECT state,
          |    CAST((praw * 1048576) // (CAST(sum(praw) OVER () AS BIGINT))
          |      AS BIGINT) AS pi FROM r1),
          |r2 AS (SELECT c.b AS state,
          |    CAST(sum((p.pi * c.nij) // c.ni) AS BIGINT) AS praw
          |  FROM cells c JOIN p1 p ON c.a = p.state GROUP BY 1),
          |p2 AS (SELECT state,
          |    CAST((praw * 1048576) // (CAST(sum(praw) OVER () AS BIGINT))
          |      AS BIGINT) AS pi FROM r2),
          |r3 AS (SELECT c.b AS state,
          |    CAST(sum((p.pi * c.nij) // c.ni) AS BIGINT) AS praw
          |  FROM cells c JOIN p2 p ON c.a = p.state GROUP BY 1),
          |p3 AS (SELECT state,
          |    CAST((praw * 1048576) // (CAST(sum(praw) OVER () AS BIGINT))
          |      AS BIGINT) AS pi FROM r3),
          |emp AS (SELECT a AS st, CAST(sum(nij) AS BIGINT) AS na,
          |    CAST(sum(sum(nij)) OVER () AS BIGINT) AS nn
          |  FROM cells GROUP BY 1)
          |SELECT p3.state,
          |  round(CAST(p3.pi AS DOUBLE) / 1048576.0, 6) AS stationary,
          |  round(CAST(emp.na AS DOUBLE) / CAST(emp.nn AS DOUBLE), 6)
          |    AS empirical
          |FROM p3 JOIN emp ON p3.state = emp.st ORDER BY p3.state""".stripMargin)),

    GraftQuery(
      "q_ts_new_returning",
      "Daily revenue split between first-day and returning users — the " +
        "acquisition-vs-retention ledger that prices q_ts_growth's user " +
        "counts in money: a purchase is NEW revenue iff it lands on its " +
        "user's first active day (min over the user window — one keyed " +
        "pass), exact cents both sides, share one division. The " +
        "conservation identity new+returning = daily total is built in " +
        "(the two legs partition the rows).",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val e = table(s, dir, "events")
          .select(col("user_id"),
            graft.Ts.dayBucket(col("ts"))
              .as("day"),
            floor(col("value") * 100 + lit(0.5d)).cast(LongType).as("cents"))
          .withColumn("d0", min(col("day")).over(
            Window.partitionBy("user_id")))
        e.groupBy("day")
          .agg(
            sum(when(col("day") === col("d0"), col("cents")).otherwise(0L))
              .as("new_cents"),
            sum(when(col("day") =!= col("d0"), col("cents")).otherwise(0L))
              .as("ret_cents"),
            sum(when(col("day") === col("d0"), 1L).otherwise(0L))
              .as("n_new_events"))
          .select(col("day"), col("new_cents"), col("ret_cents"),
            col("n_new_events"),
            round(D(col("new_cents")) /
              D(col("new_cents") + col("ret_cents")), 6).as("new_share"))
          .orderBy("day")
      },
      Some(
        """WITH e AS (SELECT user_id,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events),
          |f AS (SELECT user_id, day, cents,
          |    min(day) OVER (PARTITION BY user_id) AS d0
          |  FROM e)
          |SELECT day,
          |  CAST(sum(CASE WHEN day = d0 THEN cents ELSE 0 END) AS BIGINT)
          |    AS new_cents,
          |  CAST(sum(CASE WHEN day <> d0 THEN cents ELSE 0 END) AS BIGINT)
          |    AS ret_cents,
          |  CAST(sum(CASE WHEN day = d0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_new_events,
          |  round(CAST(sum(CASE WHEN day = d0 THEN cents ELSE 0 END) AS DOUBLE)
          |    / CAST(sum(cents) AS DOUBLE), 6) AS new_share
          |FROM f GROUP BY day ORDER BY day""".stripMargin)),

    GraftQuery(
      "q_ts_iat",
      "Inter-arrival-time percentiles per type (p50/p90/p99 in whole " +
        "seconds) — the latency-style SLO panel over event arrivals. " +
        "Gaps are computed WITHIN (type, day) partitions (day-bounded " +
        "sorts — a whole-type timeline would serialize through one task " +
        "at corpus scale; the day-boundary gap loss is the documented " +
        "trade), quantized to integer seconds so the percentile domain " +
        "is value-grain (≤86400 cells/type however large the corpus), " +
        "and each percentile is the exact order statistic min gap with " +
        "cum ≥ 1+⌊(n−1)p/100⌋ — all integer, no interpolation.",
      (s, dir) => {
        val wd = Window.partitionBy("event_type", "day")
          .orderBy(col("tsm"), col("event_id"))
        val gaps = table(s, dir, "events")
          .select(col("event_type"),
            graft.Ts.dayBucket(col("ts"))
              .as("day"),
            graft.Ts.epochMicros(col("ts")).as("tsm"), col("event_id"))
          .withColumn("prev", lag(col("tsm"), 1).over(wd))
          .filter(col("prev").isNotNull)
          .select(col("event_type"),
            call_function("div", col("tsm") - col("prev"), lit(1000000L))
              .as("g"))
        val cells = gaps.groupBy("event_type", "g")
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(
            Window.partitionBy("event_type").orderBy("g")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", sum(col("c")).over(
            Window.partitionBy("event_type")))
        def pct(p: Int) = min(when(col("cum") >= lit(1L) +
          call_function("div", (col("n") - 1) * p, lit(100L)), col("g")))
        cells.groupBy("event_type")
          .agg(max(col("n")).as("n_gaps"),
            pct(50).as("p50_s"), pct(90).as("p90_s"), pct(99).as("p99_s"))
          .orderBy("event_type")
      },
      Some(
        """WITH e AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
          |    epoch_us(ts) AS tsm, event_id
          |  FROM events),
          |g0 AS (SELECT event_type, day, tsm, event_id,
          |    lag(tsm) OVER (PARTITION BY event_type, day
          |      ORDER BY tsm, event_id) AS prev
          |  FROM e),
          |g AS (SELECT event_type, (tsm - prev) // 1000000 AS g
          |  FROM g0 WHERE prev IS NOT NULL),
          |cells AS (SELECT event_type, g, count(*) AS c
          |  FROM g GROUP BY 1, 2),
          |a AS (SELECT event_type, g,
          |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY g
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |      AS cum,
          |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
          |  FROM cells)
          |SELECT event_type, max(n) AS n_gaps,
          |  min(CASE WHEN cum >= 1 + ((n - 1) * 50) // 100 THEN g END) AS p50_s,
          |  min(CASE WHEN cum >= 1 + ((n - 1) * 90) // 100 THEN g END) AS p90_s,
          |  min(CASE WHEN cum >= 1 + ((n - 1) * 99) // 100 THEN g END) AS p99_s
          |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_ts_profile_divergence",
      "Jensen–Shannon divergence between the weekday and weekend " +
        "hour-of-day profiles per type — the distribution-shift reading " +
        "for BEHAVIORAL shape (does weekend traffic redistribute across " +
        "the day, not just shrink?). Both profiles are exact 24-cell " +
        "count vectors; every ln argument is a ratio of cross-multiplied " +
        "counts with each factor cast to double FIRST (exact below 2^53 " +
        "per product, and no 2^63 wrap/overflow at any scale), and the one " +
        "sum OF float terms rides the hour-ordered window per type. " +
        "JS is symmetric and bounded by ln 2 — reported alongside its " +
        "normalized [0,1] form.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val cells = table(s, dir, "events")
          .select(col("event_type"),
            graft.Ts.dayBucket(col("ts"))
              .as("day"),
            pmod(floor(graft.Ts.epochSec(col("ts")) / lit(3600d))
              .cast(LongType), lit(24L)).as("hr"))
          .withColumn("wknd", (pmod(col("day") + 3, lit(7L)) >= 5L)
            .cast(LongType))
          .groupBy("event_type", "hr")
          .agg(sum(when(col("wknd") === 0L, 1L).otherwise(0L)).as("a"),
            sum(when(col("wknd") === 1L, 1L).otherwise(0L)).as("b"))
        val wt = Window.partitionBy("event_type")
        val ord = wt.orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // p = a/na, q = b/nb; m = (p+q)/2. Terms spelled over integers:
        // p·ln(2p/(p+q)) with p/q expanded to a·nb etc. so each ln argument
        // is one division of exact products
        val p = D(col("a")) / D(col("na"))
        val q = D(col("b")) / D(col("nb"))
        val termA = when(col("a") > 0,
          p * log(lit(2d) * (D(col("a")) * D(col("nb"))) /
            (D(col("a")) * D(col("nb")) + D(col("b")) * D(col("na")))))
          .otherwise(lit(0d))
        val termB = when(col("b") > 0,
          q * log(lit(2d) * (D(col("b")) * D(col("na"))) /
            (D(col("a")) * D(col("nb")) + D(col("b")) * D(col("na")))))
          .otherwise(lit(0d))
        cells
          .withColumn("na", sum(col("a")).over(wt))
          .withColumn("nb", sum(col("b")).over(wt))
          .withColumn("cells", count(lit(1)).over(wt))
          .withColumn("js", sum((termA + termB) / lit(2d)).over(ord))
          .withColumn("rn", row_number().over(wt.orderBy("hr")).cast(LongType))
          .filter(col("rn") === col("cells"))
          .select(col("event_type"), col("na").as("n_weekday"),
            col("nb").as("n_weekend"),
            round(col("js"), 6).as("js_nats"),
            round(col("js") / log(lit(2d)), 6).as("js_normalized"))
          .orderBy("event_type")
      },
      Some(
        """WITH e AS (SELECT event_type,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
          |    ((CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24) + 24) % 24 AS hr
          |  FROM events),
          |cells AS (SELECT event_type, hr,
          |    CAST(sum(CASE WHEN (((day + 3) % 7) + 7) % 7 >= 5 THEN 0 ELSE 1 END) AS BIGINT) AS a,
          |    CAST(sum(CASE WHEN (((day + 3) % 7) + 7) % 7 >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS b
          |  FROM e GROUP BY 1, 2),
          |t AS (SELECT event_type, hr, a, b,
          |    CAST(sum(a) OVER (PARTITION BY event_type) AS BIGINT) AS na,
          |    CAST(sum(b) OVER (PARTITION BY event_type) AS BIGINT) AS nb,
          |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS cells
          |  FROM cells),
          |f AS (SELECT event_type, na, nb, cells,
          |    sum(((CASE WHEN a > 0 THEN (CAST(a AS DOUBLE) / CAST(na AS DOUBLE))
          |        * ln(2.0 * (CAST(a AS DOUBLE) * CAST(nb AS DOUBLE))
          |          / (CAST(a AS DOUBLE) * CAST(nb AS DOUBLE)
          |            + CAST(b AS DOUBLE) * CAST(na AS DOUBLE))) ELSE 0.0 END)
          |      + (CASE WHEN b > 0 THEN (CAST(b AS DOUBLE) / CAST(nb AS DOUBLE))
          |        * ln(2.0 * (CAST(b AS DOUBLE) * CAST(na AS DOUBLE))
          |          / (CAST(a AS DOUBLE) * CAST(nb AS DOUBLE)
          |            + CAST(b AS DOUBLE) * CAST(na AS DOUBLE))) ELSE 0.0 END)) / 2.0)
          |      OVER (PARTITION BY event_type ORDER BY hr
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS js,
          |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
          |  FROM t)
          |SELECT event_type, na AS n_weekday, nb AS n_weekend,
          |  round(js, 6) AS js_nats,
          |  round(js / ln(2.0), 6) AS js_normalized
          |FROM f WHERE rn = cells ORDER BY event_type""".stripMargin))
  )
}
