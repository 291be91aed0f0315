package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Rank-based and resampling statistics (SURVEY.md §2 round-12 additions).
  *
  * The family completes the classical-inference shelf next to
  * t/chi²/U/runs/ANOVA/Levene: the two rank correlations (Spearman,
  * Kendall τ-b), the jackknife for a genuinely non-linear statistic (the
  * ratio estimator), an EXACT-integer permutation test, and a
  * hash-deterministic bootstrap CI. House disciplines throughout:
  *
  *  - Everything heavy collapses to the day-grain relation first (≤ a few
  *    hundred rows per type at ANY corpus size — the corpus is touched by
  *    one count), so pairwise / B-fold fan-outs are bounded by days² or
  *    B·days, never by rows².
  *  - Sufficient statistics are exact BIGINTs; IEEE appears only in final
  *    closed-form expression trees both engines evaluate identically, or in
  *    per-row divisions of exact integers (bit-identical on both engines).
  *  - Where a sum OF IEEE terms is unavoidable (jackknife pseudo-values),
  *    it rides the day-ordered cumulative window — the zipf/entropy fold
  *    device — so both engines fold in the identical order.
  *  - Resampling randomness is md5-derived (the q_sample_* discipline): no
  *    RNG, so the same resample set materializes on any engine, any
  *    partitioning, any retry.
  */
object RankStats {
  import Tables.table

  /** Day-grain count series per event type: the shared slim input of the
    * daily-series family here AND in TimeSeries (one copy of the relation
    * both files previously inlined per query). */
  private[operators] def daily(s: org.apache.spark.sql.SparkSession, dir: String) =
    table(s, dir, "events")
      .groupBy(col("event_type"),
        graft.Ts.dayBucket(col("ts"))
          .as("day"))
      .agg(count(lit(1)).as("x"))

  private[operators] val dailySql =
    """daily AS (
      |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    count(*) AS x
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** The click/purchase paired day series (inner join on day). */
  private def pairedDays(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = daily(s, dir)
    d.filter(col("event_type") === "click").select(col("day"), col("x"))
      .join(d.filter(col("event_type") === "purchase")
        .select(col("day").as("dayb"), col("x").as("y")),
        col("day") === col("dayb"))
      .select(col("day"), col("x"), col("y"))
  }

  private val pairedSql =
    s"""$dailySql,
       |paired AS (
       |  SELECT a.day, a.x, b.x AS y
       |  FROM daily a JOIN daily b ON a.day = b.day
       |  WHERE a.event_type = 'click' AND b.event_type = 'purchase')""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_stats_spearman",
      "Spearman rank correlation between the click and purchase daily " +
        "series — the monotone-association reading that q_ts_ccf's " +
        "lag-0 Pearson misses when the relation is nonlinear. Average " +
        "ranks are carried as INTEGER half-units (2·avgrank = " +
        "2·min_rank + ties − 1, the Mann-Whitney half-rank discipline), " +
        "so ALL sufficient statistics are exact BIGINTs over the " +
        "day-grain paired relation and the only IEEE is the closed-form " +
        "Pearson tree over half-ranks at the end. Two rank windows ride " +
        "the ≤days-row relation; the corpus is touched by one count.",
      (s, dir) => {
        def halfRank(v: String): org.apache.spark.sql.Column =
          rank().over(Window.orderBy(col(v))).cast(LongType) * 2 +
            count(lit(1)).over(Window.partitionBy(col(v))).cast(LongType) - 1
        val r = graft.Exact.pearson(col("n"), col("sx"), col("sy"),
          col("sxy"), col("sxx"), col("syy"))
        pairedDays(s, dir)
          .select(halfRank("x").as("rx"), halfRank("y").as("ry"))
          .agg(count(lit(1)).as("n"),
            sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
            sum(col("rx") * col("ry")).as("sxy"),
            sum(col("rx") * col("rx")).as("sxx"),
            sum(col("ry") * col("ry")).as("syy"))
          .select(col("n"), round(r, 6).as("rho"))
      },
      Some(
        s"""WITH $pairedSql,
           |r AS (SELECT
           |    CAST(2 * rank() OVER (ORDER BY x)
           |      + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
           |    CAST(2 * rank() OVER (ORDER BY y)
           |      + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
           |  FROM paired),
           |a AS (SELECT count(*) AS n,
           |    CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
           |    CAST(sum(rx * ry) AS BIGINT) AS sxy,
           |    CAST(sum(rx * rx) AS BIGINT) AS sxx,
           |    CAST(sum(ry * ry) AS BIGINT) AS syy
           |  FROM r)
           |SELECT n,
           |  round(${graft.Exact.pearsonSql("n", "sx", "sy", "sxy", "sxx", "syy")},
           |    6) AS rho
           |FROM a""".stripMargin)),

    GraftQuery(
      "q_stats_kendall",
      "Kendall τ-b between the click and purchase daily series — the " +
        "pairwise-concordance rank correlation whose tie corrections " +
        "Spearman ignores. Pair generation self-joins the DAY-GRAIN " +
        "paired relation (days²-bounded at any corpus size); concordant / " +
        "discordant / tie counts are pure exact integers (the comparison " +
        "is on the sign of an integer product, so no float is ever " +
        "compared), and τ-b = (C−D)/√((C+D+Tx)(C+D+Ty)) is one closed " +
        "IEEE tree over five BIGINTs.",
      (s, dir) => {
        val p = pairedDays(s, dir)
        val a = p.select(col("day").as("d1"), col("x").as("x1"), col("y").as("y1"))
        val b = p.select(col("day").as("d2"), col("x").as("x2"), col("y").as("y2"))
        def D(c: String) = col(c).cast(DoubleType)
        val dx = col("x2") - col("x1")
        val dy = col("y2") - col("y1")
        a.join(b, col("d1") < col("d2"))
          .agg(
            sum(when(dx * dy > 0, 1L).otherwise(0L)).as("c"),
            sum(when(dx * dy < 0, 1L).otherwise(0L)).as("d"),
            sum(when(dx === 0 && dy =!= 0, 1L).otherwise(0L)).as("tx"),
            sum(when(dy === 0 && dx =!= 0, 1L).otherwise(0L)).as("ty"),
            count(lit(1)).as("n_pairs"))
          .select(col("n_pairs"), col("c"), col("d"),
            // class-22 guard: an ALL-TIED series (every pair tied on x, or
            // on y) zeroes a sqrt factor — tau_b is undefined there, NULL
            // on both engines (was Spark 0/0 NaN vs oracle NULL)
            round(graft.Exact.divNZ(D("c") - D("d"),
              sqrt(D("c") + D("d") + D("tx")) *
                sqrt(D("c") + D("d") + D("ty"))), 6).as("tau_b"))
      },
      Some(
        s"""WITH $pairedSql,
           |pp AS (SELECT
           |    CAST(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
           |    CAST(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
           |    CAST(sum(CASE WHEN b.x = a.x AND b.y <> a.y THEN 1 ELSE 0 END) AS BIGINT) AS tx,
           |    CAST(sum(CASE WHEN b.y = a.y AND b.x <> a.x THEN 1 ELSE 0 END) AS BIGINT) AS ty,
           |    count(*) AS n_pairs
           |  FROM paired a JOIN paired b ON a.day < b.day)
           |SELECT n_pairs, c, d,
           |  round(${graft.Exact.divNZSql(
             "CAST(c AS DOUBLE) - CAST(d AS DOUBLE)",
             "sqrt(CAST(c AS DOUBLE) + CAST(d AS DOUBLE) + CAST(tx AS DOUBLE))" +
             " * sqrt(CAST(c AS DOUBLE) + CAST(d AS DOUBLE) + CAST(ty AS DOUBLE))")},
           |    6) AS tau_b
           |FROM pp""".stripMargin)),

    GraftQuery(
      "q_stats_jackknife",
      "Jackknife standard error of the purchases-per-click RATIO " +
        "estimator over the paired day series — the resampling method on " +
        "the statistic where it is NOT redundant (the jackknife of a " +
        "plain mean collapses to the classical SE; the ratio estimator's " +
        "does not). Each leave-one-day-out pseudo-value " +
        "θᵢ = (Sy−yᵢ)/(Sx−xᵢ) is ONE IEEE division of exact BIGINTs " +
        "(bit-identical on both engines); the two sums OF pseudo-values " +
        "(Σθ, Σθ²) ride the day-ordered cumulative window so both " +
        "engines fold identically, and SE = √((n−1)/n · (Σθ² − (Σθ)²/n)) " +
        "is the final closed tree. Day-grain only.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val tot = Window.partitionBy(lit(1))
        val ord = Window.partitionBy(lit(1)).orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // class-22 guards: a 1-day series makes the leave-one-out
        // denominator exactly 0 (Spark 0/0 NaN vs oracle NULL), and
        // CONSTANT pseudo-values can round Σθ² − (Σθ)²/n to −ε — a DuckDB
        // sqrt error. Undefined → NULL on both engines.
        val theta = graft.Exact.divNZ(
          D(col("sy") - col("y")), D(col("sx") - col("x")))
        pairedDays(s, dir)
          .withColumn("n", count(lit(1)).over(tot))
          .withColumn("sx", sum(col("x")).over(tot))
          .withColumn("sy", sum(col("y")).over(tot))
          .withColumn("theta", theta)
          .withColumn("st", sum(col("theta")).over(ord))
          .withColumn("stt", sum(col("theta") * col("theta")).over(ord))
          .withColumn("rn", row_number().over(
            Window.partitionBy(lit(1)).orderBy("day")).cast(LongType))
          .filter(col("rn") === col("n"))
          .select(col("n"),
            round(D(col("sy")) / D(col("sx")), 6).as("ratio"),
            round(graft.Exact.sqrtNN((D(col("n")) - lit(1d)) / D(col("n")) *
              (col("stt") - col("st") * col("st") / D(col("n")))), 6)
              .as("jk_se"))
      },
      Some(
        s"""WITH $pairedSql,
           |t AS (SELECT day, x, y,
           |    CAST(count(*) OVER () AS BIGINT) AS n,
           |    CAST(sum(x) OVER () AS BIGINT) AS sx,
           |    CAST(sum(y) OVER () AS BIGINT) AS sy
           |  FROM paired),
           |th AS (SELECT day, n, sx, sy,
           |    ${graft.Exact.divNZSql("CAST(sy - y AS DOUBLE)",
                "CAST(sx - x AS DOUBLE)")} AS theta
           |  FROM t),
           |f AS (SELECT n, sx, sy,
           |    sum(theta) OVER (ORDER BY day
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st,
           |    sum(theta * theta) OVER (ORDER BY day
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS stt,
           |    row_number() OVER (ORDER BY day) AS rn
           |  FROM th)
           |SELECT n,
           |  round(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS ratio,
           |  round(${graft.Exact.sqrtNNSql("(CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)" +
                " * (stt - st * st / CAST(n AS DOUBLE))")}, 6) AS jk_se
           |FROM f WHERE rn = n""".stripMargin)),

    GraftQuery(
      "q_stats_permutation",
      "EXACT-integer permutation test for the weekend-vs-weekday mean " +
        "daily count per type: 200 md5-derived label permutations (each " +
        "keeps the true weekend-group size, so it is a genuine " +
        "permutation, not a Bernoulli relabeling), with the mean " +
        "difference compared through cross-multiplication — " +
        "|Sa·nb − Sb·na| ≥ |Sa₀·nb − Sb₀·na| is an INTEGER predicate, so " +
        "the whole test, p-value included, is exact arithmetic end to " +
        "end: not one float exists in this query. The B-fold fan-out is " +
        "B×days rows per type (md5-ranked per permutation to pick the " +
        "pseudo-weekend), bounded at any corpus size.",
      (s, dir) => {
        val bN = 200
        val d = daily(s, dir).withColumn("wknd",
          (pmod(col("day") + lit(3L), lit(7L)) >= 5L).cast(LongType))
        val obs = d.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("wknd")).as("na"),
            sum(when(col("wknd") === 1L, col("x")).otherwise(0L)).as("sa"),
            sum(col("x")).as("st"))
          .select(col("event_type").as("et"), col("n"), col("na"),
            // |Sa·nb − Sb·na| with nb = n−na, Sb = st−sa
            abs(col("sa") * (col("n") - col("na")) -
              (col("st") - col("sa")) * col("na")).as("t_obs"))
        val perms = d
          .withColumn("b", explode(sequence(lit(1), lit(bN))))
          .withColumn("rk", row_number().over(
            Window.partitionBy("event_type", "b")
              .orderBy(md5(concat_ws("|", col("b"), col("day"))), col("day")))
            .cast(LongType))
        perms.join(obs, col("event_type") === col("et"))
          .withColumn("lab", (col("rk") <= col("na")).cast(LongType))
          .groupBy(col("event_type"), col("b"), col("n"), col("na"), col("t_obs"))
          .agg(sum(when(col("lab") === 1L, col("x")).otherwise(0L)).as("sab"),
            sum(col("x")).as("stb"))
          .withColumn("ge", (abs(col("sab") * (col("n") - col("na")) -
            (col("stb") - col("sab")) * col("na")) >= col("t_obs"))
            .cast(LongType))
          .groupBy("event_type")
          .agg(max(col("n")).as("n_days"), max(col("na")).as("n_wknd"),
            count(lit(1)).as("n_perms"), sum(col("ge")).as("n_ge"))
          .select(col("event_type"), col("n_days"), col("n_wknd"),
            col("n_perms"), col("n_ge"))
          .orderBy("event_type")
      },
      Some(
        s"""WITH $dailySql,
           |d AS (SELECT event_type, day, x,
           |    CASE WHEN (((day + 3) % 7) + 7) % 7 >= 5 THEN 1 ELSE 0 END AS wknd
           |  FROM daily),
           |obs AS (SELECT event_type AS et, count(*) AS n,
           |    CAST(sum(wknd) AS BIGINT) AS na,
           |    abs(CAST(sum(CASE WHEN wknd = 1 THEN x ELSE 0 END) AS BIGINT)
           |        * (count(*) - CAST(sum(wknd) AS BIGINT))
           |      - CAST(sum(CASE WHEN wknd = 0 THEN x ELSE 0 END) AS BIGINT)
           |        * CAST(sum(wknd) AS BIGINT)) AS t_obs
           |  FROM d GROUP BY 1),
           |p AS (SELECT d.event_type, d.day, d.x, CAST(b.range AS BIGINT) AS b
           |  FROM d CROSS JOIN range(1, 201) b),
           |rk AS (SELECT event_type, b, x,
           |    CAST(row_number() OVER (PARTITION BY event_type, b
           |      ORDER BY md5(CAST(b AS VARCHAR) || '|' || CAST(day AS VARCHAR)), day)
           |      AS BIGINT) AS rk
           |  FROM p),
           |pb AS (SELECT r.event_type, r.b, o.n, o.na, o.t_obs,
           |    CAST(sum(CASE WHEN r.rk <= o.na THEN r.x ELSE 0 END) AS BIGINT) AS sab,
           |    CAST(sum(r.x) AS BIGINT) AS stb
           |  FROM rk r JOIN obs o ON r.event_type = o.et
           |  GROUP BY 1, 2, 3, 4, 5)
           |SELECT event_type, max(n) AS n_days, max(na) AS n_wknd,
           |  count(*) AS n_perms,
           |  CAST(sum(CASE WHEN abs(sab * (n - na) - (stb - sab) * na) >= t_obs
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
           |FROM pb GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_stats_bootstrap",
      "Hash-deterministic bootstrap 95% CI for the mean daily count per " +
        "type: B=200 resamples of the day-grain series, each drawing n " +
        "days WITH replacement through the md5-index discipline — " +
        "idx(b,j) = first 52 bits of md5(type|b|j) mod n — so the " +
        "resample multiset is identical on any engine, partitioning, or " +
        "retry (no RNG anywhere). Each resample mean is ONE IEEE " +
        "division of an exact BIGINT sum; the CI bounds are order " +
        "statistics of the B means picked by integer rank (means are " +
        "bit-identical across engines, and (mean, b) is a total order), " +
        "rank 5 and 196 of 200 — the percentile-bootstrap reading. " +
        "Fan-out is B×days rows per type; day-grain only.",
      (s, dir) => {
        val bN = 200
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val d = daily(s, dir)
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("day")).cast(LongType) - 1)
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        val nPer = d.groupBy(col("event_type").as("et")).agg(max("n").as("nn"))
        val grid = nPer
          .withColumn("b", explode(sequence(lit(1), lit(bN))))
          .withColumn("j", explode(sequence(lit(0L), col("nn") - 1)))
          .withColumn("idx",
            conv(substring(md5(concat_ws("|", col("et"), col("b"), col("j"))),
              1, 13), 16, 10).cast(LongType) % col("nn"))
        val means = grid
          .join(d, col("et") === col("event_type") && col("idx") === col("rn"))
          .groupBy(col("event_type"), col("b"))
          .agg(sum(col("x")).as("sb"), max(col("nn")).as("nn"))
          .select(col("event_type"), col("b"),
            (D(col("sb")) / D(col("nn"))).as("m"))
        val ranked = means.withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy(col("m"), col("b")))
          .cast(LongType))
        ranked.groupBy("event_type")
          .agg(count(lit(1)).as("n_boot"),
            round(min(when(col("rk") === 5L, col("m"))), 6).as("ci_lo"),
            round(min(when(col("rk") === 196L, col("m"))), 6).as("ci_hi"))
          .orderBy("event_type")
      },
      Some(
        s"""WITH $dailySql,
           |d AS (SELECT event_type, x,
           |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
           |      AS BIGINT) - 1 AS rn,
           |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           |  FROM daily),
           |np AS (SELECT event_type AS et, max(n) AS nn FROM d GROUP BY 1),
           |grid AS (SELECT np.et, np.nn, CAST(b.range AS BIGINT) AS b,
           |    dj.rn AS j
           |  FROM np CROSS JOIN range(1, 201) b
           |  JOIN d dj ON dj.event_type = np.et),
           |g AS (SELECT et, nn, b,
           |    CAST(CAST('0x' || substr(md5(et || '|' || CAST(b AS VARCHAR)
           |      || '|' || CAST(j AS VARCHAR)), 1, 13) AS UBIGINT)
           |      % CAST(nn AS UBIGINT) AS BIGINT) AS idx
           |  FROM grid),
           |m AS (SELECT g.et AS event_type, g.b,
           |    CAST(CAST(sum(d.x) AS BIGINT) AS DOUBLE)
           |      / CAST(max(g.nn) AS DOUBLE) AS m
           |  FROM g JOIN d ON g.et = d.event_type AND g.idx = d.rn
           |  GROUP BY 1, 2),
           |r AS (SELECT event_type, m,
           |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY m, b)
           |      AS BIGINT) AS rk
           |  FROM m)
           |SELECT event_type, count(*) AS n_boot,
           |  round(min(CASE WHEN rk = 5 THEN m END), 6) AS ci_lo,
           |  round(min(CASE WHEN rk = 196 THEN m END), 6) AS ci_hi
           |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_stats_qq",
      "Quantile-quantile table of click vs purchase money distributions " +
        "(integer cents), 5%-grid order statistics — the distribution-" +
        "shape comparison that q_stats_ks's single supremum collapses " +
        "away. Order statistics ride the VALUE-GRAIN cumulative device " +
        "(distinct cents + running count; the row grain never sorts): " +
        "quantile p/20 = min cents with cum ≥ 1+⌊(n−1)·p/20⌋ — all " +
        "integer arithmetic, so every reported quantile is a data value " +
        "picked exactly, no interpolation, no floats anywhere. The " +
        "20-point probe joins each side's cell relation once; corpus " +
        "touched by one count per side.",
      (s, dir) => {
        def side(t: String) = {
          val cells = table(s, dir, "events")
            .filter(col("event_type") === t)
            .select(floor(col("value") * 100 + lit(0.5d)).cast(LongType)
              .as("cents"))
            .groupBy("cents").agg(count(lit(1)).as("c"))
            .withColumn("cum", sum(col("c")).over(
              Window.partitionBy(lit(1)).orderBy("cents")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(1))))
          cells
            .withColumn("p", explode(sequence(lit(1L), lit(19L))))
            .filter(col("cum") >= lit(1L) +
              call_function("div", (col("n") - 1) * col("p"), lit(20L)))
            .groupBy("p").agg(min(col("cents")).as(s"${t}_cents"))
        }
        side("click").join(side("purchase"), "p")
          .select(col("p"), col("click_cents"), col("purchase_cents"))
          .orderBy("p")
      },
      Some(
        """WITH cc AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
          |    count(*) AS c FROM events WHERE event_type = 'click' GROUP BY 1),
          |ca AS (SELECT cents,
          |    CAST(sum(c) OVER (ORDER BY cents
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          |    CAST(sum(c) OVER () AS BIGINT) AS n
          |  FROM cc),
          |cq AS (SELECT p.range AS p, min(cents) AS click_cents
          |  FROM ca CROSS JOIN range(1, 20) p
          |  WHERE cum >= 1 + ((n - 1) * p.range) // 20
          |  GROUP BY 1),
          |pc AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
          |    count(*) AS c FROM events WHERE event_type = 'purchase' GROUP BY 1),
          |pa AS (SELECT cents,
          |    CAST(sum(c) OVER (ORDER BY cents
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          |    CAST(sum(c) OVER () AS BIGINT) AS n
          |  FROM pc),
          |pq AS (SELECT p.range AS p, min(cents) AS purchase_cents
          |  FROM pa CROSS JOIN range(1, 20) p
          |  WHERE cum >= 1 + ((n - 1) * p.range) // 20
          |  GROUP BY 1)
          |SELECT CAST(cq.p AS BIGINT) AS p, click_cents, purchase_cents
          |FROM cq JOIN pq ON cq.p = pq.p ORDER BY p""".stripMargin)),

    GraftQuery(
      "q_stats_mcnemar",
      "McNemar test for paired activity change: did users active in the " +
        "first half of the span stay active in the second half? Each " +
        "user is its own control (the PAIRED 2×2 the independent-sample " +
        "chi² cannot express); the statistic (b−c)²/(b+c) uses ONLY the " +
        "discordant cells. The half-split midpoint is an integer derived " +
        "from the observed day span (broadcast 1-row scalar, no driver " +
        "fetch); per-user half-flags are two conditional max aggregates " +
        "over the distinct user-day relation; all four cells are exact " +
        "BIGINTs and the statistic is one closed IEEE division.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val ud = table(s, dir, "events")
          .select(col("user_id"),
            graft.Ts.dayBucket(col("ts"))
              .as("day"))
          .distinct()
        val mid = ud.agg((call_function("div",
          min(col("day")) + max(col("day")) + 1, lit(2L))).as("mid"))
        ud.join(broadcast(mid))
          .groupBy("user_id")
          .agg(max(when(col("day") < col("mid"), 1L).otherwise(0L)).as("h1"),
            max(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("h2"))
          .agg(count(lit(1)).as("n_users"),
            sum(when(col("h1") === 1L && col("h2") === 1L, 1L).otherwise(0L))
              .as("n_both"),
            sum(when(col("h1") === 1L && col("h2") === 0L, 1L).otherwise(0L))
              .as("n_h1_only"),
            sum(when(col("h1") === 0L && col("h2") === 1L, 1L).otherwise(0L))
              .as("n_h2_only"))
          .select(col("n_users"), col("n_both"), col("n_h1_only"),
            col("n_h2_only"),
            // no discordant users ⇒ no evidence of change: statistic 0 by
            // convention (ANSI division would throw, DuckDB would emit NaN)
            when(col("n_h1_only") + col("n_h2_only") === 0L, lit(0d))
              .otherwise(round(D(col("n_h1_only") - col("n_h2_only")) *
                D(col("n_h1_only") - col("n_h2_only")) /
                D(col("n_h1_only") + col("n_h2_only")), 6)).as("mcnemar_chi2"))
      },
      Some(
        """WITH ud AS (SELECT DISTINCT user_id,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events),
          |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ud),
          |u AS (SELECT user_id,
          |    max(CASE WHEN day < mid THEN 1 ELSE 0 END) AS h1,
          |    max(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS h2
          |  FROM ud CROSS JOIN mid GROUP BY 1),
          |c AS (SELECT count(*) AS n_users,
          |    CAST(sum(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
          |    CAST(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_h1_only,
          |    CAST(sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_h2_only
          |  FROM u)
          |SELECT n_users, n_both, n_h1_only, n_h2_only,
          |  CASE WHEN n_h1_only + n_h2_only = 0 THEN 0.0
          |    ELSE round(CAST((n_h1_only - n_h2_only) * (n_h1_only - n_h2_only) AS DOUBLE)
          |      / CAST(n_h1_only + n_h2_only AS DOUBLE), 6) END AS mcnemar_chi2
          |FROM c""".stripMargin)),

    GraftQuery(
      "q_stats_cramers_v",
      "Cramér's V effect size for the event_type × day-of-week " +
        "contingency — the normalized association strength the raw chi² " +
        "(q_stats_chi2) leaves unscaled. Cell/margin/total counts are " +
        "exact BIGINTs; each cell's (o−e)²/e term is one closed IEEE " +
        "tree of integers, and the one sum OF terms rides the (type, " +
        "dow)-ordered cumulative window over the ≤|types|·7 cell " +
        "relation — the entropy fold device. V = √(χ²/(N·(min(r,c)−1))) " +
        "finishes the tree.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val cells = table(s, dir, "events")
          .select(col("event_type"),
            pmod(graft.Ts.dayBucket(col("ts")) + 3, lit(7L)).as("dow"))
          .groupBy("event_type", "dow")
          .agg(count(lit(1)).as("o"))
        val tot = Window.partitionBy(lit(1))
        val ord = Window.partitionBy(lit(1)).orderBy("event_type", "dow")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = D(col("rsum")) * D(col("csum")) / D(col("nn"))
        cells
          .withColumn("nn", sum(col("o")).over(tot))
          .withColumn("rsum", sum(col("o")).over(Window.partitionBy("event_type")))
          .withColumn("csum", sum(col("o")).over(Window.partitionBy("dow")))
          .withColumn("r", size(collect_set(col("event_type")).over(tot)))
          .withColumn("c", size(collect_set(col("dow")).over(tot)))
          .withColumn("cells", count(lit(1)).over(tot))
          .withColumn("term", (D(col("o")) - e) * (D(col("o")) - e) / e)
          .withColumn("chi2", sum(col("term")).over(ord))
          .withColumn("rn", row_number().over(
            Window.partitionBy(lit(1)).orderBy("event_type", "dow"))
            .cast(LongType))
          .filter(col("rn") === col("cells"))
          .select(col("nn").as("n"), col("r").cast(LongType).as("r"),
            col("c").cast(LongType).as("c"),
            round(col("chi2"), 6).as("chi2"),
            round(sqrt(col("chi2") / (D(col("nn")) *
              D(least(col("r"), col("c")) - 1))), 6).as("cramers_v"))
      },
      Some(
        """WITH cells AS (SELECT event_type,
          |    (((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 3) % 7) + 7) % 7 AS dow,
          |    count(*) AS o
          |  FROM events GROUP BY 1, 2),
          |m AS (SELECT event_type, dow, o,
          |    CAST(sum(o) OVER () AS BIGINT) AS nn,
          |    CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS rsum,
          |    CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS csum,
          |    CAST(count(*) OVER () AS BIGINT) AS cells
          |  FROM cells),
          |dims AS (SELECT count(DISTINCT event_type) AS r,
          |    count(DISTINCT dow) AS c FROM cells),
          |f AS (SELECT nn, cells,
          |    sum((CAST(o AS DOUBLE) - CAST(rsum AS DOUBLE) * CAST(csum AS DOUBLE) / CAST(nn AS DOUBLE))
          |      * (CAST(o AS DOUBLE) - CAST(rsum AS DOUBLE) * CAST(csum AS DOUBLE) / CAST(nn AS DOUBLE))
          |      / (CAST(rsum AS DOUBLE) * CAST(csum AS DOUBLE) / CAST(nn AS DOUBLE)))
          |      OVER (ORDER BY event_type, dow
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chi2,
          |    row_number() OVER (ORDER BY event_type, dow) AS rn
          |  FROM m)
          |SELECT nn AS n, CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
          |  round(chi2, 6) AS chi2,
          |  round(sqrt(chi2 / (CAST(nn AS DOUBLE)
          |    * CAST(least(r, c) - 1 AS DOUBLE))), 6) AS cramers_v
          |FROM f CROSS JOIN dims WHERE rn = cells""".stripMargin)),

    GraftQuery(
      "q_stats_dispersion",
      "Poisson dispersion index of the daily count series per type — " +
        "variance-to-mean ratio (the over/under-dispersion reading that " +
        "decides Poisson vs negative-binomial modeling) plus the " +
        "chi²-shaped dispersion statistic (n−1)·D. Sufficient statistics " +
        "are exact BIGINTs over the day-grain relation; both outputs are " +
        "closed IEEE trees — no fold device needed anywhere.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val varN = (D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx"))) /
          (D(col("n")) * (D(col("n")) - lit(1d)))
        val mean = D(col("sx")) / D(col("n"))
        daily(s, dir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n").as("n_days"),
            round(mean, 6).as("mean"),
            round(varN / mean, 6).as("dispersion"),
            round((D(col("n")) - lit(1d)) * varN / mean, 6).as("chi2_stat"))
          .orderBy("event_type")
      },
      Some(
        s"""WITH $dailySql,
           |a AS (SELECT event_type, count(*) AS n,
           |    CAST(sum(x) AS BIGINT) AS sx,
           |    CAST(sum(x * x) AS BIGINT) AS sxx
           |  FROM daily GROUP BY 1)
           |SELECT event_type, n AS n_days,
           |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
           |  round(((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
           |    / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS dispersion,
           |  round((CAST(n AS DOUBLE) - 1.0)
           |    * ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
           |    / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS chi2_stat
           |FROM a ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_agg_pareto_share",
      "Pareto concentration per region: the minimum number of customers " +
        "whose revenue reaches 80% of the region's total — the 80/20 " +
        "reading, decided by the EXACT integer predicate 5·cum ≥ 4·total " +
        "over cumulative cents (no float threshold can flip a boundary " +
        "customer). Revenue collapses to customer grain first (exact " +
        "cents), ranks and running sums ride one region-keyed window " +
        "over the customer-grain relation, and the answer is the " +
        "min-rank aggregate. Share = top_n/n_customers is the one final " +
        "division.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val rev = table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("c_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5d)).cast(LongType))
            .as("cents"))
        val w = Window.partitionBy("r_name")
          .orderBy(col("cents").desc, col("c_custkey"))
        rev
          .withColumn("rk", row_number().over(w).cast(LongType))
          .withColumn("cum", sum(col("cents")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("tot", sum(col("cents")).over(Window.partitionBy("r_name")))
          .withColumn("nc", count(lit(1)).over(Window.partitionBy("r_name")))
          .filter(col("cum") * 5 >= col("tot") * 4)
          .groupBy(col("r_name").as("region"))
          .agg(max(col("nc")).as("n_customers"), min(col("rk")).as("top_n"))
          .select(col("region"), col("n_customers"), col("top_n"),
            round(D(col("top_n")) / D(col("n_customers")), 6).as("share"))
          .orderBy("region")
      },
      Some(
        """WITH rev AS (
          |  SELECT r.r_name, o.o_custkey AS ck,
          |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
          |      AS cents
          |  FROM orders o
          |  JOIN customer c ON o.o_custkey = c.c_custkey
          |  JOIN nation n ON c.c_nationkey = n.n_nationkey
          |  JOIN region r ON n.n_regionkey = r.r_regionkey
          |  GROUP BY 1, 2),
          |rk AS (SELECT r_name, ck, cents,
          |    CAST(row_number() OVER w AS BIGINT) AS rk,
          |    CAST(sum(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
          |      AND CURRENT ROW) AS BIGINT) AS cum,
          |    CAST(sum(cents) OVER (PARTITION BY r_name) AS BIGINT) AS tot,
          |    CAST(count(*) OVER (PARTITION BY r_name) AS BIGINT) AS nc
          |  FROM rev WINDOW w AS (PARTITION BY r_name ORDER BY cents DESC, ck))
          |SELECT r_name AS region, max(nc) AS n_customers,
          |  min(rk) AS top_n,
          |  round(CAST(min(rk) AS DOUBLE) / CAST(max(nc) AS DOUBLE), 6) AS share
          |FROM rk WHERE cum * 5 >= tot * 4
          |GROUP BY r_name ORDER BY region""".stripMargin)),

    GraftQuery(
      "q_stats_friedman",
      "Friedman rank test per type — day-of-week treatments ranked " +
        "WITHIN each complete Monday-aligned week block, the repeated-" +
        "measures companion to q_stats_anova (it asks the same weekly-" +
        "seasonality question without ANOVA's normality assumption). " +
        "Ranks are integer half-units (2·avgrank = 2·min_rank + ties − 1, " +
        "the Mann-Whitney discipline), so per-(type, dow) rank sums and " +
        "their squares are exact BIGINTs; with k=7 the statistic " +
        "χ²_F = 12·Σ(2Rⱼ)²/(4·56·n) − 24n reduces to one closed IEEE " +
        "tree over two integers. Untied-form statistic (ties are rare at " +
        "daily-count magnitudes; the tie-corrected denominator is a " +
        "documented refinement). Day-grain only; blocks with missing " +
        "days are excluded by the exact count=7 predicate.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val d = daily(s, dir)
          // FLOOR week index (numerator made divisible by subtracting the
          // pmod dow, so truncating div == floor div): a truncating
          // (day+3)//7 next to a pmod dow would give pre-1970 "week 0" a
          // 13-day span with duplicate dows inside one Friedman block
          .withColumn("dow", pmod(col("day") + lit(3L), lit(7L)))
          .withColumn("wk", call_function("div",
            col("day") + 3 - col("dow"), lit(7L)))
          .withColumn("full", count(lit(1)).over(
            Window.partitionBy("event_type", "wk")))
          .filter(col("full") === 7L)
        val r2 = rank().over(Window.partitionBy("event_type", "wk")
          .orderBy(col("x"))).cast(LongType) * 2 +
          count(lit(1)).over(Window.partitionBy("event_type", "wk", "x"))
            .cast(LongType) - 1
        val sums = d.select(col("event_type"), col("wk"), col("dow"),
            r2.as("r2"))
          .groupBy("event_type", "dow")
          .agg(sum(col("r2")).as("rs2"),
            count(lit(1)).as("nb"))
        sums.groupBy("event_type")
          .agg(max(col("nb")).as("n_blocks"),
            sum(col("rs2") * col("rs2")).as("sq2"))
          .select(col("event_type"), col("n_blocks"),
            // χ²_F = 12/(n·k(k+1))·ΣR_j² − 3n(k+1); R_j = rs2/2, k = 7
            round(lit(12d) * D(col("sq2")) / lit(4d) /
              (D(col("n_blocks")) * lit(56d)) -
              lit(24d) * D(col("n_blocks")), 6).as("friedman_chi2"))
          .orderBy("event_type")
      },
      Some(
        s"""WITH $dailySql,
           |d AS (SELECT event_type, day, x,
           |    ((day + 3) - (((day + 3) % 7) + 7) % 7) // 7 AS wk,
           |    (((day + 3) % 7) + 7) % 7 AS dow
           |  FROM daily),
           |f AS (SELECT event_type, wk, dow, x,
           |    CAST(count(*) OVER (PARTITION BY event_type, wk) AS BIGINT) AS fullc
           |  FROM d),
           |r AS (SELECT event_type, wk, dow,
           |    CAST(2 * rank() OVER (PARTITION BY event_type, wk ORDER BY x)
           |      + count(*) OVER (PARTITION BY event_type, wk, x) - 1
           |      AS BIGINT) AS r2
           |  FROM f WHERE fullc = 7),
           |s AS (SELECT event_type, dow,
           |    CAST(sum(r2) AS BIGINT) AS rs2, count(*) AS nb
           |  FROM r GROUP BY 1, 2),
           |a AS (SELECT event_type, max(nb) AS n_blocks,
           |    CAST(sum(rs2 * rs2) AS BIGINT) AS sq2
           |  FROM s GROUP BY 1)
           |SELECT event_type, n_blocks,
           |  round(12.0 * CAST(sq2 AS DOUBLE) / 4.0
           |      / (CAST(n_blocks AS DOUBLE) * 56.0)
           |    - 24.0 * CAST(n_blocks AS DOUBLE), 6) AS friedman_chi2
           |FROM a ORDER BY event_type""".stripMargin)),

    GraftQuery(
      "q_stats_theil",
      "Theil T inequality of customer revenue WITH its regional " +
        "decomposition — the inequality measure that is exactly " +
        "additive (T = Σ share_g·T_g + T_between), which is what makes " +
        "it the DISTRIBUTED inequality measure: each region's " +
        "within-group fold runs in its own region-partitioned window " +
        "(never a global sort), the between term folds over the 5-row " +
        "region relation, and global totals arrive as a broadcast 1-row " +
        "scalar. Every ln argument is a ratio of exact integer cents/" +
        "counts (x·N_g/X_g and X_g·N/(X·N_g) — cross-multiplied so no " +
        "intermediate division feeds another), every sum OF float terms " +
        "rides an ordered cumulative window. Per-region output: " +
        "revenue share, within-Theil, its weighted contribution, and " +
        "the between term.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val rev = table(s, dir, "orders")
          .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("c_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5d)).cast(LongType))
            .as("x"))
          .filter(col("x") > 0)
        val wg = Window.partitionBy("r_name")
        val ord = wg.orderBy("c_custkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val term = D(col("x")) / D(col("xg")) *
          log(D(col("x") * col("ng")) / D(col("xg")))
        val perRegion = rev
          .withColumn("xg", sum(col("x")).over(wg))
          .withColumn("ng", count(lit(1)).over(wg))
          .withColumn("tg", sum(term).over(ord))
          .withColumn("rn", row_number().over(wg.orderBy("c_custkey"))
            .cast(LongType))
          .filter(col("rn") === col("ng"))
          .select(col("r_name"), col("ng"), col("xg"), col("tg"))
        val tot = rev.agg(sum(col("x")).as("xx"), count(lit(1)).as("nn"))
        perRegion.join(broadcast(tot))
          .select(col("r_name").as("region"), col("ng").as("n_cust"),
            round(D(col("xg")) / D(col("xx")), 6).as("x_share"),
            round(col("tg"), 6).as("theil_within"),
            round(D(col("xg")) / D(col("xx")) * col("tg"), 6)
              .as("within_contrib"),
            round(D(col("xg")) / D(col("xx")) *
              log(D(col("xg") * col("nn")) / D(col("xx") * col("ng"))), 6)
              .as("between_term"))
          .orderBy("region")
      },
      Some(
        """WITH rev AS (
          |  SELECT r.r_name, o.o_custkey AS ck,
          |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
          |      AS x
          |  FROM orders o
          |  JOIN customer c ON o.o_custkey = c.c_custkey
          |  JOIN nation n ON c.c_nationkey = n.n_nationkey
          |  JOIN region r ON n.n_regionkey = r.r_regionkey
          |  GROUP BY 1, 2 HAVING sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) > 0),
          |g AS (SELECT r_name, ck, x,
          |    CAST(sum(x) OVER (PARTITION BY r_name) AS BIGINT) AS xg,
          |    CAST(count(*) OVER (PARTITION BY r_name) AS BIGINT) AS ng
          |  FROM rev),
          |f AS (SELECT r_name, ng, xg,
          |    sum(CAST(x AS DOUBLE) / CAST(xg AS DOUBLE)
          |      * ln(CAST(x * ng AS DOUBLE) / CAST(xg AS DOUBLE)))
          |      OVER (PARTITION BY r_name ORDER BY ck
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tg,
          |    row_number() OVER (PARTITION BY r_name ORDER BY ck) AS rn
          |  FROM g),
          |pr AS (SELECT r_name, ng, xg, tg FROM f WHERE rn = ng),
          |tot AS (SELECT CAST(sum(x) AS BIGINT) AS xx, count(*) AS nn FROM rev)
          |SELECT r_name AS region, ng AS n_cust,
          |  round(CAST(xg AS DOUBLE) / CAST(xx AS DOUBLE), 6) AS x_share,
          |  round(tg, 6) AS theil_within,
          |  round(CAST(xg AS DOUBLE) / CAST(xx AS DOUBLE) * tg, 6)
          |    AS within_contrib,
          |  round(CAST(xg AS DOUBLE) / CAST(xx AS DOUBLE)
          |    * ln(CAST(xg * nn AS DOUBLE) / CAST(xx * ng AS DOUBLE)), 6)
          |    AS between_term
          |FROM pr CROSS JOIN tot ORDER BY region""".stripMargin)),

    GraftQuery(
      "q_agg_abc_class",
      "ABC inventory classification of part brands by lineitem revenue — " +
        "A up to 70% cumulative share, B to 90%, C the tail — with the " +
        "class boundaries decided by EXACT integer cross-multiplication " +
        "(10·cum ≤ 7·total / 10·cum ≤ 9·total), so no float threshold " +
        "can flip a boundary brand. Revenue collapses to brand grain " +
        "(exact cents) before the single ranked window; per-class " +
        "output: brand count, revenue mass and share. The classic " +
        "warehouse-ops rollup next to q_agg_pareto_share's top-N form.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val rev = table(s, dir, "lineitem")
          .join(table(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5d))
            .cast(LongType)).as("cents"))
        val w = Window.partitionBy(lit(1))
          .orderBy(col("cents").desc, col("p_brand"))
        rev
          .withColumn("cum", sum(col("cents")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("tot", sum(col("cents")).over(Window.partitionBy(lit(1))))
          .withColumn("cls",
            when(col("cum") * 10 <= col("tot") * 7, "A")
              .when(col("cum") * 10 <= col("tot") * 9, "B")
              .otherwise("C"))
          .groupBy("cls")
          .agg(count(lit(1)).as("n_brands"), sum(col("cents")).as("cents"),
            max(col("tot")).as("tot"))
          .select(col("cls"), col("n_brands"), col("cents"),
            round(D(col("cents")) / D(col("tot")), 6).as("share"))
          .orderBy("cls")
      },
      Some(
        """WITH rev AS (
          |  SELECT p.p_brand,
          |    CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
          |      AS BIGINT) AS cents
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          |  GROUP BY 1),
          |r AS (SELECT p_brand, cents,
          |    CAST(sum(cents) OVER (ORDER BY cents DESC, p_brand
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |      AS cum,
          |    CAST(sum(cents) OVER () AS BIGINT) AS tot
          |  FROM rev),
          |c AS (SELECT CASE WHEN cum * 10 <= tot * 7 THEN 'A'
          |    WHEN cum * 10 <= tot * 9 THEN 'B' ELSE 'C' END AS cls,
          |    cents, tot
          |  FROM r)
          |SELECT cls, count(*) AS n_brands, CAST(sum(cents) AS BIGINT) AS cents,
          |  round(CAST(sum(cents) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6)
          |    AS share
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_stats_lorenz",
      "Lorenz curve of customer revenue at the decile grid — the " +
        "concentration curve under q_agg_gini's single number and the " +
        "chartable companion to Pareto/Theil: for each decile d, the " +
        "share of total revenue held by the poorest ⌊n·d/10⌋ customers. " +
        "Rank and cumulative cents ride one window over the " +
        "customer-grain relation; each curve point picks the cumulative " +
        "value AT the exact integer rank ⌊n·d/10⌋ (conditional min — no " +
        "interpolation), and the share is the one IEEE division.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val rev = table(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5d)).cast(LongType))
            .as("cents"))
        val w = Window.partitionBy(lit(1))
          .orderBy(col("cents"), col("o_custkey"))
        rev
          .withColumn("rk", row_number().over(w).cast(LongType))
          .withColumn("cum", sum(col("cents")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
          .withColumn("tot", sum(col("cents")).over(Window.partitionBy(lit(1))))
          .withColumn("d", explode(sequence(lit(1L), lit(10L))))
          .filter(col("rk") === call_function("div", col("n") * col("d"), lit(10L)))
          .select(col("d").as("decile"),
            col("rk").as("n_bottom"),
            round(D(col("cum")) / D(col("tot")), 6).as("cum_share"))
          .orderBy("decile")
      },
      Some(
        """WITH rev AS (
          |  SELECT o_custkey,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
          |      AS cents
          |  FROM orders GROUP BY 1),
          |r AS (SELECT o_custkey, cents,
          |    CAST(row_number() OVER w AS BIGINT) AS rk,
          |    CAST(sum(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
          |      AND CURRENT ROW) AS BIGINT) AS cum,
          |    CAST(count(*) OVER () AS BIGINT) AS n,
          |    CAST(sum(cents) OVER () AS BIGINT) AS tot
          |  FROM rev WINDOW w AS (ORDER BY cents, o_custkey)),
          |p AS (SELECT d.range AS d, r.rk, r.cum, r.tot
          |  FROM r CROSS JOIN range(1, 11) d
          |  WHERE r.rk = (r.n * d.range) // 10)
          |SELECT CAST(d AS BIGINT) AS decile, rk AS n_bottom,
          |  round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share
          |FROM p ORDER BY decile""".stripMargin)),

    GraftQuery(
      "q_stats_hhi",
      "Herfindahl–Hirschman market-concentration index per region — " +
        "supplier revenue shares squared and summed on the 0–10000 " +
        "antitrust scale, with the equivalent-competitor count 1/Σs² — " +
        "the regulator's reading next to Simpson/Gini/Theil. Revenue " +
        "collapses to supplier grain in exact cents; each share is ONE " +
        "IEEE division of exact BIGINTs and the sum OF squared shares " +
        "rides the supplier-ordered cumulative window per region (the " +
        "fold device; partitions are region-bounded, never global).",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val rev = table(s, dir, "lineitem")
          .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(table(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("s_suppkey"))
          .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5d))
            .cast(LongType)).as("c"))
        val wg = Window.partitionBy("r_name")
        val ord = wg.orderBy("s_suppkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val share = D(col("c")) / D(col("tot"))
        rev
          .withColumn("tot", sum(col("c")).over(wg))
          .withColumn("ssq", sum(share * share).over(ord))
          .withColumn("ng", count(lit(1)).over(wg))
          .withColumn("rn", row_number().over(wg.orderBy("s_suppkey"))
            .cast(LongType))
          .filter(col("rn") === col("ng"))
          .select(col("r_name").as("region"), col("ng").as("n_suppliers"),
            round(col("ssq") * lit(10000d), 6).as("hhi"),
            round(lit(1d) / col("ssq"), 6).as("eff_competitors"))
          .orderBy("region")
      },
      Some(
        """WITH rev AS (
          |  SELECT r.r_name, l.l_suppkey AS sk,
          |    CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
          |      AS BIGINT) AS c
          |  FROM lineitem l
          |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |  JOIN nation n ON s.s_nationkey = n.n_nationkey
          |  JOIN region r ON n.n_regionkey = r.r_regionkey
          |  GROUP BY 1, 2),
          |g AS (SELECT r_name, sk, c,
          |    CAST(sum(c) OVER (PARTITION BY r_name) AS BIGINT) AS tot,
          |    CAST(count(*) OVER (PARTITION BY r_name) AS BIGINT) AS ng
          |  FROM rev),
          |f AS (SELECT r_name, ng,
          |    sum((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
          |      * (CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)))
          |      OVER (PARTITION BY r_name ORDER BY sk
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ssq,
          |    row_number() OVER (PARTITION BY r_name ORDER BY sk) AS rn
          |  FROM g)
          |SELECT r_name AS region, ng AS n_suppliers,
          |  round(ssq * 10000.0, 6) AS hhi,
          |  round(1.0 / ssq, 6) AS eff_competitors
          |FROM f WHERE rn = ng ORDER BY region""".stripMargin)),

    GraftQuery(
      "q_stats_capture_recapture",
      "Chapman capture–recapture population estimate: the first two " +
        "Monday-aligned calendar weeks OBSERVED in the corpus (min(wk) " +
        "and min(wk)+1 — the first may be a partial week when the span " +
        "starts mid-week) are the two capture occasions, " +
        "their user sets the marks, and N̂ = (n1+1)(n2+1)/(m+1) − 1 " +
        "estimates the active population — the ecology/census estimator " +
        "that generalizes to count things a full scan cannot see (here " +
        "the audit twin, TRUE distinct users over the span, sits right " +
        "beside it). All counts exact from two conditional max flags " +
        "per user; the estimator is one closed IEEE tree.",
      (s, dir) => {
        def D(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val ud = table(s, dir, "events")
          .select(col("user_id"),
            graft.Ts.dayBucket(col("ts"))
              .as("day"))
          .distinct()
          .withColumn("wk", call_function("div", col("day") + 3, lit(7L)))
        val w0 = ud.agg(min(col("wk")).as("w0"))
        val flags = ud.join(broadcast(w0))
          .groupBy("user_id")
          .agg(max(when(col("wk") === col("w0"), 1L).otherwise(0L)).as("c1"),
            max(when(col("wk") === col("w0") + 1, 1L).otherwise(0L)).as("c2"))
        flags.agg(
            count(lit(1)).as("n_total"),
            sum(col("c1")).as("n1"),
            sum(col("c2")).as("n2"),
            sum(col("c1") * col("c2")).as("m"))
          .select(col("n_total"), col("n1"), col("n2"), col("m"),
            round((D(col("n1") + 1) * D(col("n2") + 1)) / D(col("m") + 1) -
              lit(1d), 6).as("chapman_estimate"))
      },
      Some(
        """WITH ud AS (SELECT DISTINCT user_id,
          |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events),
          |w AS (SELECT user_id, (day + 3) // 7 AS wk FROM ud),
          |w0 AS (SELECT min(wk) AS w0 FROM w),
          |f AS (SELECT user_id,
          |    max(CASE WHEN wk = w0 THEN 1 ELSE 0 END) AS c1,
          |    max(CASE WHEN wk = w0 + 1 THEN 1 ELSE 0 END) AS c2
          |  FROM w CROSS JOIN w0 GROUP BY 1),
          |a AS (SELECT count(*) AS n_total,
          |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
          |    CAST(sum(c1 * c2) AS BIGINT) AS m
          |  FROM f)
          |SELECT n_total, n1, n2, m,
          |  round(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
          |    / CAST(m + 1 AS DOUBLE) - 1.0, 6) AS chapman_estimate
          |FROM a""".stripMargin))
  )
}
