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

  /** Day-grain count series per event type: the shared slim input. */
  private def daily(s: org.apache.spark.sql.SparkSession, dir: String) =
    table(s, dir, "events")
      .groupBy(col("event_type"),
        floor(graft.Ts.epochSec(col("ts")) / lit(86400d)).cast(LongType)
          .as("day"))
      .agg(count(lit(1)).as("x"))

  private val dailySql =
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
        def D(c: String) = col(c).cast(DoubleType)
        val num = D("n") * D("sxy") - D("sx") * D("sy")
        val den = sqrt(D("n") * D("sxx") - D("sx") * D("sx")) *
          sqrt(D("n") * D("syy") - D("sy") * D("sy"))
        pairedDays(s, dir)
          .select(halfRank("x").as("rx"), halfRank("y").as("ry"))
          .agg(count(lit(1)).as("n"),
            sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
            sum(col("rx") * col("ry")).as("sxy"),
            sum(col("rx") * col("rx")).as("sxx"),
            sum(col("ry") * col("ry")).as("syy"))
          .select(col("n"), round(num / den, 6).as("rho"))
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
           |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           |    / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           |      * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
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
            round((D("c") - D("d")) /
              (sqrt(D("c") + D("d") + D("tx")) *
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
           |  round((CAST(c AS DOUBLE) - CAST(d AS DOUBLE))
           |    / (sqrt(CAST(c AS DOUBLE) + CAST(d AS DOUBLE) + CAST(tx AS DOUBLE))
           |      * sqrt(CAST(c AS DOUBLE) + CAST(d AS DOUBLE) + CAST(ty AS DOUBLE))),
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
        val theta = D(col("sy") - col("y")) / D(col("sx") - col("x"))
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
            round(sqrt((D(col("n")) - lit(1d)) / D(col("n")) *
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
           |    CAST(sy - y AS DOUBLE) / CAST(sx - x AS DOUBLE) AS theta
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
           |  round(sqrt((CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)
           |    * (stt - st * st / CAST(n AS DOUBLE))), 6) AS jk_se
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
           |    CASE WHEN (day + 3) % 7 >= 5 THEN 1 ELSE 0 END AS wknd
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
           |    CAST(j.range AS BIGINT) AS j
           |  FROM np CROSS JOIN range(1, 201) b
           |  CROSS JOIN range(0, 4096) j
           |  WHERE j.range < np.nn),
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
          |FROM cq JOIN pq ON cq.p = pq.p ORDER BY p""".stripMargin))
  )
}
