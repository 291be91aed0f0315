package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** The typed Dataset functional surface (SURVEY §2.12 next to the
  * Aggregator UDAFs): `groupByKey` + `mapGroups` — the per-group
  * imperative escape hatch for logic that is awkward as window algebra,
  * oracle-gated against the RELATIONAL formulation of the same semantics
  * so both the typed path's correctness and its equivalence to the
  * declarative form are pinned.
  */
object TypedOps {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_typed_streak",
      "Longest consecutive-active-day streak per user, computed through the " +
        "TYPED API: distinct (user, day-ordinal) pairs → groupByKey(user) → " +
        "mapGroups with an in-memory sort + linear streak scan. The DuckDB " +
        "twin is the classic relational gaps-and-islands (day − row_number " +
        "grouping) — same rows from two formulations, which is exactly what " +
        "the gate should pin for an escape hatch: use it and you still get " +
        "the declarative answer. Scale shape: only slim (user, int-day) " +
        "pairs shuffle (one exchange); per-group state is bounded by the " +
        "CALENDAR SPAN, not the corpus (distinct days ≤ span regardless of " +
        "row count), so the in-group sort is O(span log span) with " +
        "span ≈ 30 here and a few thousand on any real archive. The " +
        "day-ordinal is an exact integer datediff from a fixed epoch — no " +
        "timezone or DST arithmetic inside the group function.",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "events")
          // explicit symmetric non-null contract (oracle WHERE mirrors):
          // the typed decoder's (Long, Int) fields are primitive, so a NULL
          // ts/user_id CRASHES the Spark path where the relational twin
          // would answer — the one bug class the relational queries in this
          // suite don't have (r14 sweep, NULL-symmetry discipline)
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"),
            datediff(col("ts").cast(DateType),
              lit(java.sql.Date.valueOf("2024-01-01"))).as("d"))
          .distinct()
          .as[(Long, Int)]
          .groupByKey(_._1)
          .mapGroups { (uid, it) =>
            val ds = it.map(_._2).toArray
            java.util.Arrays.sort(ds)
            var best = 1
            var cur = 1
            var i = 1
            while (i < ds.length) {
              if (ds(i) == ds(i - 1) + 1) { cur += 1; if (cur > best) best = cur }
              else cur = 1
              i += 1
            }
            (uid, if (ds.isEmpty) 0L else best.toLong)
          }
          .toDF("user_id", "max_streak")
          .orderBy(col("max_streak").desc, col("user_id"))
          .limit(200)
      },
      Some(
        """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
          |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |r AS (SELECT user_id, day,
          |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d),
          |i AS (SELECT user_id, day - CAST(rn AS INTEGER) AS grp, count(*) AS len
          |  FROM r GROUP BY 1, 2)
          |SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
          |FROM i GROUP BY user_id ORDER BY max_streak DESC, user_id LIMIT 200""".stripMargin)),

    GraftQuery(
      "q_typed_throttle",
      "Per-user cooldown throttle through the TYPED API: scan each " +
        "user's events in (ts, event_id) order keeping an event iff it " +
        "lands ≥ 60 s after the last KEPT one — the notification rate-" +
        "limit / snapshot-thinning primitive whose state is genuinely " +
        "SEQUENTIAL: keep/drop depends on which earlier events were " +
        "kept, so no window frame or gaps-and-islands rewrite expresses " +
        "it (a fixed 60 s grid keeps different events). groupByKey + " +
        "mapGroups makes the KEY the parallel unit — per-user state is " +
        "one timestamp and the in-group sort is bounded by events/user " +
        "(≤ ~100 in the fixture, calendar-bounded on a real archive), " +
        "so 1000 executors each stream their users independently; only " +
        "slim (user, micros, id) triples shuffle. The oracle is a " +
        "DuckDB RECURSIVE CTE stepping (user, rank) — the genuinely " +
        "different linear-recursion formulation, so the gate proves the " +
        "typed path against the relational fixpoint, and its exact " +
        "integer-micros comparisons can never drift.",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "events")
          // same explicit non-null contract as q_typed_streak: primitive
          // tuple decode crashes on NULL where the oracle answers
          .filter(col("user_id").isNotNull && col("ts").isNotNull &&
            col("event_id").isNotNull)
          .select(col("user_id"), graft.Ts.epochMicros(col("ts")).as("us"),
            col("event_id"))
          .as[(Long, Long, Long)]
          .groupByKey(_._1)
          .mapGroups { (uid, it) =>
            val evs = it.map(t => (t._2, t._3)).toArray.sortBy(identity)
            var kept = 0L
            var last = Long.MinValue
            evs.foreach { case (us, _) =>
              if (last == Long.MinValue || us - last >= 60000000L) {
                kept += 1; last = us
              }
            }
            (uid, evs.length.toLong, kept)
          }
          .toDF("user_id", "n_events", "n_kept")
          .orderBy("user_id")
      },
      Some(
        """WITH RECURSIVE base AS (
          |  SELECT user_id, epoch_us(ts) AS us, event_id,
          |    CAST(row_number() OVER (PARTITION BY user_id
          |      ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rk
          |  FROM events
          |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
          |    AND event_id IS NOT NULL),
          |step AS (
          |  SELECT user_id, rk, us AS last_us, CAST(1 AS BIGINT) AS kept
          |  FROM base WHERE rk = 1
          |  UNION ALL
          |  SELECT b.user_id, b.rk,
          |    CASE WHEN b.us - s.last_us >= 60000000 THEN b.us
          |         ELSE s.last_us END,
          |    s.kept + CASE WHEN b.us - s.last_us >= 60000000 THEN 1
          |             ELSE 0 END
          |  FROM step s JOIN base b
          |    ON b.user_id = s.user_id AND b.rk = s.rk + 1),
          |tot AS (SELECT user_id, count(*) AS n FROM base GROUP BY user_id)
          |SELECT s.user_id, t.n AS n_events, s.kept AS n_kept
          |FROM step s JOIN tot t ON s.user_id = t.user_id AND s.rk = t.n
          |ORDER BY s.user_id""".stripMargin)),

    GraftQuery(
      "q_ts_holt",
      "Holt's linear exponential smoothing (α = β = 0.5) per type over " +
        "the daily count series, through the TYPED API — the trend-aware " +
        "forecast one step up from q_ts_ewma's level-only smoothing, and " +
        "a genuinely SEQUENTIAL recursion (each level depends on the " +
        "previous level AND trend, so no window frame expresses it). " +
        "groupByKey + flatMapGroups folds each type's day-ordered series " +
        "in one pass; the corpus collapses to day grain BEFORE the typed " +
        "stage, so only ≤ types × days slim rows reach it. Cross-engine " +
        "float determinism: the oracle's RECURSIVE CTE spells the " +
        "IDENTICAL IEEE expression tree in the identical order (0.5 " +
        "multiplications are exact; every add/sub is sequential), so the " +
        "recursion is bit-equal, not approximately equal. Output: final " +
        "level, trend, and the 1-step forecast.",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "events")
          // ts: primitive `day` decode crashes on NULL (see q_typed_streak);
          // event_type: Spark's groupByKey KEEPS a null-key group and emits
          // its row while the oracle's recursion join on event_type DROPS
          // NULL rows — both excluded explicitly on both engines
          .filter(col("event_type").isNotNull && col("ts").isNotNull)
          .groupBy(col("event_type"),
            graft.Ts.dayBucket(col("ts"))
              .as("day"))
          .agg(count(lit(1)).as("x"))
          .select(col("event_type"), col("day"), col("x"))
          .as[(String, Long, Long)]
          .groupByKey(_._1)
          .flatMapGroups { (et, it) =>
            val xs = it.toArray.sortBy(_._2).map(_._3.toDouble)
            if (xs.length < 2) Iterator.empty
            else {
              var l = xs(0)
              var b = xs(1) - xs(0)
              var t = 1
              while (t < xs.length) {
                val lNew = 0.5 * xs(t) + 0.5 * (l + b)
                b = 0.5 * (lNew - l) + 0.5 * b
                l = lNew
                t += 1
              }
              Iterator((et, xs.length.toLong, l, b, l + b))
            }
          }
          .toDF("event_type", "n_days", "level", "trend", "forecast_1")
          .select(col("event_type"), col("n_days"),
            round(col("level"), 6).as("level"),
            round(col("trend"), 6).as("trend"),
            round(col("forecast_1"), 6).as("forecast_1"))
          .orderBy("event_type")
      },
      Some(
        """WITH RECURSIVE base AS (
          |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
          |    count(*) AS x
          |  FROM events
          |  WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
          |rk AS (SELECT event_type, CAST(x AS DOUBLE) AS x,
          |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
          |      AS BIGINT) AS rk
          |  FROM base),
          |n AS (SELECT event_type, count(*) AS nd FROM rk GROUP BY 1),
          |step AS (
          |  SELECT a.event_type, CAST(1 AS BIGINT) AS rk,
          |    a.x AS l, b2.x - a.x AS b
          |  FROM rk a JOIN rk b2
          |    ON a.event_type = b2.event_type AND a.rk = 1 AND b2.rk = 2
          |  UNION ALL
          |  SELECT s.event_type, s.rk + 1,
          |    0.5 * nb.x + 0.5 * (s.l + s.b),
          |    0.5 * ((0.5 * nb.x + 0.5 * (s.l + s.b)) - s.l) + 0.5 * s.b
          |  FROM step s JOIN rk nb
          |    ON nb.event_type = s.event_type AND nb.rk = s.rk + 1)
          |SELECT s.event_type, n.nd AS n_days,
          |  round(s.l, 6) AS level, round(s.b, 6) AS trend,
          |  round(s.l + s.b, 6) AS forecast_1
          |FROM step s JOIN n ON s.event_type = n.event_type AND s.rk = n.nd
          |ORDER BY s.event_type""".stripMargin))
  )
}
