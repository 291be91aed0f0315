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
        """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
          |r AS (SELECT user_id, day,
          |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d),
          |i AS (SELECT user_id, day - CAST(rn AS INTEGER) AS grp, count(*) AS len
          |  FROM r GROUP BY 1, 2)
          |SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
          |FROM i GROUP BY user_id ORDER BY max_streak DESC, user_id LIMIT 200""".stripMargin))
  )
}
