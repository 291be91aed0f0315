package graft

import org.apache.spark.sql.functions._

/** Adversarial fixtures for the sweep-line operators — the tie corners the
  * fixture data may never exercise: sessions starting exactly on hour
  * boundaries, several sessions ENDING at the same instant (a row-at-a-time
  * running sum would leak the intra-instant intermediate into the hourly
  * max), duplicate (user, ts) rows, and >24h activity gaps. The synthetic
  * events table is written to a temp dir with the production schema, so the
  * REAL registry queries run on it unmodified.
  */
class SweepLineEdgeSpec extends SparkSuite {

  private val H = 3600L
  private lazy val dir: String = {
    import spark.implicits._
    // (event_id, epochSec, user_id, event_type, value)
    val rows = Seq(
      // u1: two sessions ending at the SAME instant t=7200 (starts 6300),
      // and nothing else in hour 2 — peak of hour 2 must be the merged 0,
      // never the row-at-a-time intermediate 1
      (1L, 6300L, 1L, "click", 1.0),
      (2L, 6300L, 1L, "click", 1.0),
      // u2: session starting EXACTLY at an hour boundary t=10800
      (3L, 10800L, 2L, "view", 2.0),
      // u2: duplicate (user, ts) pair — distinct() must collapse its hour
      (4L, 10800L, 2L, "view", 2.5),
      // u3: overlapping chain 14000,14500,15000 → ONE merged interval
      (5L, 14000L, 3L, "click", 0.5),
      (6L, 14500L, 3L, "click", 0.5),
      (7L, 15000L, 3L, "click", 0.5),
      // u3: >24h later → second island for rolling distinct
      (8L, 14000L + 30 * 24 * H, 3L, "purchase", 9.99),
      // u4: isolated event far in a different hour
      (9L, 50 * H + 1800L, 4L, "error", 1.25)
    )
    val df = rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("""{"k": 1}""").as("props"))
    val d = java.nio.file.Files.createTempDirectory("graft_edge").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private val W = 900000000L

  test("concurrency edge: coincident endings never leak an intermediate peak") {
    val got = SparkEntry.queries("q_ts_concurrency")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // brute force over merged instants
    val starts = Seq(6300L, 6300L, 10800L, 10800L, 14000L, 14500L, 15000L,
      14000L + 30 * 24 * H, 50 * H + 1800L).map(_ * 1000000L)
    val bounds = (starts ++ starts.map(_ + W)).distinct
    val probes = (bounds ++ bounds.map(t => t / (H * 1000000L) * (H * 1000000L))).distinct
    val want = probes
      .map(t => (t / (H * 1000000L), starts.count(s => s <= t && t < s + W).toLong))
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).max }
    want.foreach { case (h, peak) =>
      if (peak > 0) assert(got.get(h).contains(peak), s"hr=$h want=$peak got=${got.get(h)}")
    }
    // hour 1 (6300+900=7200 both end): peak inside hour 1 is 2 (both active)
    assert(got(1L) == 2L)
    // hour 2 opens with zero concurrency and only the hour-start probe
    assert(got.get(2L).forall(_ == 0L))
  }

  test("interval union edge: chains merge, duplicates collapse, islands split") {
    val m = SparkEntry.queries("q_ts_interval_union")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // u1: two identical intervals → 1 island of exactly W
    assert(m(1L) == ((1L, W)))
    // u3: chain [14000,14900)∪[14500,15400)∪[15000,15900) → one 1900s
    // island, plus the 30-day-later purchase island → 2 islands, coverage
    // (1900 + 900) seconds in micros
    assert(m(3L) == ((2L, 2800L * 1000000L)))
    // u2: duplicate (user, ts) → still one island of exactly W
    assert(m(2L) == ((1L, W)))
  }

  test("cdc apply edge: exact-timestamp ties resolve by event_id, tombstones drop") {
    val got = SparkEntry.queries("q_cdc_apply")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // u1 final = event 2 (click, tie on ts broken by event_id desc → 2)
    // u2 final = event 4 (view 2.5 — the HIGHER event_id at the tied ts)
    // u3 final = event 8 (purchase 9.99); u4 final = error → tombstoned
    val want = Map(
      "click" -> ((1L, 100L)),
      "view" -> ((1L, 250L)),
      "purchase" -> ((1L, 999L)))
    assert(got == want, s"got=$got")
  }

  test("rolling distinct edge: hour-boundary and gap islands count once per user") {
    val got = SparkEntry.queries("q_ts_rolling_distinct")(spark, dir)
      .select((graft.Ts.epochMicros(col("hr")) / lit(3600000000L)).cast("long"),
        col("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // observed hours: 1 (u1), 3 (u2), 3-4 (u3 spans 14000=hr3,15000=hr4... )
    val pairs = Seq((1L, 1L), (2L, 3L), (3L, 3L), (3L, 4L),
      (3L, (14000L + 30 * 24 * H) / H), (4L, 50L))
      .map { case (u, h) => (h, u) }.distinct
    val hours = pairs.map(_._1).distinct
    val want = hours.map { h =>
      h -> pairs.collect { case (ph, u) if ph >= h - 23 && ph <= h => u }.distinct.size.toLong
    }.toMap
    assert(got == want, s"got=$got want=$want")
  }
}
