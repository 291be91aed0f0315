package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A position fix parsed from an APRS packet (PacketParse output + event time). */
final case class PacketFix(callsign: String, ts: java.sql.Timestamp, lat: Double, lon: Double)

/** Per-station rollup emitted after each micro-batch. */
final case class StationStat(callsign: String, n_fixes: Long, total_km: Double)

/** Arbitrary stateful streaming (SURVEY.md §2.10 stretch):
  * `flatMapGroupsWithState` tracking, per station, the last position and the
  * cumulative haversine track distance — the classic APRS "how far did this
  * station travel" query, unanswerable with windowed aggregation because the
  * state is an arbitrary fold over event order.
  *
  * Scale: state is O(stations) × a few doubles, hash-partitioned by callsign
  * across executors, checkpointed with the query. State is bounded two ways:
  * stations whose last fix falls more than [[IdleTimeoutMs]] of EVENT time
  * behind the watermark expire (their next fix simply restarts the track at
  * 0 km), and fixes whose event time is at or before the last event time
  * folded by a PREVIOUS batch are DROPPED — without that, out-of-order
  * arrival across micro-batches would fold in arrival order and silently
  * inflate total_km. Within a batch, distinct fixes sharing a timestamp all
  * fold (in deterministic (ts, lat, lon) order); exact duplicates drop.
  */
object StationTracker {

  private val EarthRadiusKm = 6371.0

  /** Idle-state expiry: a station whose last fix is more than this far behind
    * the watermark is dropped from state. EVENT-time based deliberately —
    * with ProcessingTimeTimeout, FlatMapGroupsWithStateExec reports
    * shouldRunAnotherBatch=true on every batch, so a Trigger.AvailableNow
    * refresh never terminates (observed as a livelock in StreamingSpec). */
  private[streaming] val IdleTimeoutMs: Long = 60 * 60 * 1000L

  private[streaming] def haversineKm(
      lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    // clamp: rounding on a near-antipodal pair can push a one ulp past 1,
    // and asin(>1) = NaN would POISON the cumulative km for the station's
    // whole remaining lifetime (r14 sweep — the classic haversine edge)
    2 * EarthRadiusKm * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** (lastLat, lastLon, cumulativeKm, nFixes, lastTsMicros, grain).
    *
    * The trailing `grain` field exists to make the r14 millis→micros unit
    * change a SCHEMA change: a checkpoint written by the millis build holds
    * a 5-field tuple, and Spark's state-schema compatibility check fails a
    * restart LOUDLY instead of silently reinterpreting stored millis as
    * micros — which would put the replay bound decades in the past and
    * double-count every redelivered fix (r14 diff review). */
  private[streaming] type TrackState = (Double, Double, Double, Long, Long, Long)

  /** lastTs unit marker: micros. */
  private[streaming] val GrainMicros = 1000000L

  private[streaming] val zeroState: TrackState =
    (Double.NaN, Double.NaN, 0.0, 0L, Long.MinValue, GrainMicros)

  /** Event-time MICROSECONDS of a fix — the grain of the sort key and the
    * cross-batch replay bound. `ts.getTime` alone is millisecond-truncated:
    * a genuinely newer fix in the same millisecond as the last folded one
    * compared equal to the bound and was silently dropped as a replay
    * (r14 sweep). floorDiv keeps pre-1970 timestamps exact. */
  private[streaming] def fixMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  /** The deterministic per-batch fold, shared VERBATIM by both tracker
    * implementations (StationTracker / StationTrackerTws) so their
    * documented semantic identity is structural, not copy-paste (r14
    * sweep): total (micros, lat, lon) sort, exact duplicates dropped,
    * strict replay bound only across batches (prev state's lastTsMicros).
    * Returns the folded state; callers compare nFixes to detect an
    * empty/all-late batch. */
  private[streaming] def foldBatch(
      batch: Iterator[PacketFix], prev: TrackState): TrackState = {
    // micro-batch iterators carry no order guarantee — order by a TOTAL key
    // (micros, lat, lon) so tied-timestamp fixes fold in a deterministic
    // order and are all counted within a batch. ACROSS batches the bound
    // stays strict: a fix at or before the last folded event time is
    // indistinguishable from an at-least-once redelivery and is dropped
    // (folding it in arrival order would count backtrack distance twice);
    // a tied fix split across two batches is therefore collapsed — the
    // price of replay safety. Exact within-batch duplicates (same ts AND
    // position) are redeliveries, dropped via the distinct pass.
    val fixesSorted = batch.toSeq.sortBy(f => (fixMicros(f.ts), f.lat, f.lon)).distinct
    var (lat, lon, km, n, lastUs, _) = prev
    val stateBound = lastUs // pre-batch bound: strict only across batches
    fixesSorted.foreach { f =>
      val us = fixMicros(f.ts)
      if (us > stateBound) {
        if (!lat.isNaN) km += haversineKm(lat, lon, f.lat, f.lon)
        lat = f.lat; lon = f.lon; n += 1; lastUs = us
      }
    }
    (lat, lon, km, n, lastUs, GrainMicros)
  }

  def track(fixes: Dataset[PacketFix]): Dataset[StationStat] = {
    implicit val stateEnc: Encoder[TrackState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TrackState]()
    implicit val outEnc: Encoder[StationStat] = Encoders.product[StationStat]
    implicit val keyEnc: Encoder[String] = Encoders.STRING

    fixes
      .withWatermark("ts", "2 hours")
      .groupByKey(_.callsign)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (callsign: String, batch: Iterator[PacketFix], state: GroupState[TrackState]) =>
          if (state.hasTimedOut) {
            // station went quiet past the idle timeout — release its state
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(zeroState)
            val next = foldBatch(batch, prev)
            if (next._4 == prev._4) Iterator.empty // nothing new folded (empty or all-late batch)
            else {
              state.update(next)
              // expire when the watermark passes lastTs + idle window; the
              // timestamp must sit strictly past the current watermark or
              // Spark rejects it (an already-idle station registers the
              // earliest legal expiry instead). lastTs is MICROS, timeouts
              // are millis.
              state.setTimeoutTimestamp(
                math.max(Math.floorDiv(next._5, 1000L) + IdleTimeoutMs,
                  state.getCurrentWatermarkMs() + 1))
              Iterator(StationStat(callsign, next._4, next._3))
            }
          }
      }
  }
}
