package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** [[StationTracker]] on the Spark 4.x `transformWithState` API — the
  * successor of `flatMapGroupsWithState` with explicit typed state variables
  * and first-class timers. Semantics are IDENTICAL to StationTracker.track
  * (pinned against it in StreamingSpec over the same multi-batch drop-dir):
  * same deterministic fold, same cross-batch replay guard, same event-time
  * idle expiry — expressed as a registered timer instead of
  * setTimeoutTimestamp.
  *
  * API differences worth recording:
  *  - state is a named [[ValueState]] obtained in init() from the handle
  *    (multiple independent variables per key; here track + its timer),
  *  - idle expiry is an explicit registerTimer/handleExpiredTimer pair; the
  *    previous timer must be deleted on re-arm (timers are not upserted the
  *    way setTimeoutTimestamp was),
  *  - the operator REQUIRES the RocksDB state-store provider
  *    (`spark.sql.streaming.stateStore.providerClass` →
  *    RocksDBStateStoreProvider) — the HDFS-backed default refuses to run it.
  *    That is also the provider a 100 TB deployment wants: state lives
  *    off-heap and spills to disk instead of growing the executor heap.
  */
object StationTrackerTws {

  private val IdleTimeoutMs: Long = 60 * 60 * 1000L

  /** (lastLat, lastLon, cumulativeKm, nFixes, lastTsMillis) */
  private type TrackState = (Double, Double, Double, Long, Long)

  private class Processor
      extends StatefulProcessor[String, PacketFix, StationStat] {

    @transient private var track: ValueState[TrackState] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val stateEnc: Encoder[TrackState] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
          Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaLong)
      track = getHandle.getValueState[TrackState]("track", stateEnc, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armedTimer", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        callsign: String,
        rows: Iterator[PacketFix],
        timerValues: TimerValues): Iterator[StationStat] = {
      // identical fold to StationTracker: total (ts, lat, lon) sort, exact
      // duplicates dropped, strict bound only across batches
      val fixesSorted = rows.toSeq.sortBy(f => (f.ts.getTime, f.lat, f.lon)).distinct
      var (lat, lon, km, n, lastTs) =
        if (track.exists()) track.get()
        else (Double.NaN, Double.NaN, 0.0, 0L, Long.MinValue)
      val nBefore = n
      val stateBound = lastTs
      fixesSorted.foreach { f =>
        if (f.ts.getTime > stateBound) {
          if (!lat.isNaN) km += StationTracker.haversineKm(lat, lon, f.lat, f.lon)
          lat = f.lat; lon = f.lon; n += 1; lastTs = f.ts.getTime
        }
      }
      if (n == nBefore) Iterator.empty
      else {
        track.update((lat, lon, km, n, lastTs))
        if (armed.exists()) getHandle.deleteTimer(armed.get())
        val expiry =
          math.max(lastTs + IdleTimeoutMs, timerValues.getCurrentWatermarkInMs() + 1)
        getHandle.registerTimer(expiry)
        armed.update(expiry)
        Iterator(StationStat(callsign, n, km))
      }
    }

    override def handleExpiredTimer(
        callsign: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[StationStat] = {
      // station idle past the event-time window: release its state; a later
      // fix restarts the track at 0 km, exactly like StationTracker's timeout
      track.clear()
      armed.clear()
      Iterator.empty
    }
  }

  def track(fixes: Dataset[PacketFix]): Dataset[StationStat] = {
    implicit val outEnc: Encoder[StationStat] = Encoders.product[StationStat]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    fixes
      .withWatermark("ts", "2 hours")
      .groupByKey(_.callsign)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
