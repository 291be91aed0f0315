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
  * across executors, checkpointed with the query; a production deployment
  * adds a GroupStateTimeout to expire stations that stop beaconing.
  */
object StationTracker {

  private val EarthRadiusKm = 6371.0

  private[streaming] def haversineKm(
      lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusKm * math.asin(math.sqrt(a))
  }

  /** (lastLat, lastLon, cumulativeKm, nFixes) */
  private type TrackState = (Double, Double, Double, Long)

  def track(fixes: Dataset[PacketFix]): Dataset[StationStat] = {
    implicit val stateEnc: Encoder[TrackState] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
        Encoders.scalaDouble, Encoders.scalaLong)
    implicit val outEnc: Encoder[StationStat] = Encoders.product[StationStat]
    implicit val keyEnc: Encoder[String] = Encoders.STRING

    fixes
      .groupByKey(_.callsign)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (callsign: String, batch: Iterator[PacketFix], state: GroupState[TrackState]) =>
          // micro-batch iterators carry no order guarantee — order by event time
          val fixesSorted = batch.toSeq.sortBy(_.ts.getTime)
          var (lat, lon, km, n) = state.getOption.getOrElse((Double.NaN, Double.NaN, 0.0, 0L))
          fixesSorted.foreach { f =>
            if (!lat.isNaN) km += haversineKm(lat, lon, f.lat, f.lon)
            lat = f.lat; lon = f.lon; n += 1
          }
          if (fixesSorted.isEmpty) Iterator.empty
          else {
            state.update((lat, lon, km, n))
            Iterator(StationStat(callsign, n, km))
          }
      }
  }
}
