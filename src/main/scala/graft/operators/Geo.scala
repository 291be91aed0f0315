package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Position analytics over TNC2-parsed APRS packets (SURVEY.md §2.10 domain
  * set) — the reference domain's bread-and-butter: where has each station
  * been, and how far has it moved.
  *
  * The gated query exercises the REAL parser
  * ([[graft.streaming.PacketParse]]): TNC2 position lines are rendered
  * deterministically from the events table (integer arithmetic on event_id →
  * ddmm.hh minutes notation, callsign from user_id), parsed back through the
  * production parse expressions, then aggregated per callsign into a bounding
  * box plus the maximum pairwise displacement. The DuckDB oracle computes the
  * same positions DIRECTLY from the integers with the identical IEEE
  * expression ((deg + min/60.0) * sign) — so the gate pins format∘parse as
  * the exact identity on top of the geo math. Displacement is the
  * equirectangular SQUARED distance (Δlat² + Δlon²) — pure multiply-add,
  * bit-identical across engines, no libm trig whose last-ulp behavior
  * diverges.
  *
  * Scale shape: parsing and position derivation are map-side; the bounding
  * box is one hash aggregation; max-displacement pairs are blocked per
  * callsign (a station's own track, never cross-corpus), so the self-join is
  * an equi-join on callsign whose cost follows Σ track² per station — at
  * 100 TB you'd bound tracks per day exactly like the simhash block cap.
  */
object Geo {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_geo_positions",
      "Per-station geo analytics over TNC2-parsed positions: bounding box + max " +
        "pairwise equirectangular squared displacement; packets rendered from events " +
        "integers, parsed by the production PacketParse, oracle computes positions " +
        "directly — format∘parse pinned as identity.",
      (s, dir) => {
        // deterministic position synthesis: degrees/centiminutes/hemispheres
        // from event_id residues (all exact integer ops on both engines)
        val e = table(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"))
          .withColumn("lat_deg", pmod(col("event_id"), lit(90L)))
          .withColumn("lat_minc", pmod(col("event_id") * 7, lit(6000L)))
          .withColumn("lon_deg", pmod(col("event_id") * 3, lit(180L)))
          .withColumn("lon_minc", pmod(col("event_id") * 13, lit(6000L)))
        // TNC2 line: CALL>APRS,TCPIP*:!ddmm.hhN/dddmm.hhE#  (bare position)
        val raw = concat(
          lit("U"), col("user_id").cast("string"), lit(">APRS,TCPIP*:!"),
          format_string("%02d%02d.%02d",
            col("lat_deg"), (col("lat_minc") / lit(100)).cast("long"),
            pmod(col("lat_minc"), lit(100L))),
          when(pmod(col("event_id"), lit(2L)) === 0, "N").otherwise("S"),
          lit("/"),
          format_string("%03d%02d.%02d",
            col("lon_deg"), (col("lon_minc") / lit(100)).cast("long"),
            pmod(col("lon_minc"), lit(100L))),
          when(pmod(col("event_id"), lit(3L)) === 0, "E").otherwise("W"),
          lit("#"))
        val parsed = graft.streaming.PacketParse
          .parse(e.select(col("event_id"), raw.as("raw")))
          .filter(col("packet_type") === "position")
          .select(col("callsign"), col("event_id"), col("lat"), col("lon"))
        val bbox = parsed.groupBy("callsign").agg(
          count(lit(1)).as("n_pos"),
          round(min(col("lat")), 6).as("lat_min"),
          round(max(col("lat")), 6).as("lat_max"),
          round(min(col("lon")), 6).as("lon_min"),
          round(max(col("lon")), 6).as("lon_max"))
        val a = parsed.select(col("callsign").as("ca"), col("event_id").as("ida"),
          col("lat").as("la"), col("lon").as("loa"))
        val b = parsed.select(col("callsign").as("cb"), col("event_id").as("idb"),
          col("lat").as("lb"), col("lon").as("lob"))
        val disp = a.join(b, col("ca") === col("cb") && col("ida") < col("idb"))
          .select(col("ca"),
            ((col("la") - col("lb")) * (col("la") - col("lb")) +
              (col("loa") - col("lob")) * (col("loa") - col("lob"))).as("d2"))
          .groupBy("ca").agg(max(col("d2")).as("md2"))
        bbox.join(disp, col("callsign") === col("ca"), "left")
          .select(col("callsign"), col("n_pos"),
            col("lat_min"), col("lat_max"), col("lon_min"), col("lon_max"),
            round(coalesce(col("md2"), lit(0.0)), 6).as("max_disp2"))
          .orderBy(col("max_disp2").desc, col("callsign"))
          .limit(20)
      },
      Some(
        """WITH e AS (SELECT event_id, user_id,
          |    event_id % 90 AS lat_deg, (event_id * 7) % 6000 AS lat_minc,
          |    (event_id * 3) % 180 AS lon_deg, (event_id * 13) % 6000 AS lon_minc
          |  FROM events WHERE event_type = 'click'),
          |p AS (SELECT 'U' || CAST(user_id AS VARCHAR) AS callsign, event_id,
          |    (CAST(lat_deg AS DOUBLE) + CAST(lat_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE -1.0 END) AS lat,
          |    (CAST(lon_deg AS DOUBLE) + CAST(lon_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE -1.0 END) AS lon
          |  FROM e),
          |bbox AS (SELECT callsign, count(*) AS n_pos,
          |    round(min(lat), 6) AS lat_min, round(max(lat), 6) AS lat_max,
          |    round(min(lon), 6) AS lon_min, round(max(lon), 6) AS lon_max
          |  FROM p GROUP BY callsign),
          |disp AS (SELECT a.callsign, max((a.lat - b.lat) * (a.lat - b.lat) +
          |      (a.lon - b.lon) * (a.lon - b.lon)) AS md2
          |  FROM p a JOIN p b ON a.callsign = b.callsign AND a.event_id < b.event_id
          |  GROUP BY a.callsign)
          |SELECT bbox.callsign, n_pos, lat_min, lat_max, lon_min, lon_max,
          |  round(coalesce(md2, 0.0), 6) AS max_disp2
          |FROM bbox LEFT JOIN disp ON bbox.callsign = disp.callsign
          |ORDER BY max_disp2 DESC, bbox.callsign LIMIT 20""".stripMargin)
    )
  )
}
