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
  * Scale shape: parsing and position derivation are map-side; bounding box
  * AND the per-station track come out of ONE hash aggregation shuffling slim
  * (callsign, lat, lon) rows; max-displacement pairs are enumerated within
  * the collected track (a station's own positions, never cross-corpus), so
  * pair cost follows Σ track² per station — at 100 TB you'd bound tracks per
  * day exactly like the simhash block cap.
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
        // Tables.spread before the parse: the rendered lines come off a
        // single-split scan, and the regex parse (~0.3 ms/row — the dominant
        // leg) must run on every core, not one. No row-level filter on parse
        // output: a deterministic filter would be PUSHED THROUGH the
        // repartition (PushDownPredicates descends RepartitionByExpression),
        // dragging the whole regex chain back into the single-split stage —
        // instead every row aggregates and n_pos counts the 'position'
        // classification, so the parse columns evaluate strictly above the
        // exchange AND any parser drift still breaks the oracle hash (a
        // misparsed line changes n_pos and the null-skipping min/max).
        val parsed = graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(col("event_id"), raw.as("raw"))))
          .select(col("callsign"), col("packet_type"), col("lat"), col("lon"))
        // ONE aggregation produces bbox AND the per-station track: the regex
        // parse (the expensive map-side leg) runs exactly once. Max pairwise
        // displacement comes from the codegen'd MaxPairDist2 over the
        // collected track — one compiled O(track²) loop per station holding a
        // running max (the earlier nested transform/slice/flatten/array_max
        // spelling paid interpreted lambda dispatch per PAIR and materialized
        // the full pair array; max is order-insensitive, so collect_list's
        // nondeterministic order cannot change the result either way). A
        // station's track is small and bounded (at 100 TB: cap per station
        // per day, the simhash-block-cap discipline), so the O(track²) work
        // stays tiny while the corpus-sized work — the parse and the single
        // shuffle of slim (callsign, lat, lon) rows — stays linear. A
        // self-join formulation was measured 3× the parse cost: it
        // re-evaluated the parse on both join sides plus the bbox leg.
        val g = parsed.groupBy("callsign").agg(
          sum(when(col("packet_type") === "position", 1L).otherwise(0L)).as("n_pos"),
          round(min(col("lat")), 6).as("lat_min"),
          round(max(col("lat")), 6).as("lat_max"),
          round(min(col("lon")), 6).as("lon_min"),
          round(max(col("lon")), 6).as("lon_max"),
          collect_list(struct(col("lat"), col("lon"))).as("xs"))
        g.select(col("callsign"), col("n_pos"),
          col("lat_min"), col("lat_max"), col("lon_min"), col("lon_max"),
          round(coalesce(
            graft.functions.VectorExpr.maxPairDist2(col("xs")), lit(0.0)), 6).as("max_disp2"))
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
