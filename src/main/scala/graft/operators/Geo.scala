package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  * pair cost follows Σ min(track, TrackCap)² per station — the cap is
  * ENFORCED IN-PLAN ([[boundedTrack]]: deterministic sort + slice before
  * pair enumeration), the same discipline as the simhash block cap.
  */
object Geo {
  import Tables.table

  /** Enforced per-station track cap for the O(k²) max-displacement pair
    * stage — same discipline as the simhash block cap (DedupOps): the
    * collected track is sorted (struct lexicographic: lat, then lon — a
    * deterministic, partitioning-independent order) and truncated to its
    * first `cap` points BEFORE pair enumeration, so one pathological
    * station can never go n². Inert on the fixtures (tracks are O(100)
    * points at sf0.1 vs cap 8192 ≈ 67M pairs ≈ tens of ms), and MIRRORED
    * in the oracle (trk_rn <= 8192 over the same (lat, lon) order — any
    * tie split differs only among identical points, so the pair distances
    * are unaffected; r13 review: an unmirrored cap is a latent hash
    * divergence the moment a track crosses it). Note the cap bounds the
    * PAIR stage only — collect_list still buffers the full track before
    * the slice, so at 100 TB you additionally bound tracks per time
    * bucket upstream of the collect; this is the in-plan compute
    * backstop, not a memory bound. */
  private[graft] val TrackCap = 8192
  private[graft] def boundedTrack(xs: org.apache.spark.sql.Column,
      cap: Int = TrackCap): org.apache.spark.sql.Column =
    slice(sort_array(xs), 1, cap)

  /** TNC2-rendered click positions, parsed back through the production
    * PacketParse — shared by both geo queries. Rendering is exact integer
    * arithmetic on event_id residues; Tables.spread precedes the regex parse
    * (the dominant map-side leg) so it runs on every core; no deterministic
    * row filter sits between spread and the consumer aggregation/window
    * (PushDownPredicates would drag the parse back into the single-split
    * stage — see q_geo_positions' scaladoc). */
  /** The TNC2 bare-position line rendered from the event_id residues —
    * TNC2 line: CALL>APRS,TCPIP*:!ddmm.hhN/dddmm.hhE#. THE one copy of
    * the position encoding: the live-parse queries and the archive build
    * parse this exact rendering, so it must not fork (r13 review: the
    * block existed verbatim in both and a one-sided format change would
    * silently desynchronize the archive from the oracles). */
  private def withPositionRaw(e: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val r = e
      .withColumn("lat_deg", pmod(col("event_id"), lit(90L)))
      .withColumn("lat_minc", pmod(col("event_id") * 7, lit(6000L)))
      .withColumn("lon_deg", pmod(col("event_id") * 3, lit(180L)))
      .withColumn("lon_minc", pmod(col("event_id") * 13, lit(6000L)))
    r.withColumn("raw", concat(
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
      lit("#")))
  }


  /** The T# telemetry line rendered from the event_id residues (seq %03d,
    * a1 as d.d tenths, four zero channels, 8-bit binary pad) — shared by
    * q_packet_telemetry and q_packet_telemetry_scaled so the frame format
    * cannot fork between the two parse-identity gates (r13 review). */
  private def telemetryRaw: org.apache.spark.sql.Column = {
    val v = pmod(col("event_id") * 3, lit(1000L))
    concat(
      lit("U"), col("user_id").cast("string"), lit(">APRS,TCPIP*:T#"),
      format_string("%03d", pmod(col("event_id"), lit(1000L))), lit(","),
      concat(expr("(event_id * 3) % 1000 div 10").cast("string"), lit("."),
        pmod(v, lit(10L)).cast("string")),
      lit(",0,0,0,0,"),
      lpad(conv(pmod(col("event_id"), lit(256L)).cast("string"), 10, 2), 8, "0"))
  }

  private def parsedClicks(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val e = withPositionRaw(table(s, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id")))
    graft.streaming.PacketParse
      .parse(Tables.spread(s, e.select(col("event_id"), col("raw"))))
      .select(col("event_id"), col("callsign"), col("packet_type"),
        col("lat"), col("lon"), col("grid"))
  }

  /** Write-once TIME-partitioned packet archive — the production collector
    * layout SCALE.md prescribes for the 100 TB packet store: event-time
    * `p_date=/p_hour=` directories (PacketCollector's live sink buckets by
    * station prefix; the nightly compaction job re-lays the archive out by
    * time, because retention, backfill, and nearly every analytical scan are
    * time-ranged). Built once per (session, sfDir) like lsh_bands/ann_index;
    * Bench times it as an explicit artifact. 720 partitions (30 days × 24 h)
    * at every SF — partition count scales with TIME SPAN, not data volume,
    * which is what keeps the layout viable at 100 TB (a day-hour dir just
    * holds more files). */
  private val archiveDirs =
    graft.Tables.registerSessionScoped(new java.util.concurrent.ConcurrentHashMap[(Long, String), String]())

  private[graft] def ensureArchive(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    archiveDirs.computeIfAbsent((Tables.sessionId(s), dir), _ => {
      val out = graft.Scratch.dir("graft_pkt_arch")
      graft.TempReaper.add(out)
      val e = withPositionRaw(table(s, dir, "events")
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts")))
      graft.streaming.PacketParse
        .parse(Tables.spread(s, e.select(col("event_id"), col("ts"), col("raw"))))
        .select(col("event_id"), col("ts"), col("callsign"),
          col("packet_type"), col("lat"), col("lon"))
        .withColumn("p_date", to_date(col("ts")))
        .withColumn("p_hour", hour(col("ts")))
        // shuffle on the partition columns BEFORE the partitioned write:
        // without it every input task fans out across all 720 time dirs
        // (tasks × dirs tiny files — measured 14.8 s for this fixture);
        // with it each (date, hour) cell is owned by one task → one
        // well-sized file per dir, which IS the compaction contract the
        // nightly re-layout exists to provide
        .repartition(col("p_date"), col("p_hour"))
        .write.partitionBy("p_date", "p_hour").mode("overwrite").parquet(out)
      out
    })

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_packet_time_pruned",
      "Time-ranged scan over the p_date/p_hour-partitioned packet archive " +
        "(the production layout: retention, backfill, and time-windowed " +
        "analytics all prune by directory): one day, hours 06-11 — " +
        "PartitionFilters must eliminate 714 of 720 partitions BEFORE any " +
        "file is opened (plan-pinned in PlanShapeSpec). Positions are " +
        "recovered to exact centi-minute integer units (the " +
        "q_geo_track_length discipline), so per-station sums are " +
        "associative BIGINT arithmetic and the oracle recomputes them " +
        "straight from the generating integers with the same time " +
        "predicate.",
      (s, dir) => {
        s.read.parquet(ensureArchive(s, dir))
          .filter(col("p_date") === lit("2024-01-15").cast("date") &&
            col("p_hour").between(6, 11))
          .filter(col("packet_type") === "position")
          .select(col("callsign"),
            round(col("lat") * 6000).cast(LongType).as("latu"),
            round(col("lon") * 6000).cast(LongType).as("lonu"))
          .groupBy("callsign")
          .agg(count(lit(1)).as("n_pos"), sum(col("latu")).as("lat_units"),
            sum(col("lonu")).as("lon_units"))
          .orderBy("callsign")
      },
      Some(
        """WITH e AS (SELECT event_id, user_id FROM events
          |  WHERE event_type = 'click'
          |    AND CAST(ts AS DATE) = DATE '2024-01-15'
          |    AND hour(ts) BETWEEN 6 AND 11),
          |u AS (SELECT 'U' || CAST(user_id AS VARCHAR) AS callsign,
          |    (CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END)
          |      * (event_id % 90 * 6000 + (event_id * 7) % 6000) AS latu,
          |    (CASE WHEN event_id % 3 = 0 THEN 1 ELSE -1 END)
          |      * ((event_id * 3) % 180 * 6000 + (event_id * 13) % 6000) AS lonu
          |  FROM e)
          |SELECT callsign, count(*) AS n_pos,
          |  CAST(sum(latu) AS BIGINT) AS lat_units,
          |  CAST(sum(lonu) AS BIGINT) AS lon_units
          |FROM u GROUP BY callsign ORDER BY callsign""".stripMargin)),

    GraftQuery(
      "q_geo_positions",
      "Per-station geo analytics over TNC2-parsed positions: bounding box + max " +
        "pairwise equirectangular squared displacement; packets rendered from events " +
        "integers, parsed by the production PacketParse, oracle computes positions " +
        "directly — format∘parse pinned as identity.",
      (s, dir) => {
        // No row-level filter on parse output: every rendered line aggregates
        // and n_pos counts the 'position' classification, so the parse
        // columns evaluate strictly above the spread exchange AND any parser
        // drift still breaks the oracle hash (a misparsed line changes n_pos
        // and the null-skipping min/max).
        val parsed = parsedClicks(s, dir)
          .select(col("callsign"), col("packet_type"), col("lat"), col("lon"))
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
            graft.functions.VectorExpr.maxPairDist2(boundedTrack(col("xs"))),
            lit(0.0)), 6).as("max_disp2"))
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
          |pc AS (SELECT callsign, event_id, lat, lon,
          |    row_number() OVER (PARTITION BY callsign ORDER BY lat, lon)
          |      AS trk_rn
          |  FROM p),
          |disp AS (SELECT a.callsign, max((a.lat - b.lat) * (a.lat - b.lat) +
          |      (a.lon - b.lon) * (a.lon - b.lon)) AS md2
          |  FROM pc a JOIN pc b ON a.callsign = b.callsign AND a.event_id < b.event_id
          |  WHERE a.trk_rn <= 8192 AND b.trk_rn <= 8192
          |  GROUP BY a.callsign)
          |SELECT bbox.callsign, n_pos, lat_min, lat_max, lon_min, lon_max,
          |  round(coalesce(md2, 0.0), 6) AS max_disp2
          |FROM bbox LEFT JOIN disp ON bbox.callsign = disp.callsign
          |ORDER BY max_disp2 DESC, bbox.callsign LIMIT 20""".stripMargin)
    ),

    GraftQuery(
      "q_geo_track_length",
      "Per-station track odometer over TNC2-parsed positions: sum of squared " +
        "displacements between CONSECUTIVE points (event order). EXACT under " +
        "any partitioning: positions are recovered from the parsed doubles " +
        "into integer centi-minute units (round(lat·6000) — the parse error " +
        "is ~1e-10 against a 0.5 rounding margin), so every Δ², the per-" +
        "segment sum, and the per-station total are associative BIGINT " +
        "arithmetic. The oracle computes the same integer units directly " +
        "from the event_id residues, pinning format∘parse as the identity in " +
        "INTEGER space. One window pass (lag, shuffles slim unit rows) + one " +
        "hash agg; the dlat IS NOT NULL gate references the window output, so " +
        "no filter can be pushed below the spread exchange.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val p = parsedClicks(s, dir)
          .select(col("event_id"), col("callsign"),
            round(col("lat") * 6000).cast("long").as("latu"),
            round(col("lon") * 6000).cast("long").as("lonu"))
        val w = Window.partitionBy("callsign").orderBy("event_id")
        p.withColumn("dlat", col("latu") - lag(col("latu"), 1).over(w))
          .withColumn("dlon", col("lonu") - lag(col("lonu"), 1).over(w))
          .filter(col("dlat").isNotNull)
          .groupBy("callsign")
          .agg(count(lit(1)).as("n_seg"),
            sum(col("dlat") * col("dlat") + col("dlon") * col("dlon")).as("track_d2"))
          .orderBy(col("track_d2").desc, col("callsign"))
          .limit(20)
      },
      Some(
        """WITH e AS (SELECT event_id, user_id,
          |    event_id % 90 AS lat_deg, (event_id * 7) % 6000 AS lat_minc,
          |    (event_id * 3) % 180 AS lon_deg, (event_id * 13) % 6000 AS lon_minc
          |  FROM events WHERE event_type = 'click'),
          |p AS (SELECT 'U' || CAST(user_id AS VARCHAR) AS callsign, event_id,
          |    (lat_deg * 6000 + lat_minc) * (CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END) AS latu,
          |    (lon_deg * 6000 + lon_minc) * (CASE WHEN event_id % 3 = 0 THEN 1 ELSE -1 END) AS lonu
          |  FROM e),
          |d AS (SELECT callsign,
          |    latu - lag(latu) OVER (PARTITION BY callsign ORDER BY event_id) AS dlat,
          |    lonu - lag(lonu) OVER (PARTITION BY callsign ORDER BY event_id) AS dlon
          |  FROM p)
          |SELECT callsign, count(*) AS n_seg,
          |  CAST(sum(dlat * dlat + dlon * dlon) AS BIGINT) AS track_d2
          |FROM d WHERE dlat IS NOT NULL GROUP BY callsign
          |ORDER BY track_d2 DESC, callsign LIMIT 20""".stripMargin)),

    GraftQuery(
      "q_geo_grid_density",
      "Position density per Maidenhead grid locator — the APRS coverage-map " +
        "query: count positions per 6-char grid square as derived by the " +
        "production parser, top-50 squares. The oracle recomputes the full " +
        "field/square/subsquare formula from the residue-derived lat/lon with " +
        "the identical floor/fmod/substr steps, so the gate pins the parser's " +
        "grid derivation end-to-end (no other gated query consumes it). " +
        "Map-side derivation + one hash agg + TakeOrdered.",
      (s, dir) =>
        parsedClicks(s, dir)
          .groupBy("grid")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("grid"))
          .limit(50),
      Some(
        """WITH e AS (SELECT event_id, user_id,
          |    event_id % 90 AS lat_deg, (event_id * 7) % 6000 AS lat_minc,
          |    (event_id * 3) % 180 AS lon_deg, (event_id * 13) % 6000 AS lon_minc
          |  FROM events WHERE event_type = 'click'),
          |p AS (SELECT
          |    (CAST(lat_deg AS DOUBLE) + CAST(lat_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE -1.0 END) + 90.0 AS alat,
          |    (CAST(lon_deg AS DOUBLE) + CAST(lon_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE -1.0 END) + 180.0 AS alon
          |  FROM e),
          |a AS (SELECT least(alat, 179.999999) AS alat, least(alon, 359.999999) AS alon FROM p),
          |g AS (SELECT
          |    substr('ABCDEFGHIJKLMNOPQR', CAST(floor(alon / 20) AS INT) + 1, 1) ||
          |    substr('ABCDEFGHIJKLMNOPQR', CAST(floor(alat / 10) AS INT) + 1, 1) ||
          |    CAST(CAST(floor(fmod(alon, 20) / 2) AS INT) AS VARCHAR) ||
          |    CAST(CAST(floor(fmod(alat, 10)) AS INT) AS VARCHAR) ||
          |    substr('abcdefghijklmnopqrstuvwx', CAST(floor(fmod(alon, 2) * 12) AS INT) + 1, 1) ||
          |    substr('abcdefghijklmnopqrstuvwx', CAST(floor(fmod(alat, 1) * 24) AS INT) + 1, 1)
          |    AS grid
          |  FROM a)
          |SELECT grid, count(*) AS n FROM g GROUP BY grid
          |ORDER BY n DESC, grid LIMIT 50""".stripMargin)),

    GraftQuery(
      "q_packet_telemetry",
      "Telemetry channel analytics over TNC2-parsed T# packets: per-station " +
        "packet count, max sequence, exact analog-channel mass (tlm_a1 " +
        "recovered to integer TENTHS — round(a1·10), parse error ~1e-13 " +
        "against the 0.5 margin), and total set bits in the digital channel " +
        "(popcount of the parsed 8-bit string). Pins the parser's telemetry " +
        "fields (seq / a1 / bits) under the gate; the oracle computes every " +
        "aggregate directly from the event integers (bit_count for the " +
        "digital channel), so all sums are associative BIGINT.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"))
        val raw = telemetryRaw
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .groupBy("callsign")
          .agg(
            count(lit(1)).as("n_tel"),
            max(col("tlm_seq")).as("max_seq"),
            sum(round(col("tlm_a1") * 10).cast("long")).as("sum_a1_tenths"),
            sum(length(regexp_replace(col("tlm_bits"), "0", "")).cast("long")).as("sum_bits"))
          .orderBy("callsign")
      },
      Some(
        """SELECT 'U' || CAST(user_id AS VARCHAR) AS callsign,
          |  count(*) AS n_tel,
          |  CAST(max(event_id % 1000) AS INT) AS max_seq,
          |  CAST(sum((event_id * 3) % 1000) AS BIGINT) AS sum_a1_tenths,
          |  CAST(sum(bit_count(event_id % 256)) AS BIGINT) AS sum_bits
          |FROM events WHERE event_type = 'error'
          |GROUP BY callsign ORDER BY callsign""".stripMargin)),

    GraftQuery(
      "q_packet_weather",
      "Weather-station analytics over TNC2-parsed positionless weather " +
        "packets (_MMDDHHMM c s g t): per-station report count, exact wind-" +
        "direction mass, peak gust, and minimum temperature — the APRS WX " +
        "roll-up. Pins the parser's weather fields (wind dir/speed, gust, " +
        "temp incl. the negative-temperature path) under the gate; all " +
        "aggregates are integer min/max/sums computed by the oracle directly " +
        "from the event integers.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"))
        val speed = pmod(col("event_id") * 7, lit(100L))
        val raw = concat(
          lit("W"), col("user_id").cast("string"), lit(">APRS,TCPIP*:_"),
          format_string("%02d%02d%02d%02d",
            lit(1) + pmod(col("event_id"), lit(12L)),
            lit(1) + pmod(col("event_id"), lit(28L)),
            pmod(col("event_id"), lit(24L)),
            pmod(col("event_id") * 11, lit(60L))),
          lit("c"), format_string("%03d", pmod(col("event_id"), lit(360L))),
          lit("s"), format_string("%03d", speed),
          lit("g"), format_string("%03d", speed + pmod(col("event_id"), lit(20L))),
          lit("t"), format_string("%03d", pmod(col("event_id"), lit(120L)) - 20))
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .groupBy("callsign")
          .agg(
            count(lit(1)).as("n_wx"),
            sum(col("wx_wind_dir").cast("long")).as("sum_dir"),
            max(col("wx_gust")).as("max_gust"),
            min(col("wx_temp_f")).as("min_temp"))
          .orderBy("callsign")
      },
      Some(
        """SELECT 'W' || CAST(user_id AS VARCHAR) AS callsign,
          |  count(*) AS n_wx,
          |  CAST(sum(event_id % 360) AS BIGINT) AS sum_dir,
          |  CAST(max((event_id * 7) % 100 + event_id % 20) AS INT) AS max_gust,
          |  CAST(min(event_id % 120 - 20) AS INT) AS min_temp
          |FROM events WHERE event_type = 'signup'
          |GROUP BY callsign ORDER BY callsign""".stripMargin)),

    GraftQuery(
      "q_packet_messages",
      "Message-traffic analytics over TNC2-parsed APRS messages " +
        "(:ADDRESSEE:text with the 9-char padded addressee): per-ADDRESSEE " +
        "inbound count and exact text mass — the who-talks-to-whom roll-up. " +
        "Pins the parser's message fields (addressee trim, text extraction) " +
        "under the gate; the oracle reproduces the deterministic payload " +
        "lengths from the event integers.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"))
        val addressee = concat(lit("U"), pmod(col("user_id") + 1, lit(150L)).cast("string"))
        val raw = concat(
          lit("U"), col("user_id").cast("string"), lit(">APRS,TCPIP*::"),
          rpad(addressee, 9, " "), lit(":m"),
          pmod(col("event_id"), lit(97L)).cast("string"))
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .groupBy("msg_addressee")
          .agg(count(lit(1)).as("n_msg"),
            sum(length(col("msg_text")).cast("long")).as("text_chars"))
          .orderBy("msg_addressee")
      },
      Some(
        """SELECT 'U' || CAST((user_id + 1) % 150 AS VARCHAR) AS msg_addressee,
          |  count(*) AS n_msg,
          |  CAST(sum(1 + CASE WHEN event_id % 97 < 10 THEN 1 ELSE 2 END) AS BIGINT) AS text_chars
          |FROM events WHERE event_type = 'view'
          |GROUP BY msg_addressee ORDER BY msg_addressee""".stripMargin)),

    GraftQuery(
      "q_packet_objects",
      "Object-report analytics over TNC2-parsed object packets " +
        "(;NAME*ddhhmmz + position body): per-object report count, killed-" +
        "report count, and the object's position mass in exact integer " +
        "centi-minute units — pins the parser's object fields (9-char name " +
        "trim, alive/killed flag, and the OBJECT-flavor position extraction, " +
        "which none of the bare-position queries exercise). Oracle derives " +
        "everything from the event integers; all sums are associative BIGINT.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"))
          .withColumn("lat_deg", pmod(col("event_id"), lit(90L)))
          .withColumn("lat_minc", pmod(col("event_id") * 7, lit(6000L)))
          .withColumn("lon_deg", pmod(col("event_id") * 3, lit(180L)))
          .withColumn("lon_minc", pmod(col("event_id") * 13, lit(6000L)))
        val raw = concat(
          lit("U"), col("user_id").cast("string"), lit(">APRS,TCPIP*:;"),
          rpad(concat(lit("OBJ"), pmod(col("user_id"), lit(37L)).cast("string")), 9, " "),
          when(pmod(col("event_id"), lit(5L)) === 0, "_").otherwise("*"),
          format_string("%06d", pmod(col("event_id"), lit(235959L))), lit("z"),
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
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .groupBy("obj_name")
          .agg(
            count(lit(1)).as("n_rep"),
            sum(when(col("obj_killed"), 1L).otherwise(0L)).as("n_killed"),
            sum(round(col("lat") * 6000).cast("long")).as("lat_mass"),
            sum(round(col("lon") * 6000).cast("long")).as("lon_mass"))
          .orderBy("obj_name")
      },
      Some(
        """SELECT 'OBJ' || CAST(user_id % 37 AS VARCHAR) AS obj_name,
          |  count(*) AS n_rep,
          |  CAST(sum(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_killed,
          |  CAST(sum((event_id % 90 * 6000 + (event_id * 7) % 6000)
          |    * (CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT) AS lat_mass,
          |  CAST(sum(((event_id * 3) % 180 * 6000 + (event_id * 13) % 6000)
          |    * (CASE WHEN event_id % 3 = 0 THEN 1 ELSE -1 END)) AS BIGINT) AS lon_mass
          |FROM events WHERE event_type = 'purchase'
          |GROUP BY obj_name ORDER BY obj_name""".stripMargin)),

    GraftQuery(
      "q_packet_paths",
      "Digipeater path analytics over VARIABLE rendered paths — the network-" +
        "infrastructure view (which digis carry the traffic, which actually " +
        "digipeated): 1–3 WIDEn-N hops per packet with a '*' used marker, " +
        "all derived from event-id residues; per digi the heard count, " +
        "used count, and distinct stations. The other packet queries render " +
        "a CONSTANT path, so this is the first query that gates the " +
        "parser's path capture on varying content (multi-hop, used flags, " +
        "dest stripping via pos>=1 after the split). Scale shape: render + " +
        "parse + split map-side behind the spread; one digi-keyed hash agg " +
        "of slim rows (the distinct-station leg is the usual two-phase " +
        "distinct).",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"))
        val nh = pmod(col("event_id"), lit(3L)) + lit(1L)
        // div-based residues: multiplicative ones correlate (k·id mod 2 is
        // id's parity for every odd k, and (5·id mod 3) is a function of
        // (id mod 3) = nh), collapsing the digi vocabulary and pinning the
        // used marker off hop 3 — id div p for distinct primes decorrelates
        val usedIdx = pmod(expr("event_id div 11"), nh) + lit(1L)
        def digi(h: Int) = concat(
          lit(s"WIDE$h-"),
          (pmod(expr(s"event_id div ${2 * h + 1}"), lit(2L)) + 1).cast("string"),
          when(usedIdx === h, lit("*")).otherwise(lit("")))
        val path = concat_ws(",", digi(1),
          when(nh >= 2, digi(2)), when(nh >= 3, digi(3)))
        val raw = concat(
          lit("U"), col("user_id").cast("string"), lit(">APRS,"), path, lit(":>OK"))
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .select(col("callsign"), posexplode(split(col("path"), ",")))
          .filter(col("pos") >= 1) // pos 0 is the dest (APRS), not a digi
          .groupBy(regexp_replace(col("col"), "\\*$", "").as("digi"))
          .agg(
            count(lit(1)).as("n_heard"),
            sum(when(col("col").like("%*"), 1L).otherwise(0L)).as("n_used"),
            countDistinct(col("callsign")).as("n_stations"))
          .orderBy("digi")
      },
      Some(
        """WITH e AS (SELECT event_id, user_id, 1 + event_id % 3 AS nh
          |  FROM events WHERE event_type = 'click'),
          |hops AS (
          |  SELECT event_id, user_id, nh, 1 AS h FROM e
          |  UNION ALL SELECT event_id, user_id, nh, 2 FROM e WHERE nh >= 2
          |  UNION ALL SELECT event_id, user_id, nh, 3 FROM e WHERE nh >= 3)
          |SELECT 'WIDE' || CAST(h AS VARCHAR) || '-' ||
          |    CAST(1 + (event_id // (2*h + 1)) % 2 AS VARCHAR) AS digi,
          |  count(*) AS n_heard,
          |  CAST(sum(CASE WHEN h = 1 + (event_id // 11) % nh THEN 1 ELSE 0 END) AS BIGINT) AS n_used,
          |  count(DISTINCT user_id) AS n_stations
          |FROM hops GROUP BY digi ORDER BY digi""".stripMargin)),

    GraftQuery(
      "q_geo_zorder",
      "Z-order (Morton) locality key — the space-filling-curve layout move " +
        "behind data-skipping file layouts: click positions quantize to an " +
        "8-bit (x, y) grid in PURE integer arithmetic (signed centiminutes " +
        "from the same event_id residues the TNC2 renderer uses — no " +
        "floats anywhere), the 16-bit Morton code interleaves the bits as " +
        "a sum of 16 div/mod terms identical on both engines, and the " +
        "report counts packets + distinct stations per coarse 64-tile " +
        "(top-6-bit) cell. Why it matters at 100 TB: sorting/bucketing " +
        "files by zval makes every 2D range predicate prune to " +
        "O(perimeter) files instead of O(rows) — the key is the layout " +
        "artifact, and this query IS its derivation, gated exactly. " +
        "Map-side arithmetic + one small aggregation; the distinct " +
        "count shuffles only (tile, user) pairs.",
      (s, dir) => {
        val id = col("event_id")
        val slat = (pmod(id, lit(90L)) * 6000 + pmod(id * 7, lit(6000L))) *
          when(pmod(id, lit(2L)) === 0, 1L).otherwise(-1L)
        val slon = (pmod(id * 3, lit(180L)) * 6000 + pmod(id * 13, lit(6000L))) *
          when(pmod(id, lit(3L)) === 0, 1L).otherwise(-1L)
        val xi = call_function("div", (slon + lit(1080000L)) * 256, lit(2160000L))
        val yi = call_function("div", (slat + lit(540000L)) * 256, lit(1080000L))
        val z = (0 until 8).map { i =>
          call_function("div", xi, lit(1L << i)) % 2 * lit(1L << (2 * i)) +
            call_function("div", yi, lit(1L << i)) % 2 * lit(1L << (2 * i + 1))
        }.reduce(_ + _)
        table(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("user_id"), z.as("zval"))
          .groupBy(call_function("div", col("zval"), lit(1024L)).as("tile"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("n").desc, col("tile"))
          .limit(20)
      },
      Some(
        """WITH p AS (
          |  SELECT event_id, user_id,
          |    ((event_id % 90) * 6000 + (event_id * 7) % 6000)
          |      * (CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END) AS slat,
          |    (((event_id * 3) % 180) * 6000 + (event_id * 13) % 6000)
          |      * (CASE WHEN event_id % 3 = 0 THEN 1 ELSE -1 END) AS slon
          |  FROM events WHERE event_type = 'click'),
          |xy AS (SELECT user_id,
          |    ((slon + 1080000) * 256) // 2160000 AS xi,
          |    ((slat + 540000) * 256) // 1080000 AS yi
          |  FROM p),
          |z AS (SELECT user_id,
          |    (((xi // 1) % 2) * 1 + ((yi // 1) % 2) * 2
          |   + ((xi // 2) % 2) * 4 + ((yi // 2) % 2) * 8
          |   + ((xi // 4) % 2) * 16 + ((yi // 4) % 2) * 32
          |   + ((xi // 8) % 2) * 64 + ((yi // 8) % 2) * 128
          |   + ((xi // 16) % 2) * 256 + ((yi // 16) % 2) * 512
          |   + ((xi // 32) % 2) * 1024 + ((yi // 32) % 2) * 2048
          |   + ((xi // 64) % 2) * 4096 + ((yi // 64) % 2) * 8192
          |   + ((xi // 128) % 2) * 16384 + ((yi // 128) % 2) * 32768) AS zval
          |  FROM xy)
          |SELECT zval // 1024 AS tile, count(*) AS n, count(DISTINCT user_id) AS n_users
          |FROM z GROUP BY 1 ORDER BY n DESC, tile LIMIT 20""".stripMargin)),

    GraftQuery(
      "q_geo_join_grid",
      "Spatial self-join via 2-D grid bucketing — the proximity-pair " +
        "operator (stations within 0.5° of each other) over PARSED " +
        "positions: each left point fans out to its 3×3 neighbor cells " +
        "(cell = 0.5° grid, matching the radius so any qualifying pair " +
        "shares a probed cell), the right side keys by home cell, one " +
        "equi-join on the cell key, then the exact squared-degree " +
        "predicate. Every qualifying ordered pair is found EXACTLY once " +
        "(the right point's home cell is unique and always probed), so no " +
        "distinct pass. This is the 2-D twin of q_join_band's 1-D bucket " +
        "expansion: O(9·n) fan-out + hash join instead of the quadratic " +
        "cross filter; at 100 TB the cell key is the shuffle key and skewed " +
        "megacells fall back to the salting discipline. The oracle keeps " +
        "the naive pair form (with a lat band so its optimizer gets a fair " +
        "range-join plan) — the gate proves the bucket rewrite.",
      (s, dir) => {
        // materialize the slim parsed relation ONCE: both join sides read it,
        // and without this the physical plan duplicates the TNC2 parse subtree
        // (format+regex over the corpus, the dominant cost) — the same
        // single-parse discipline the tfidf family pins for tokenize
        val p = parsedClicks(s, dir)
          .filter(col("packet_type") === "position")
          .select(col("event_id"), col("lat"), col("lon"))
          .localCheckpoint(true)
        val cs = 0.5d
        val a = p.select(col("event_id").as("ida"), col("lat").as("lata"), col("lon").as("lona"),
            explode(array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
              struct(
                (floor(col("lat") / cs).cast("long") + lit(dx.toLong)).as("cx"),
                (floor(col("lon") / cs).cast("long") + lit(dy.toLong)).as("cy")))): _*))
              .as("c"))
          .select(col("ida"), col("lata"), col("lona"), col("c.cx"), col("c.cy"))
        val b = p.select(col("event_id").as("idb"), col("lat").as("latb"), col("lon").as("lonb"),
          floor(col("lat") / cs).cast("long").as("cx"),
          floor(col("lon") / cs).cast("long").as("cy"))
        val d2 = (col("lata") - col("latb")) * (col("lata") - col("latb")) +
          (col("lona") - col("lonb")) * (col("lona") - col("lonb"))
        a.join(b, Seq("cx", "cy"))
          .filter(col("ida") < col("idb") && d2 <= lit(0.25d))
          .agg(
            count(lit(1)).as("n_pairs"),
            countDistinct(col("ida")).as("n_left"),
            round(min(d2), 9).as("min_d2"))
      },
      Some(
        """WITH e AS (SELECT event_id,
          |    event_id % 90 AS lat_deg, (event_id * 7) % 6000 AS lat_minc,
          |    (event_id * 3) % 180 AS lon_deg, (event_id * 13) % 6000 AS lon_minc
          |  FROM events WHERE event_type = 'click'),
          |p AS (SELECT event_id,
          |    (CAST(lat_deg AS DOUBLE) + CAST(lat_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE -1.0 END) AS lat,
          |    (CAST(lon_deg AS DOUBLE) + CAST(lon_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE -1.0 END) AS lon
          |  FROM e),
          |pairs AS (
          |  SELECT a.event_id AS ida,
          |    (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon) AS d2
          |  FROM p a JOIN p b
          |    ON b.lat BETWEEN a.lat - 0.5 AND a.lat + 0.5
          |   AND b.lon BETWEEN a.lon - 0.5 AND a.lon + 0.5
          |   AND a.event_id < b.event_id)
          |SELECT count(*) AS n_pairs, count(DISTINCT ida) AS n_left,
          |  round(min(d2), 9) AS min_d2
          |FROM pairs WHERE d2 <= 0.25""".stripMargin)),

    GraftQuery(
      "q_packet_mice",
      "Mic-E packet analytics — the dominant real-traffic APRS encoding " +
        "(latitude digits, N/S, longitude offset and E/W ride the " +
        "DESTINATION field; longitude and speed/course pack into byte−28 " +
        "info bytes): per-station report count, position bounding box, and " +
        "exact speed/course mass. The rendering side ENCODES every event's " +
        "integer residues through the full Mic-E scheme (all four " +
        "longitude-degree encoder branches: +190 for 0–9°, plain for " +
        "10–99°, +180 for 100–109°, offset for 110–179°), the production " +
        "parser decodes them back, and the oracle computes positions and " +
        "speed/course DIRECTLY from the integers — encode∘decode pinned as " +
        "the exact identity over the whole domain. Map-side render+parse, " +
        "one hash agg on slim (callsign, lat, lon, speed) rows.",
      (s, dir) => {
        import org.apache.spark.sql.Column
        val e = table(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"))
        def P(c: Column, m: Long) = pmod(c, lit(m))
        def dv(a: Column, b: Long) = call_function("div", a, lit(b))
        def ch(c: Column) = call_function("char", c)
        val latDeg = P(col("event_id"), 90L)
        val latMinC = P(col("event_id") * 7, 6000L)
        val lonDeg = P(col("event_id") * 3, 180L)
        val lonMinC = P(col("event_id") * 13, 6000L)
        val north = P(col("event_id"), 2L) === 0
        val west = P(col("event_id"), 3L) =!= 0
        val spd = P(col("event_id") * 11, 800L)
        val crs = P(col("event_id") * 17, 400L)
        // destination: lat digits with message bits (standard set: P–Y) on
        // chars 1–3, N/S on 4, longitude offset on 5, E/W on 6
        val off = lonDeg <= 9 || lonDeg >= 100
        def flagDigit(d: Column, flag: Column) =
          ch(when(flag, d + 80).otherwise(d + 48))
        val dest = concat(
          ch(dv(latDeg, 10L) + 80), ch(P(latDeg, 10L) + 80),
          ch(dv(latMinC, 1000L) + 80),
          flagDigit(P(dv(latMinC, 100L), 10L), north),
          flagDigit(P(dv(latMinC, 10L), 10L), off),
          flagDigit(P(latMinC, 10L), west))
        // info bytes: the four lon-degree encoder branches, minutes +60
        // below 10', hundredths, then speed/course split 10·SP+DC
        val b1 = when(lonDeg <= 9, lonDeg + 118)
          .when(lonDeg <= 99, lonDeg + 28)
          .when(lonDeg <= 109, lonDeg + 8)
          .otherwise(lonDeg - 72)
        val lonMin = dv(lonMinC, 100L)
        val b2 = lonMin + 28 + when(lonMin <= 9, 60).otherwise(0)
        val b3 = P(lonMinC, 100L) + 28
        val b4 = dv(spd, 10L) + 28
        val b5 = P(spd, 10L) * 10 + dv(crs, 100L) + 28
        val b6 = P(crs, 100L) + 28
        val raw = concat(
          lit("U"), col("user_id").cast("string"), lit(">"), dest,
          lit(",TCPIP*:`"), ch(b1), ch(b2), ch(b3), ch(b4), ch(b5), ch(b6),
          lit(">/"))
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .groupBy("callsign")
          .agg(
            sum(when(col("packet_type") === "mice", 1L).otherwise(0L)).as("n_mice"),
            round(min(col("lat")), 6).as("lat_min"),
            round(max(col("lat")), 6).as("lat_max"),
            round(min(col("lon")), 6).as("lon_min"),
            round(max(col("lon")), 6).as("lon_max"),
            sum(col("mice_speed")).as("speed_sum"),
            sum(col("mice_course")).as("course_sum"))
          .orderBy("callsign")
      },
      Some(
        """WITH e AS (SELECT event_id, user_id,
          |    event_id % 90 AS lat_deg, (event_id * 7) % 6000 AS lat_minc,
          |    (event_id * 3) % 180 AS lon_deg, (event_id * 13) % 6000 AS lon_minc,
          |    (event_id * 11) % 800 AS spd, (event_id * 17) % 400 AS crs
          |  FROM events WHERE event_type = 'purchase'),
          |p AS (SELECT 'U' || CAST(user_id AS VARCHAR) AS callsign, spd, crs,
          |    (CAST(lat_deg AS DOUBLE) + CAST(lat_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE -1.0 END) AS lat,
          |    (CAST(lon_deg AS DOUBLE) + CAST(lon_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE -1.0 END) AS lon
          |  FROM e)
          |SELECT callsign, count(*) AS n_mice,
          |  round(min(lat), 6) AS lat_min, round(max(lat), 6) AS lat_max,
          |  round(min(lon), 6) AS lon_min, round(max(lon), 6) AS lon_max,
          |  CAST(sum(spd) AS BIGINT) AS speed_sum,
          |  CAST(sum(crs) AS BIGINT) AS course_sum
          |FROM p GROUP BY callsign ORDER BY callsign""".stripMargin)),

    GraftQuery(
      "q_packet_compressed",
      "Compressed-position packet analytics (base-91 body after `!`): " +
        "per-station report count and bounding box. The rendering side " +
        "encodes an integer y/x pair (0…68566680 — the exact in-range " +
        "domain) into four base-91 characters each, the production parser " +
        "decodes lat = 90 − y/380926 and lon = −180 + x/190463, and the " +
        "oracle computes the same IEEE tree directly from the integers — " +
        "encode∘decode pinned as the identity over the full base-91 " +
        "alphabet. Map-side render+parse, one hash agg.",
      (s, dir) => {
        import org.apache.spark.sql.Column
        val e = table(s, dir, "events")
          .filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"))
        def P(c: Column, m: Long) = pmod(c, lit(m))
        def dv(a: Column, b: Long) = call_function("div", a, lit(b))
        def ch(c: Column) = call_function("char", c)
        val lval = P(col("event_id") * 31, 68566681L)
        val nval = P(col("event_id") * 37, 68566681L)
        def b91(v: Column) = concat(
          ch(dv(v, 753571L) + 33), ch(P(dv(v, 8281L), 91L) + 33),
          ch(P(dv(v, 91L), 91L) + 33), ch(P(v, 91L) + 33))
        val raw = concat(
          lit("U"), col("user_id").cast("string"), lit(">APRS,TCPIP*:!/"),
          b91(lval), b91(nval), lit(">   "))
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .groupBy("callsign")
          .agg(
            sum(when(col("packet_type") === "position", 1L).otherwise(0L)).as("n_pos"),
            round(min(col("lat")), 6).as("lat_min"),
            round(max(col("lat")), 6).as("lat_max"),
            round(min(col("lon")), 6).as("lon_min"),
            round(max(col("lon")), 6).as("lon_max"))
          .orderBy("callsign")
      },
      Some(
        """WITH e AS (SELECT event_id, user_id,
          |    (event_id * 31) % 68566681 AS lval,
          |    (event_id * 37) % 68566681 AS nval
          |  FROM events WHERE event_type = 'error'),
          |p AS (SELECT 'U' || CAST(user_id AS VARCHAR) AS callsign,
          |    90.0 - CAST(lval AS DOUBLE) / 380926.0 AS lat,
          |    -180.0 + CAST(nval AS DOUBLE) / 190463.0 AS lon
          |  FROM e)
          |SELECT callsign, count(*) AS n_pos,
          |  round(min(lat), 6) AS lat_min, round(max(lat), 6) AS lat_max,
          |  round(min(lon), 6) AS lon_min, round(max(lon), 6) AS lon_max
          |FROM p GROUP BY callsign ORDER BY callsign""".stripMargin)),

    GraftQuery(
      "q_packet_nmea",
      "NMEA tracker-payload analytics ($GPRMC / $GPGGA): per-station " +
        "count and position bounding box — the older-tracker family the " +
        "TNC2 classifier previously routed to 'other'. Rendering " +
        "alternates both sentence types per event (RMC with status A, GGA " +
        "with fix quality 1), the production parser extracts the ddmm.mm " +
        "coordinate fields, and the oracle computes the same positions " +
        "directly from the integers — both sentence layouts pinned under " +
        "one gate. Map-side render+parse, one hash agg.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"))
        val latS = concat(
          format_string("%02d%02d.%02d",
            pmod(col("event_id"), lit(90L)),
            (pmod(col("event_id") * 7, lit(6000L)) / lit(100)).cast("long"),
            pmod(pmod(col("event_id") * 7, lit(6000L)), lit(100L))),
          lit(","),
          when(pmod(col("event_id"), lit(2L)) === 0, "N").otherwise("S"))
        val lonS = concat(
          format_string("%03d%02d.%02d",
            pmod(col("event_id") * 3, lit(180L)),
            (pmod(col("event_id") * 13, lit(6000L)) / lit(100)).cast("long"),
            pmod(pmod(col("event_id") * 13, lit(6000L)), lit(100L))),
          lit(","),
          when(pmod(col("event_id"), lit(3L)) === 0, "E").otherwise("W"))
        val time = format_string("%06d", pmod(col("event_id"), lit(235959L)))
        val sentence = when(pmod(col("event_id"), lit(5L)) < 3,
          concat(lit("$GPRMC,"), time, lit(",A,"), latS, lit(","), lonS,
            lit(",000.5,054.7,191194,,*00")))
          .otherwise(concat(lit("$GPGGA,"), time, lit(","), latS, lit(","),
            lonS, lit(",1,08,0.9,100.0,M,,M,,*00")))
        val raw = concat(lit("T"), col("user_id").cast("string"),
          lit(">APRS,TCPIP*:"), sentence)
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .groupBy("callsign")
          .agg(
            sum(when(col("packet_type") === "nmea", 1L).otherwise(0L)).as("n_nmea"),
            round(min(col("lat")), 6).as("lat_min"),
            round(max(col("lat")), 6).as("lat_max"),
            round(min(col("lon")), 6).as("lon_min"),
            round(max(col("lon")), 6).as("lon_max"))
          .orderBy("callsign")
      },
      Some(
        """WITH e AS (SELECT event_id, user_id,
          |    event_id % 90 AS lat_deg, (event_id * 7) % 6000 AS lat_minc,
          |    (event_id * 3) % 180 AS lon_deg, (event_id * 13) % 6000 AS lon_minc
          |  FROM events WHERE event_type = 'view'),
          |p AS (SELECT 'T' || CAST(user_id AS VARCHAR) AS callsign,
          |    (CAST(lat_deg AS DOUBLE) + CAST(lat_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE -1.0 END) AS lat,
          |    (CAST(lon_deg AS DOUBLE) + CAST(lon_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE -1.0 END) AS lon
          |  FROM e)
          |SELECT callsign, count(*) AS n_nmea,
          |  round(min(lat), 6) AS lat_min, round(max(lat), 6) AS lat_max,
          |  round(min(lon), 6) AS lon_min, round(max(lon), 6) AS lon_max
          |FROM p GROUP BY callsign ORDER BY callsign""".stripMargin)),

    GraftQuery(
      "q_packet_thirdparty",
      "Third-party (igate) traffic analytics (`}` payload-in-payload): " +
        "per-igate relayed-packet count, distinct relayed stations, and the " +
        "relayed-position bounding box. The rendering side wraps an " +
        "uncompressed position packet inside a `}` tunnel per event, the " +
        "production parser re-parses the inner packet ONE level and " +
        "surfaces its position plus the inner source callsign, and the " +
        "oracle computes everything directly from the integers — the " +
        "igate-output family that previously landed in 'other'.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"))
        val raw = concat(
          lit("IG"), pmod(col("user_id"), lit(7L)).cast("string"),
          lit(">APRS,TCPIP*:}U"), col("user_id").cast("string"),
          lit(">APRS,TCPIP*:!"),
          format_string("%02d%02d.%02d",
            pmod(col("event_id"), lit(90L)),
            (pmod(col("event_id") * 7, lit(6000L)) / lit(100)).cast("long"),
            pmod(pmod(col("event_id") * 7, lit(6000L)), lit(100L))),
          when(pmod(col("event_id"), lit(2L)) === 0, "N").otherwise("S"),
          lit("/"),
          format_string("%03d%02d.%02d",
            pmod(col("event_id") * 3, lit(180L)),
            (pmod(col("event_id") * 13, lit(6000L)) / lit(100)).cast("long"),
            pmod(pmod(col("event_id") * 13, lit(6000L)), lit(100L))),
          when(pmod(col("event_id"), lit(3L)) === 0, "E").otherwise("W"),
          lit("#"))
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .groupBy("callsign")
          .agg(
            sum(when(col("packet_type") === "thirdparty", 1L).otherwise(0L))
              .as("n_tp"),
            countDistinct(col("tp_callsign")).as("n_stations"),
            round(min(col("lat")), 6).as("lat_min"),
            round(max(col("lat")), 6).as("lat_max"),
            round(min(col("lon")), 6).as("lon_min"),
            round(max(col("lon")), 6).as("lon_max"))
          .orderBy("callsign")
      },
      Some(
        """WITH e AS (SELECT event_id, user_id,
          |    event_id % 90 AS lat_deg, (event_id * 7) % 6000 AS lat_minc,
          |    (event_id * 3) % 180 AS lon_deg, (event_id * 13) % 6000 AS lon_minc
          |  FROM events WHERE event_type = 'signup'),
          |p AS (SELECT 'IG' || CAST(user_id % 7 AS VARCHAR) AS callsign,
          |    'U' || CAST(user_id AS VARCHAR) AS tp,
          |    (CAST(lat_deg AS DOUBLE) + CAST(lat_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE -1.0 END) AS lat,
          |    (CAST(lon_deg AS DOUBLE) + CAST(lon_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE -1.0 END) AS lon
          |  FROM e)
          |SELECT callsign, count(*) AS n_tp, count(DISTINCT tp) AS n_stations,
          |  round(min(lat), 6) AS lat_min, round(max(lat), 6) AS lat_max,
          |  round(min(lon), 6) AS lon_min, round(max(lon), 6) AS lon_max
          |FROM p GROUP BY callsign ORDER BY callsign""".stripMargin)),

    GraftQuery(
      "q_packet_items",
      "Item-report analytics (`)` DTI — the portable-object sibling of `;`, " +
        "the last standard position-bearing data type): per-station item " +
        "count, killed-item count, distinct item names, and the bounding " +
        "box. The rendering side encodes variable-length names (4 and 9 " +
        "chars — both ends of the 3–9 spec range), live `!` and killed `_` " +
        "terminators, and the standard uncompressed position residues; the " +
        "production parser classifies, extracts the un-padded name and the " +
        "killed flag, and decodes the position; the oracle rebuilds " +
        "everything from the integers — encode∘parse pinned as the " +
        "identity.",
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"))
        val nm = concat(
          when(pmod(col("event_id"), lit(2L)) === 0, lit("ITM"))
            .otherwise(lit("LONGITEM")),
          pmod(col("event_id"), lit(10L)).cast("string"))
        val term = when(pmod(col("event_id"), lit(5L)) === 0, lit("_"))
          .otherwise(lit("!"))
        val raw = concat(
          lit("U"), col("user_id").cast("string"), lit(">APRS,TCPIP*:)"),
          nm, term,
          format_string("%02d%02d.%02d",
            pmod(col("event_id"), lit(90L)),
            (pmod(col("event_id") * 7, lit(6000L)) / lit(100)).cast("long"),
            pmod(pmod(col("event_id") * 7, lit(6000L)), lit(100L))),
          when(pmod(col("event_id"), lit(2L)) === 0, "N").otherwise("S"),
          lit("/"),
          format_string("%03d%02d.%02d",
            pmod(col("event_id") * 3, lit(180L)),
            (pmod(col("event_id") * 13, lit(6000L)) / lit(100)).cast("long"),
            pmod(pmod(col("event_id") * 13, lit(6000L)), lit(100L))),
          when(pmod(col("event_id"), lit(3L)) === 0, "E").otherwise("W"),
          lit(">"))
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .groupBy("callsign")
          .agg(
            sum(when(col("packet_type") === "item", 1L).otherwise(0L))
              .as("n_items"),
            sum(when(col("obj_killed"), 1L).otherwise(0L)).as("n_killed"),
            countDistinct(col("obj_name")).as("n_names"),
            round(min(col("lat")), 6).as("lat_min"),
            round(max(col("lat")), 6).as("lat_max"),
            round(min(col("lon")), 6).as("lon_min"),
            round(max(col("lon")), 6).as("lon_max"))
          .orderBy("callsign")
      },
      Some(
        """WITH e AS (SELECT event_id, user_id,
          |    event_id % 90 AS lat_deg, (event_id * 7) % 6000 AS lat_minc,
          |    (event_id * 3) % 180 AS lon_deg, (event_id * 13) % 6000 AS lon_minc
          |  FROM events WHERE event_type = 'click'),
          |p AS (SELECT 'U' || CAST(user_id AS VARCHAR) AS callsign,
          |    (CASE WHEN event_id % 2 = 0 THEN 'ITM' ELSE 'LONGITEM' END)
          |      || CAST(event_id % 10 AS VARCHAR) AS nm,
          |    CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END AS killed,
          |    (CAST(lat_deg AS DOUBLE) + CAST(lat_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE -1.0 END) AS lat,
          |    (CAST(lon_deg AS DOUBLE) + CAST(lon_minc AS DOUBLE) / 100.0 / 60.0)
          |      * (CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE -1.0 END) AS lon
          |  FROM e)
          |SELECT callsign, count(*) AS n_items,
          |  CAST(sum(killed) AS BIGINT) AS n_killed,
          |  count(DISTINCT nm) AS n_names,
          |  round(min(lat), 6) AS lat_min, round(max(lat), 6) AS lat_max,
          |  round(min(lon), 6) AS lon_min, round(max(lon), 6) AS lon_max
          |FROM p GROUP BY callsign ORDER BY callsign""".stripMargin)),

    GraftQuery(
      "q_packet_ambiguous",
      "Position-ambiguity analytics (space-substituted trailing digits in " +
        "uncompressed positions — the coarsened-position convention real " +
        "trackers emit, previously rejected to 'other'): per ambiguity " +
        "level 0–4, report count, distinct stations, and the bounding box " +
        "of the zero-filled decoded positions. The rendering side spaces " +
        "out the last `amb` of the four minute digits in BOTH coordinates; " +
        "the parser classifies the packet as a position, zero-fills the " +
        "spaced digits and surfaces the level in `pos_ambiguity`; the " +
        "oracle rebuilds the zero-filled integers directly.",
      (s, dir) => {
        import org.apache.spark.sql.Column
        val e = table(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"))
        val amb = pmod(col("event_id"), lit(5L))
        val lm = format_string("%04d", pmod(col("event_id") * 7, lit(6000L)))
        val om = format_string("%04d", pmod(col("event_id") * 13, lit(6000L)))
        def dchar(fmt: Column, i: Int): Column =
          when(lit(i.toLong) <= lit(4L) - amb, substring(fmt, i, 1))
            .otherwise(lit(" "))
        val raw = concat(
          lit("U"), col("user_id").cast("string"), lit(">APRS,TCPIP*:!"),
          format_string("%02d", pmod(col("event_id"), lit(90L))),
          dchar(lm, 1), dchar(lm, 2), lit("."), dchar(lm, 3), dchar(lm, 4),
          when(pmod(col("event_id"), lit(2L)) === 0, "N").otherwise("S"),
          lit("/"),
          format_string("%03d", pmod(col("event_id") * 3, lit(180L))),
          dchar(om, 1), dchar(om, 2), lit("."), dchar(om, 3), dchar(om, 4),
          when(pmod(col("event_id"), lit(3L)) === 0, "E").otherwise("W"),
          lit(">"))
        graft.streaming.PacketParse
          .parse(Tables.spread(s, e.select(raw.as("raw"))))
          .groupBy("pos_ambiguity")
          .agg(
            count(lit(1)).as("n_pos"),
            countDistinct(col("callsign")).as("n_stations"),
            round(min(col("lat")), 6).as("lat_min"),
            round(max(col("lat")), 6).as("lat_max"),
            round(min(col("lon")), 6).as("lon_min"),
            round(max(col("lon")), 6).as("lon_max"))
          .orderBy("pos_ambiguity")
      },
      Some(
        """WITH e AS (SELECT event_id, user_id, event_id % 5 AS amb,
          |    event_id % 90 AS lat_deg, (event_id * 7) % 6000 AS lat_minc,
          |    (event_id * 3) % 180 AS lon_deg, (event_id * 13) % 6000 AS lon_minc
          |  FROM events WHERE event_type = 'purchase'),
          |z AS (SELECT amb, user_id,
          |    CASE amb WHEN 0 THEN lat_minc WHEN 1 THEN lat_minc // 10 * 10
          |      WHEN 2 THEN lat_minc // 100 * 100
          |      WHEN 3 THEN lat_minc // 1000 * 1000 ELSE 0 END AS lm,
          |    CASE amb WHEN 0 THEN lon_minc WHEN 1 THEN lon_minc // 10 * 10
          |      WHEN 2 THEN lon_minc // 100 * 100
          |      WHEN 3 THEN lon_minc // 1000 * 1000 ELSE 0 END AS om,
          |    lat_deg, lon_deg,
          |    CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE -1.0 END AS lats,
          |    CASE WHEN event_id % 3 = 0 THEN 1.0 ELSE -1.0 END AS lons
          |  FROM e),
          |p AS (SELECT CAST(amb AS BIGINT) AS pos_ambiguity, user_id,
          |    (CAST(lat_deg AS DOUBLE) + CAST(lm AS DOUBLE) / 100.0 / 60.0) * lats AS lat,
          |    (CAST(lon_deg AS DOUBLE) + CAST(om AS DOUBLE) / 100.0 / 60.0) * lons AS lon
          |  FROM z)
          |SELECT pos_ambiguity, count(*) AS n_pos,
          |  count(DISTINCT 'U' || CAST(user_id AS VARCHAR)) AS n_stations,
          |  round(min(lat), 6) AS lat_min, round(max(lat), 6) AS lat_max,
          |  round(min(lon), 6) AS lon_min, round(max(lon), 6) AS lon_max
          |FROM p GROUP BY pos_ambiguity ORDER BY pos_ambiguity""".stripMargin)),

    GraftQuery(
      "q_packet_telemetry_scaled",
      "Telemetry METADATA join — the aprsdb-style physical-units rendering: " +
        "stations ship their scaling equations as EQNS. definition messages " +
        "addressed to THEMSELVES, and every T# analog reading scales " +
        "through value = a·v² + b·v + c before display. The data frames " +
        "and the per-station EQNS message frames render separately, each " +
        "parses once through the production parser (the metadata relation " +
        "is station-grain → broadcast side of the join, the 100 TB shape), " +
        "and the scaled mass is computed in EXACT hundredth-units integer " +
        "arithmetic (v = vt/10 tenths ⇒ 100·value = a·vt² + 10·b·vt + " +
        "100·c), so the oracle's direct integer computation is " +
        "bit-identical. Pins the message-addressee extraction, the EQNS " +
        "text path, and the telemetry-to-metadata join in one gate. " +
        "PRICED MACHINERY (r14, closing the per-round outlier " +
        "adjudication): the production parser round-trip IS the product " +
        "here — two relations render TNC2 frames and parse them back " +
        "through PacketFields before the join — while the DuckDB twin " +
        "computes the integers directly with no render/parse at all " +
        "(0.008 s). r14 JobCensus at sf0.1: 0.66 s = 3 jobs / 7 stages / " +
        "66 tasks — two render→parse passes over 150k-row relations plus " +
        "the broadcast build; the same fair-pricing treatment as the " +
        "streaming family's source→state-store→sink machinery.",
      (s, dir) => {
        // The APRS addressee field is EXACTLY 9 chars, so a station id must
        // render to ≤8 digits or rpad TRUNCATES it and the self-addressed
        // EQNS frame silently stops matching its own callsign (advisor r12:
        // latent production/oracle divergence at large SF). Bound the id
        // domain ONCE here — identity at every current fixture (ids ≪ 10^8)
        // — and mirror the same bound in the oracle CTE, so both engines
        // agree at any scale instead of diverging past 9-digit ids.
        val ed = table(s, dir, "events")
          .filter(col("event_type") === "view")
          .select(col("event_id"),
            pmod(col("user_id"), lit(100000000L)).as("user_id"))
        val rawT = telemetryRaw
        val rawE = concat(
          lit("U"), col("user_id").cast("string"), lit(">APRS,TCPIP*::"),
          rpad(concat(lit("U"), col("user_id").cast("string")), 9, " "),
          lit(":EQNS."),
          pmod(col("user_id"), lit(5L)).cast("string"), lit(","),
          (pmod(col("user_id"), lit(7L)) + 1).cast("string"), lit(","),
          pmod(col("user_id"), lit(11L)).cast("string"))
        val tel = graft.streaming.PacketParse
          .parse(Tables.spread(s, ed.select(rawT.as("raw"))))
          .filter(col("packet_type") === "telemetry")
          .select(col("callsign"),
            round(col("tlm_a1") * 10).cast("long").as("vt"))
        val eq = graft.streaming.PacketParse
          .parse(ed.select(col("user_id")).distinct().select(rawE.as("raw")))
          .filter(col("packet_type") === "message" &&
            col("msg_addressee") === col("callsign") &&
            col("msg_text").startsWith("EQNS."))
          .select(col("callsign").as("eq_callsign"),
            split(expr("substring(msg_text, 6)"), ",").as("co"))
          .select(col("eq_callsign"),
            element_at(col("co"), 1).cast("long").as("a"),
            element_at(col("co"), 2).cast("long").as("b"),
            element_at(col("co"), 3).cast("long").as("c"))
        tel.join(broadcast(eq), col("callsign") === col("eq_callsign"))
          .groupBy("callsign")
          .agg(
            count(lit(1)).as("n_tel"),
            max(col("a")).as("a"), max(col("b")).as("b"), max(col("c")).as("c"),
            sum(col("a") * col("vt") * col("vt") + lit(10L) * col("b") * col("vt")
              + lit(100L) * col("c")).as("sum_scaled_h"))
          .orderBy("callsign")
      },
      Some(
        """WITH e AS (SELECT event_id, user_id % 100000000 AS user_id
          |  FROM events WHERE event_type = 'view'),
          |t AS (SELECT 'U' || CAST(user_id AS VARCHAR) AS callsign,
          |    user_id, (event_id * 3) % 1000 AS vt
          |  FROM e)
          |SELECT callsign, count(*) AS n_tel,
          |  CAST(max(user_id % 5) AS BIGINT) AS a,
          |  CAST(max(user_id % 7 + 1) AS BIGINT) AS b,
          |  CAST(max(user_id % 11) AS BIGINT) AS c,
          |  CAST(sum((user_id % 5) * vt * vt + 10 * (user_id % 7 + 1) * vt
          |    + 100 * (user_id % 11)) AS BIGINT) AS sum_scaled_h
          |FROM t GROUP BY callsign ORDER BY callsign""".stripMargin))
  )
}
