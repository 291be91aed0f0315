package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming ingest (SURVEY.md §2.10) — the reference's reason to
  * exist is collecting a live APRS-IS packet feed into queryable storage
  * (BASELINE.json north star: "Structured Streaming for APRS packet ingestion
  * + DataFrame writes"). This module is that pipeline, Spark-native:
  *
  *   readStream (drop-dir / socket)  →  parse (PacketParse)  →
  *   watermarked windowed aggregates / dedup  →  parquet sink (checkpointed)
  *
  * Every transformation is the SAME DataFrame expression as its batch twin in
  * graft.operators.TimeSeries — Structured Streaming reuses them unchanged,
  * which is what makes the batch queries the correctness oracle for the
  * stream (see StreamingSpec: AvailableNow over static input ≡ batch result).
  *
  * Scale design: state (window aggs, dedup keys) is bounded by the watermark —
  * late rows beyond 2 h are dropped and their state evicted, so executor
  * state-store size is O(active windows × key cardinality), independent of
  * stream length. Checkpointing makes the sink exactly-once.
  */
object EventStream {

  /** Event schema as produced by a normalized ingest drop-dir (micros ts). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a drop directory of event parquet files. */
  def readEvents(spark: SparkSession, dropDir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dropDir)

  /** Streaming twin of q_ts_tumbling: per-hour counts/sums per event_type.
    * The sum uses the exact-decimal discipline (graft.Exact): streaming state
    * merges add doubles in yet another order, so only an associative exact
    * accumulation keeps stream ≡ batch ≡ oracle bit-for-bit. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Exact.moneySum(col("value")).as("s"))

  /** Streaming twin of q_ts_session: 30-min-gap session windows per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Streaming dedup on the event id, state bounded by the watermark. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id")

  /** Stream-stream self-join: pairs of events of the same user within ±5 min
    * (the co-occurrence/correlation shape). Both sides carry watermarks and
    * the join condition carries the time bound, so each side's buffered state
    * is evicted once the other side's watermark passes the range — state is
    * O(5-min window × rate), independent of stream length. In append mode a
    * match is emitted as soon as both rows have arrived; over static
    * AvailableNow input that is ALL matches, which is what makes the batch
    * join the exact oracle. */
  def pairCounts(left: DataFrame, right: DataFrame): DataFrame = {
    val a = left.withWatermark("ts", "2 hours")
      .select(col("event_id").as("ida"), col("user_id").as("ua"), col("ts").as("tsa"))
    val b = right.withWatermark("ts", "2 hours")
      .select(col("event_id").as("idb"), col("user_id").as("ub"), col("ts").as("tsb"))
    a.join(b,
      col("ua") === col("ub") && col("ida") < col("idb") &&
        col("tsb") >= col("tsa") - expr("interval 5 minutes") &&
        col("tsb") <= col("tsa") + expr("interval 5 minutes"))
  }

  /** Checkpointed parquet sink, processing all available input then stopping
    * (Trigger.AvailableNow) — the batch-refresh deployment mode; drop the
    * trigger for a continuously-running collector. */
  def writeParquet(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}

/** APRS-flavored packet parsing as pure DataFrame expressions (no UDFs), the
  * parse stage between the raw text feed and the typed events table.
  *
  * Handles the TNC2 text form an APRS-IS feed delivers:
  * `CALLSIGN>DEST,PATH:payload`, covering the common payload families:
  *  - position reports, bare (`!` `=`) and timestamped (`/` `@`, 7-char
  *    DHM/HMS timestamp prefix), ddmm.hh minutes notation;
  *  - messages (`:ADDRESSEE :text`) with addressee + text extraction;
  *  - status reports (`>`);
  *  - objects (`;NAME*ddhhmmz` + position body) with name, alive/killed
  *    flag and the object's own position;
  *  - telemetry (`T#SSS,a1,..,a5,bits`): sequence, first analog channel,
  *    digital bits;
  *  - positionless weather (`_ddhhmmmc...s...g...t...`): wind dir/speed,
  *    gust, temperature;
  *  - a `packet_type` classification column and the Maidenhead grid locator
  *    (6 characters) derived from the parsed position.
  *
  * Unparseable fields are null/empty — the stream never dies on a malformed
  * packet; `packet_type` = 'other' routes them to a dead-letter-style branch.
  */
object PacketParse {

  private val posBody = "([0-9]{4}\\.[0-9]{2})([NS])(.)([0-9]{5}\\.[0-9]{2})([EW])"
  // bare position:  !/= + body       timestamped: / or @ + 7-char ts + body
  private val barePos = s"^[!=]$posBody"
  private val timedPos = s"^[/@][0-9]{6}[zh/]$posBody"
  // object: ;NAME(9ch) * (alive) or _ (killed) + 7-char ts + position body
  private val objPos = s"^;.{9}[*_][0-9]{6}[zh/]$posBody"
  // telemetry: T#SSS,a1,a2,a3,a4,a5,bits — classification keys on the HEADER
  // (seq prefix) so one malformed analog doesn't reclassify the packet; the
  // strict full pattern only gates field extraction (malformed → null field)
  private val telemetryHead = "^T#([0-9]{1,5}),"
  private val telemetry = "^T#([0-9]{1,5}),([0-9.-]+),[0-9.-]+,[0-9.-]+,[0-9.-]+,[0-9.-]+,([01]{8})"
  // positionless weather: _MMDDHHMM c(dir) s(speed) g(gust) t(temp F); same
  // header-vs-field split ('...' = field not reported)
  private val weatherHead = "^_[0-9]{8}"
  private val weather = "^_([0-9]{8})c([0-9. ]{3})s([0-9. ]{3})g([0-9. ]{3})t(-?[0-9. ]{2,3})"

  def parse(lines: DataFrame, raw: String = "raw"): DataFrame = {
    def grp(pattern: String, i: Int) = regexp_extract(col("payload"), pattern, i)
    def posGrp(i: Int) = // first matching flavor wins; "" when none matches
      when(grp(barePos, i) =!= "", grp(barePos, i))
        .when(grp(timedPos, i) =!= "", grp(timedPos, i))
        .otherwise(grp(objPos, i))
    def toDeg(s: org.apache.spark.sql.Column, degDigits: Int,
              hemi: org.apache.spark.sql.Column, neg: String): org.apache.spark.sql.Column =
      when(s === "", lit(null).cast(DoubleType)).otherwise(
        (substring(s, 1, degDigits).cast(DoubleType) +
          substring(s, degDigits + 1, 5).cast(DoubleType) / 60.0) *
          when(hemi === neg, -1.0).otherwise(1.0))

    val lat = toDeg(posGrp(1), 2, posGrp(2), "S")
    val lon = toDeg(posGrp(4), 3, posGrp(5), "W")

    // Maidenhead grid (6-char): field (20°×10°), square (2°×1°), subsquare.
    // lat/lon are range-gated to [-90,90]/[-180,180] upstream; the clamp here
    // handles only the legitimate boundary values (lat=90 / lon=180 map to
    // the last field per the standard) — without it they would index one past
    // the 18-letter array, and under Spark 4's ANSI-on default that would
    // KILL the stream.
    val adjLon = least(col("lon") + 180.0, lit(359.999999))
    val adjLat = least(col("lat") + 90.0, lit(179.999999))
    val gridExpr = concat(
      element_at(split(lit("ABCDEFGHIJKLMNOPQR"), ""), (floor(adjLon / 20) + 1).cast("int")),
      element_at(split(lit("ABCDEFGHIJKLMNOPQR"), ""), (floor(adjLat / 10) + 1).cast("int")),
      floor(pmod(adjLon, lit(20)) / 2).cast("int").cast("string"),
      floor(pmod(adjLat, lit(10))).cast("int").cast("string"),
      element_at(split(lit("abcdefghijklmnopqrstuvwx"), ""),
        (floor(pmod(adjLon, lit(2)) * 12) + 1).cast("int")),
      element_at(split(lit("abcdefghijklmnopqrstuvwx"), ""),
        (floor(pmod(adjLat, lit(1)) * 24) + 1).cast("int")))

    lines
      .withColumn("callsign", regexp_extract(col(raw), "^([A-Za-z0-9-]+)>", 1))
      .withColumn("path", regexp_extract(col(raw), "^[^>]+>([^:]*):", 1))
      .withColumn("payload", regexp_extract(col(raw), "^[^:]+:(.*)$", 1))
      .withColumn("dti", substring(col("payload"), 1, 1))
      // out-of-range bodies that the regex admits ("9999.99N") become null
      // here, so downstream classification dead-letters them like any other
      // unparseable position
      .withColumn("lat", when(lat.between(-90.0, 90.0), lat))
      .withColumn("lon", when(lon.between(-180.0, 180.0), lon))
      .withColumn("packet_type",
        when(col("callsign") === "" || col("payload") === "", "other")
          .when(col("dti").isin("!", "="),
            when(col("lat").isNotNull && col("lon").isNotNull, "position").otherwise("other"))
          .when(col("dti").isin("/", "@"),
            when(col("lat").isNotNull && col("lon").isNotNull, "position_ts").otherwise("other"))
          .when(col("dti") === ">", "status")
          .when(col("dti") === ":" &&
            regexp_extract(col("payload"), "^:([^:]{9}):", 1) =!= "", "message")
          .when(col("dti") === ";" &&
            col("lat").isNotNull && col("lon").isNotNull, "object")
          .when(col("dti") === "T" && col("payload").rlike(telemetryHead), "telemetry")
          .when(col("dti") === "_" && col("payload").rlike(weatherHead), "weather")
          .otherwise("other"))
      // objects: 9-char name (trailing-space padded) + alive/killed marker
      .withColumn("obj_name",
        when(col("packet_type") === "object",
          trim(regexp_extract(col("payload"), "^;(.{9})[*_]", 1))).otherwise(lit(null)))
      .withColumn("obj_killed",
        when(col("packet_type") === "object",
          regexp_extract(col("payload"), "^;.{9}([*_])", 1) === "_").otherwise(lit(null)))
      // telemetry: sequence number, first analog channel, digital bits.
      // try_cast throughout — under Spark 4's ANSI-on default a plain cast of
      // a malformed numeric field would KILL the stream, and these fields
      // come off the air
      .withColumn("tlm_seq",
        when(col("packet_type") === "telemetry",
          expr(s"try_cast(regexp_extract(payload, '$telemetryHead', 1) AS INT)"))
          .otherwise(lit(null)))
      .withColumn("tlm_a1",
        when(col("packet_type") === "telemetry",
          expr(s"try_cast(regexp_extract(payload, '$telemetry', 2) AS DOUBLE)"))
          .otherwise(lit(null)))
      .withColumn("tlm_bits",
        when(col("packet_type") === "telemetry" && grp(telemetry, 3) =!= "",
          grp(telemetry, 3)).otherwise(lit(null)))
      // weather: wind dir/speed/gust, temperature °F ('...' = not reported →
      // try_cast yields null rather than dying)
      .withColumn("wx_wind_dir",
        when(col("packet_type") === "weather",
          expr(s"try_cast(regexp_extract(payload, '$weather', 2) AS INT)"))
          .otherwise(lit(null)))
      .withColumn("wx_wind_speed",
        when(col("packet_type") === "weather",
          expr(s"try_cast(regexp_extract(payload, '$weather', 3) AS INT)"))
          .otherwise(lit(null)))
      .withColumn("wx_gust",
        when(col("packet_type") === "weather",
          expr(s"try_cast(regexp_extract(payload, '$weather', 4) AS INT)"))
          .otherwise(lit(null)))
      .withColumn("wx_temp_f",
        when(col("packet_type") === "weather",
          expr(s"try_cast(regexp_extract(payload, '$weather', 5) AS INT)"))
          .otherwise(lit(null)))
      .withColumn("msg_addressee",
        when(col("packet_type") === "message",
          trim(regexp_extract(col("payload"), "^:([^:]{9}):", 1))).otherwise(lit(null)))
      .withColumn("msg_text",
        when(col("packet_type") === "message",
          regexp_extract(col("payload"), "^:[^:]{9}:(.*)$", 1)).otherwise(lit(null)))
      .withColumn("status_text",
        when(col("packet_type") === "status", substring(col("payload"), 2, 256))
          .otherwise(lit(null)))
      .withColumn("grid",
        when(col("lat").isNotNull && col("lon").isNotNull, gridExpr).otherwise(lit(null)))
  }
}
