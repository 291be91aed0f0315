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

  /** Streaming twin of q_ts_tumbling: per-hour counts/sums per event_type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s"))

  /** Streaming twin of q_ts_session: 30-min-gap session windows per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Streaming dedup on the event id, state bounded by the watermark. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id")

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
  * `CALLSIGN>DEST,PATH:payload`, with uncompressed position payloads like
  * `!4903.50N/07201.75W-comment` (ddmm.hh minutes notation). Unparseable
  * fields are null — the stream never dies on a malformed packet.
  */
object PacketParse {

  def parse(lines: DataFrame, raw: String = "raw"): DataFrame = {
    val payload = regexp_extract(col(raw), "^[^:]+:(.*)$", 1)
    val latStr = regexp_extract(col("payload"), "^[!=]([0-9]{4}\\.[0-9]{2})([NS])", 1)
    val latHemi = regexp_extract(col("payload"), "^[!=]([0-9]{4}\\.[0-9]{2})([NS])", 2)
    val lonStr = regexp_extract(col("payload"), "^[!=][0-9]{4}\\.[0-9]{2}[NS].([0-9]{5}\\.[0-9]{2})([EW])", 1)
    val lonHemi = regexp_extract(col("payload"), "^[!=][0-9]{4}\\.[0-9]{2}[NS].([0-9]{5}\\.[0-9]{2})([EW])", 2)
    def toDeg(s: org.apache.spark.sql.Column, degDigits: Int, hemi: org.apache.spark.sql.Column,
              neg: String): org.apache.spark.sql.Column =
      when(s === "", lit(null).cast(DoubleType)).otherwise(
        (substring(s, 1, degDigits).cast(DoubleType) +
          substring(s, degDigits + 1, 5).cast(DoubleType) / 60.0) *
          when(hemi === neg, -1.0).otherwise(1.0))
    lines
      .withColumn("callsign", regexp_extract(col(raw), "^([A-Za-z0-9-]+)>", 1))
      .withColumn("path", regexp_extract(col(raw), "^[^>]+>([^:]*):", 1))
      .withColumn("payload", payload)
      .withColumn("dti", substring(col("payload"), 1, 1))
      .withColumn("lat", toDeg(latStr, 2, latHemi, "S"))
      .withColumn("lon", toDeg(lonStr, 3, lonHemi, "W"))
  }
}
