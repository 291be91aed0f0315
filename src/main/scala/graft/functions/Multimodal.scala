package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.11 stretch set): media as opaque binary
  * payloads with typed metadata, plus a batched decode/feature-extract stage.
  *
  * The fixtures carry no real media, so payloads are derived deterministically
  * from the documents table (UTF-8 bytes of text) and the decode step is a
  * clearly-marked deterministic STUB — this container has no image/audio
  * codecs. What IS real, and tested: the schema (binary + metadata struct),
  * the partition-preserving batched mapPartitions plumbing, and the
  * aggregation over extracted features. Swapping [[MediaDecode.decodeStub]]
  * for a JNI/codec call changes nothing else.
  *
  * Scale: decode is a narrow map-side transformation — no shuffle; partition
  * sizing (spark.sql.files.maxPartitionBytes) is the only knob that matters.
  */
object Multimodal {
  import Tables.table

  /** Attach a binary payload + media-type metadata to each document. */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"))

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_multimodal_meta",
      "Binary-payload metadata aggregation: per media-type counts and byte totals " +
        "over the opaque payload column (octet_length on binary).",
      (s, dir) =>
        attachBinary(table(s, dir, "documents"))
          .groupBy("media_type")
          .agg(
            count(lit(1)).as("n"),
            sum(octet_length(col("payload"))).as("total_bytes"),
            max(octet_length(col("payload"))).as("max_bytes"))
          .orderBy("media_type"),
      Some(
        """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
          |       count(*) AS n,
          |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
          |       max(octet_length(encode(text))) AS max_bytes
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_multimodal_features",
      "Runs the BATCHED mapPartitions decode stage (MediaDecode) under the oracle " +
        "gate: per media-type feature aggregation. The checksum is a real byte sum " +
        "(ASCII corpus ⇒ expressible as per-char ascii() in the oracle); width/height " +
        "are the stub's deterministic byte-length derivations.",
      (s, dir) =>
        MediaDecode.decode(s, attachBinary(Tables.table(s, dir, "documents")))
          .toDF()
          .groupBy("media_type")
          .agg(
            count(lit(1)).as("n"),
            sum(col("checksum")).as("total_checksum"),
            round(avg(col("width")), 4).as("avg_w"),
            round(avg(col("height")), 4).as("avg_h"))
          .orderBy("media_type"),
      Some(
        """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
          |  count(*) AS n,
          |  CAST(sum(list_sum(list_transform(string_split(text,''), x -> ascii(x)))) AS BIGINT) AS total_checksum,
          |  round(avg(16 + octet_length(encode(text)) % 64), 4) AS avg_w,
          |  round(avg(16 + (octet_length(encode(text)) // 64) % 64), 4) AS avg_h
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    GraftQuery(
      "q_multimodal_dedup",
      "Binary-content dedup — the media-dedup staple (the same image shipped " +
        "under many URLs): group payloads by md5 content hash per media type, " +
        "report unique counts and the RECLAIMABLE bytes (every copy past the " +
        "first). The shuffle carries (media_type, hash, length) — never the " +
        "payload; at 100 TB this is exactly how petabytes of crawl media get " +
        "deduped before any decode cost is paid.",
      (s, dir) => {
        val g = attachBinary(table(s, dir, "documents"))
          .select(col("media_type"), md5(col("payload")).as("h"),
            octet_length(col("payload")).cast("long").as("len"))
        g.groupBy("media_type", "h")
          .agg(count(lit(1)).as("cnt"), min(col("len")).as("len0"))
          .groupBy("media_type")
          .agg(
            sum(col("cnt")).as("n_payloads"),
            count(lit(1)).as("n_unique"),
            sum((col("cnt") - 1) * col("len0")).as("dup_bytes"))
          .orderBy("media_type")
      },
      Some(
        """WITH g AS (SELECT
          |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
          |    md5(text) AS h, octet_length(encode(text)) AS len
          |  FROM documents),
          |per AS (SELECT media_type, h, count(*) AS cnt, min(len) AS len0
          |        FROM g GROUP BY media_type, h)
          |SELECT media_type, CAST(sum(cnt) AS BIGINT) AS n_payloads,
          |       count(*) AS n_unique,
          |       CAST(sum((cnt - 1) * len0) AS BIGINT) AS dup_bytes
          |FROM per GROUP BY media_type ORDER BY media_type""".stripMargin)),

    GraftQuery(
      "q_multimodal_frames",
      "Frame-sampling plan for video payloads: uniform-stride sample offsets " +
        "(≤8 frames, 500-byte stride) generated PER ROW from payload metadata and " +
        "fanned out map-side — the seek table a codec decode stage consumes; " +
        "frame_byte peeks the payload at each offset. NOTE the peek is " +
        "CHARACTER-indexed after a UTF-8 decode (both engines do the same, so " +
        "the oracle matches); offsets equal true byte offsets only because this " +
        "corpus is ASCII — a binary-faithful peek would substr the BINARY column " +
        "directly. No shuffle until the final order-for-display.",
      (s, dir) =>
        attachBinary(table(s, dir, "documents"))
          .filter(col("media_type") === "video")
          .withColumn("len", octet_length(col("payload")))
          // len > 0 guard: a zero-byte payload would give n_frames = 0 and
          // sequence(0, -1) — which Spark evaluates as a DESCENDING [0, -1],
          // emitting bogus negative frames instead of none
          .filter(col("len") > 0)
          .withColumn("n_frames",
            least(lit(8L), lit(1) + (col("len") - 1) / lit(500)).cast("int"))
          .select(col("doc_id"), col("payload"),
            explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
          .select(
            col("doc_id"),
            col("frame_idx"),
            (col("frame_idx") * 500).as("byte_offset"),
            expr("ascii(substring(CAST(payload AS STRING), frame_idx * 500 + 1, 1))")
              .as("frame_byte"))
          .orderBy("doc_id", "frame_idx")
          .limit(2000),
      Some(
        """WITH v AS (SELECT doc_id, text, octet_length(encode(text)) AS len
          |           FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0),
          |f AS (SELECT doc_id, text,
          |        unnest(range(0, least(8, 1 + (len - 1) // 500))) AS fi FROM v)
          |SELECT doc_id, CAST(fi AS INT) AS frame_idx, CAST(fi * 500 AS INT) AS byte_offset,
          |       ascii(substr(text, CAST(fi * 500 + 1 AS INT), 1)) AS frame_byte
          |FROM f ORDER BY doc_id, frame_idx LIMIT 2000""".stripMargin))
  )
}

/** Decoded-media feature record produced by the (stubbed) decode stage. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    width: Int,      // stub: derived from payload bytes
    height: Int,     // stub: derived from payload bytes
    checksum: Long)  // real: additive byte checksum, exercised in tests

/** Batched decode plumbing. The per-batch signature mirrors what a real codec
  * binding needs (amortize init cost across a batch of payloads). */
object MediaDecode {

  /** STUB decode — deterministic fake in lieu of real codecs (none in this
    * container). A production build replaces ONLY the body marked below. */
  private def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, mt, bytes) =>
      // --- STUB: real implementation would decode `bytes` with a codec ---
      val checksum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      MediaFeatures(id, mt, bytes.length,
        width = 16 + (bytes.length % 64), height = 16 + ((bytes.length / 64) % 64),
        checksum = checksum)
      // -------------------------------------------------------------------
    }

  /** Partition-preserving batched decode: iterate each partition in fixed-size
    * batches (the real-codec amortization shape), no shuffle introduced. */
  def decode(spark: SparkSession, media: DataFrame, batchSize: Int = 128): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
  }
}
