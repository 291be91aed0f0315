package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.11 stretch set): media as opaque binary
  * payloads with typed metadata, plus a batched decode/feature-extract stage.
  *
  * The fixtures carry no real media files, so payloads are rendered
  * deterministically — UTF-8 text bytes for the metadata/dedup/frame
  * queries, and REAL PNG/BMP/GIF container headers (via [[Multimodal
  * .attachImage]]) for the decode-feature query, whose dimensions the
  * decode stage parses out of the actual header bytes. Tested and real:
  * the schema (binary + metadata struct), the partition-preserving batched
  * mapPartitions plumbing, the byte-level container sniff + header parse,
  * and the aggregation over extracted features. A full raster/audio codec
  * (absent from this container) would slot into [[MediaDecode]]'s
  * decodeBatch without touching anything else.
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

  /** REAL image-container payloads rendered from document integers via
    * `unhex`: a valid PNG signature + IHDR, BMP header + BITMAPINFOHEADER,
    * or GIF89a screen descriptor whose dimensions derive deterministically
    * from doc_id — so the decode stage has real bytes to parse and the
    * oracle can compute the same dimensions and byte checksums directly
    * from the integers (decode∘render pinned as the identity). */
  def attachImage(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    def dv(a: Column, b: Long) = call_function("div", a, lit(b))
    val w = lit(1L) + pmod(col("doc_id"), lit(1021L))
    val h = lit(1L) + pmod(col("doc_id") * 7, lit(763L))
    val fmt = pmod(col("doc_id"), lit(3L))
    // PNG: sig(8) len=13(4) 'IHDR'(4) W(be32) H(be32) bit/color/comp/filt/int(5) crc(4)
    val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
      format_string("%08x%08x", w, h), lit("080600000000000000"))
    // BMP: 'BM'(2) size+res(8, zeroed) offset(4) dibsize=40(4) W(le32) H(le32) planes bpp
    val bmpHex = concat(lit("424D00000000000000003600000028000000"),
      format_string("%02x%02x0000", pmod(w, lit(256L)), dv(w, 256L)),
      format_string("%02x%02x0000", pmod(h, lit(256L)), dv(h, 256L)),
      lit("01001800"))
    // GIF: 'GIF89a'(6) W(le16) H(le16) flags/bg/ratio + block terminator(4)
    val gifHex = concat(lit("474946383961"),
      format_string("%02x%02x", pmod(w, lit(256L)), dv(w, 256L)),
      format_string("%02x%02x", pmod(h, lit(256L)), dv(h, 256L)),
      lit("F7000000"))
    docs.select(
      col("doc_id"),
      unhex(when(fmt === 0, pngHex).when(fmt === 1, bmpHex).otherwise(gifHex))
        .as("payload"),
      lit("image").as("media_type"))
  }

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
      "Runs the BATCHED mapPartitions decode stage (MediaDecode) under the " +
        "oracle gate with REAL container bytes: every document renders a " +
        "valid PNG / BMP / GIF header (dimensions from doc_id residues, via " +
        "unhex), the decoder sniffs the format and parses width/height out " +
        "of the actual big-/little-endian header fields, and the oracle " +
        "computes the same dimensions, payload lengths, and additive byte " +
        "checksums (header-constant sums + the dimension bytes) directly " +
        "from the integers — decode∘render pinned as the identity at the " +
        "bytes level. No shuffle until the 3-row final aggregation.",
      (s, dir) =>
        MediaDecode.decode(s, attachImage(Tables.table(s, dir, "documents")))
          .toDF()
          .groupBy("format")
          .agg(
            count(lit(1)).as("n"),
            sum(col("n_bytes").cast("long")).as("bytes_sum"),
            sum(col("width").cast("long")).as("width_sum"),
            sum(col("height").cast("long")).as("height_sum"),
            sum(col("checksum")).as("checksum_sum"))
          .orderBy("format"),
      Some(
        """WITH d AS (SELECT doc_id,
          |    1 + doc_id % 1021 AS w, 1 + (doc_id * 7) % 763 AS h,
          |    doc_id % 3 AS fmt
          |  FROM documents)
          |SELECT CASE fmt WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'gif' END AS format,
          |  count(*) AS n,
          |  CAST(sum(CASE fmt WHEN 0 THEN 33 WHEN 1 THEN 30 ELSE 14 END) AS BIGINT) AS bytes_sum,
          |  CAST(sum(w) AS BIGINT) AS width_sum,
          |  CAST(sum(h) AS BIGINT) AS height_sum,
          |  CAST(sum(CASE fmt WHEN 0 THEN 747 WHEN 1 THEN 262 ELSE 671 END
          |    + w % 256 + w // 256 + h % 256 + h // 256) AS BIGINT) AS checksum_sum
          |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)),

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
          // integer div, spelled like the oracle's `//`: Column./ promotes
          // to DOUBLE and only matched by luck of the 1/500 granularity
          .withColumn("n_frames",
            least(lit(8L), lit(1) + expr("(len - 1) div 500")).cast("int"))
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

/** Decoded-media feature record produced by the decode stage. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    format: String,  // sniffed container format: png / bmp / gif / unknown
    n_bytes: Int,
    width: Int,      // parsed from the container header bytes (0 if unknown)
    height: Int,     // parsed from the container header bytes (0 if unknown)
    checksum: Long)  // additive byte checksum

/** Batched decode plumbing. The per-batch signature mirrors what a real codec
  * binding needs (amortize init cost across a batch of payloads).
  *
  * The header decoder is REAL byte-level parsing — PNG signature + IHDR
  * big-endian dimensions, BMP `BM` + BITMAPINFOHEADER little-endian
  * dimensions, GIF87a/89a screen-descriptor LE16 dimensions — the format
  * sniff + dimension fast path every media-curation pipeline runs before
  * paying full pixel-decode cost (full raster/audio decode would need codec
  * libraries this container lacks; it would slot into [[decodeBatch]]
  * without touching the plumbing). */
object MediaDecode {

  /** Container sniff + header dimension parse over raw bytes. */
  private def sniff(bytes: Array[Byte]): (String, Int, Int) = {
    @inline def u8(i: Int) = bytes(i) & 0xff
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def lit(i: Int, s: String) = s.indices.forall(k => u8(i + k) == s.charAt(k))
    if (bytes.length >= 24 && u8(0) == 0x89 && lit(1, "PNG") &&
      u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
      lit(12, "IHDR")) ("png", be32(16), be32(20))
    // BMP dimensions live at DIB-header-specific offsets: gate on the
    // BITMAPINFOHEADER size field (40) so a BITMAPCOREHEADER file (16-bit
    // dims at other offsets) reads as unknown instead of garbage, and
    // abs() the height — negative means top-down row order, same pixels
    // (r13 review)
    else if (bytes.length >= 26 && lit(0, "BM") && le32(14) == 40)
      ("bmp", le32(18), math.abs(le32(22)))
    else if (bytes.length >= 10 && (lit(0, "GIF87a") || lit(0, "GIF89a")))
      ("gif", le16(6), le16(8))
    else ("unknown", 0, 0)
  }

  private def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, mt, bytes) =>
      val checksum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      val (fmt, w, h) = sniff(bytes)
      MediaFeatures(id, mt, fmt, bytes.length, w, h, checksum)
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
