package graft

import org.apache.spark.sql.functions._
import graft.functions.{MediaDecode, Multimodal}

/** Extended LLM-pipeline operators (SURVEY §2.11 stretch set): dedup sketches,
  * text analysis, ANN, multimodal plumbing. */
class PipelineOpsSpec extends SparkSuite {
  import spark.implicits._

  test("minhash candidate pairs ⊇ high-jaccard pairs logic sanity") {
    val n = run("q_dedup_minhash").head().getAs[Long]("n_pairs")
    assert(n >= 0)
    // deterministic across runs (hash seeds are fixed)
    assert(run("q_dedup_minhash").head().getAs[Long]("n_pairs") == n)
  }

  test("ngram jaccard pairs are valid similarities, ordered desc") {
    val rows = run("q_dedup_ngram_jaccard").collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jac")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("ida") < r.getAs[Long]("idb"))
    }
    val sims = rows.map(_.getAs[Double]("jac")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("simhash and embed near-dup counts are non-negative and stable") {
    assert(run("q_dedup_simhash").head().getAs[Long]("n_pairs") >= 0)
    val e = run("q_dedup_embed").head()
    assert(e.getAs[Long]("n_pairs") > 0) // threshold tuned to fixture sim range
    assert(e.getAs[Double]("max_sim") <= 1.0)
  }

  test("lang-id confusion matrix covers every document exactly once") {
    val rows = run("q_text_lang_id").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.table(spark, sf, "documents").count())
    val langs = Set("en", "es", "de", "fr", "zh", "und")
    rows.foreach(r => assert(langs.contains(r.getAs[String]("pred"))))
  }

  test("quality buckets partition the corpus") {
    val rows = run("q_text_quality").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.table(spark, sf, "documents").count())
    rows.foreach(r => assert(Set("low", "med", "high").contains(r.getAs[String]("bucket"))))
  }

  test("fingerprints land in the modulus range and are mostly distinct") {
    val fps = run("q_text_fingerprint").select("fp").as[Long].collect()
    fps.foreach(f => assert(f >= 0 && f < 1000003))
    assert(fps.distinct.length > fps.length / 2)
  }

  test("IVF ANN returns results from a single cell, subset of that cell's brute force") {
    val rows = run("q_ann_ivf").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val sims = rows.map(_.getAs[Double]("sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("LSH ANN: all returned sims bounded by brute-force top-1") {
    val lsh = run("q_ann_lsh").collect()
    assert(lsh.length <= 10)
    val bfTop = run("q_vec_knn").collect().map(_.getAs[Double]("sim")).max
    lsh.foreach(r => assert(r.getAs[Double]("sim") <= bfTop + 1e-9))
  }

  test("multimodal: metadata agg partitions docs; decode is narrow + exact") {
    val meta = run("q_multimodal_meta").collect()
    assert(meta.map(_.getAs[Long]("n")).sum == Tables.table(spark, sf, "documents").count())

    val media = Multimodal.attachBinary(Tables.table(spark, sf, "documents"))
    val decoded = MediaDecode.decode(spark, media)
    // no shuffle: decode is a narrow map-side stage
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(decoded.count() == media.count())
    // checksum is real: verify against a driver-side computation
    val one = media.filter(col("doc_id") === 0).select("payload").as[Array[Byte]].head()
    val expect = one.foldLeft(0L)((a, b) => a + (b & 0xff))
    val got = decoded.filter(_.doc_id == 0L).head()
    assert(got.checksum == expect && got.n_bytes == one.length)
  }

  test("multimodal: container header decode parses real PNG/BMP/GIF bytes") {
    // hand-built container headers with known dimensions — independent of
    // the attachImage renderer, so renderer and decoder are pinned separately
    def png(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(33)
      bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      bb.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      bb.put(Array(8, 6, 0, 0, 0, 0, 0, 0, 0).map(_.toByte))
      bb.array()
    }
    def bmp(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(0).putInt(0).putInt(0x36)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      bb.array()
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(14).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
      bb.put(Array(0xf7, 0, 0, 0).map(_.toByte))
      bb.array()
    }
    // BITMAPCOREHEADER (dibSize=12, 16-bit dims at OTHER offsets): parsing
    // it at INFOHEADER offsets yields garbage — must classify as unknown
    def bmpCore(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(0).putInt(0).putInt(0x1a)
      bb.putInt(12).putShort(w.toShort).putShort(h.toShort).putShort(1).putShort(24)
      bb.array()
    }
    val rows = Seq(
      (1L, "image", png(640, 480)), (2L, "image", bmp(1024, 768)),
      (3L, "image", gif(320, 200)), (4L, "image", "not an image".getBytes),
      (5L, "image", bmp(800, -600)), // top-down BMP: negative height field
      (6L, "image", bmpCore(64, 48)))
    val d = MediaDecode.decode(spark, rows.toDF("doc_id", "media_type", "payload"))
      .collect().sortBy(_.doc_id)
    assert(d(0).format == "png" && d(0).width == 640 && d(0).height == 480)
    assert(d(1).format == "bmp" && d(1).width == 1024 && d(1).height == 768)
    assert(d(2).format == "gif" && d(2).width == 320 && d(2).height == 200)
    assert(d(3).format == "unknown" && d(3).width == 0 && d(3).height == 0)
    assert(d(4).format == "bmp" && d(4).width == 800 && d(4).height == 600)
    assert(d(5).format == "unknown" && d(5).width == 0 && d(5).height == 0)
    // the attachImage renderer round-trips through the same decoder
    val rendered = MediaDecode.decode(spark,
      Multimodal.attachImage(Tables.table(spark, sf, "documents"))).collect()
    rendered.foreach { f =>
      val (w, h) = (1 + f.doc_id % 1021, 1 + (f.doc_id * 7) % 763)
      val fmt = Seq("png", "bmp", "gif")((f.doc_id % 3).toInt)
      assert(f.format == fmt && f.width == w && f.height == h, f.toString)
    }
  }
}
