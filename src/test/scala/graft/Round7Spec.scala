package graft

import org.apache.spark.sql.functions._

/** Round-7 operator properties — invariants the DuckDB oracle gate cannot
  * express (geometric containment, recall bounds, incremental-vs-one-shot
  * consistency, plan-shape pins for the new exchange-reuse paths).
  * Fixture scale sf0.001 via SparkSuite.run. */
class Round7Spec extends SparkSuite {

  test("geo positions: bbox contains the track and max displacement is geometrically consistent") {
    val rows = run("q_geo_positions").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val latSpan = r.getAs[Double]("lat_max") - r.getAs[Double]("lat_min")
      val lonSpan = r.getAs[Double]("lon_max") - r.getAs[Double]("lon_min")
      val d2 = r.getAs[Double]("max_disp2")
      assert(latSpan >= 0 && lonSpan >= 0)
      assert(r.getAs[Long]("n_pos") >= 1)
      // the pair realizing the lat (lon) span is at squared distance ≥ span²;
      // no pair can exceed the bbox diagonal. Small slack for the round(6).
      if (r.getAs[Long]("n_pos") > 1) {
        assert(d2 >= math.max(latSpan * latSpan, lonSpan * lonSpan) - 1e-5)
        assert(d2 <= latSpan * latSpan + lonSpan * lonSpan + 1e-5)
      } else assert(d2 == 0.0)
      // parsed latitudes live on the APRS grid: |lat| < 90, |lon| < 180
      assert(math.abs(r.getAs[Double]("lat_min")) < 90.0 &&
        math.abs(r.getAs[Double]("lon_min")) < 180.0)
    }
  }

  test("geo positions: TNC2 format∘parse is the exact identity on a known packet") {
    // event_id 4242, user 7: lat_deg=12, lat_minc=4*...: 4242%90=12,
    // (4242*7)%6000=5694, even → N; (4242*3)%180=126, (4242*13)%6000=1146, 4242%3=0 → E
    val df = graft.streaming.PacketParse.parse(
      spark.createDataFrame(Seq(Tuple1("U7>APRS,TCPIP*:!1256.94N/12611.46E#")))
        .toDF("raw"))
    val r = df.head()
    assert(r.getAs[String]("packet_type") == "position")
    assert(r.getAs[String]("callsign") == "U7")
    assert(r.getAs[Double]("lat") == (12.0 + 56.94 / 60.0) * 1.0)
    assert(r.getAs[Double]("lon") == (126.0 + 11.46 / 60.0) * 1.0)
  }

  test("ann recall: 10 query rows, recall in [0,1] on the 0.1 grid, lsh bucket self-consistent") {
    val rows = run("q_ann_recall").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == (0L to 9L))
    rows.foreach { r =>
      Seq("recall_kmeans", "recall_lsh").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0)
        assert(math.abs(v * 10 - math.rint(v * 10)) < 1e-9) // |hits|/10
      }
    }
  }

  test("ann recall: kmeans leg agrees with q_ann_ivf_kmeans for query 0") {
    // q_ann_ivf_kmeans IS the kmeans ANN for vec_id 0 — its top-10 ∩ brute
    // force must equal recall_kmeans(0) × 10
    val annTop = run("q_ann_ivf_kmeans").collect().map(_.getAs[Long]("vec_id")).toSet
    val knn = run("q_vec_knn").collect().map(_.getAs[Long]("vec_id")).toSet
    val recall0 = run("q_ann_recall").collect()
      .find(_.getAs[Long]("vec_id") == 0L).get.getAs[Double]("recall_kmeans")
    assert(recall0 == annTop.intersect(knn).size / 10.0)
  }

  test("incremental dedup: flagged subset of the batch, consistent with the split") {
    val r = run("q_dedup_incremental").head()
    val nNew = r.getAs[Long]("n_new")
    val nDup = r.getAs[Long]("n_dup")
    assert(nDup >= 0 && nDup <= nNew)
    // the batch is the q_split_assign test bucket, minus docs too short to
    // shingle (no bands ⇒ not indexable either way)
    val splitTest = run("q_split_assign").collect()
      .filter(_.getAs[String]("split") == "test").map(_.getAs[Long]("n")).sum
    assert(nNew <= splitTest)
  }

  test("tfidf and surprisal tokenize the corpus exactly once, structurally") {
    // df/cf are count/sum WINDOWS over the tf relation: a single tokenize
    // subtree exists by construction (no ReuseExchange needed, plan stays
    // clone-safe for re-execution harnesses). Pin exactly one Generate (the
    // one explode) and no ReusedExchange (nothing duplicated to dedupe).
    Seq("q_text_tfidf", "q_text_surprisal").foreach { q =>
      val p = run(q).queryExecution.executedPlan.toString
      assert("(?m)^.*Generate".r.findAllIn(p).size == 1, s"$q explodes twice:\n$p")
      assert(!p.contains("ReusedExchange"), s"$q has a duplicated subtree:\n$p")
      assert("(?m)^.*Window".r.findAllIn(p).nonEmpty, s"$q lost the window df/cf leg:\n$p")
    }
  }

  test("fused centroid build leaves no posexplode row inflation in the IVF plans") {
    Seq("q_ann_ivf", "q_ann_ivf_multiprobe", "q_ann_ivf_kmeans").foreach { q =>
      val p = run(q).queryExecution.executedPlan.toString
      assert(!p.contains("Generate"), s"$q still explodes embeddings:\n" + p)
    }
  }
}
