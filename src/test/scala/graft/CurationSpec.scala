package graft

import org.apache.spark.sql.functions._

/** Round-7 curation-pipeline operators (functions/PipelineOps.scala,
  * sources/FormatSources q_source_orc) — invariants beyond the oracle gate:
  * partition/coverage identities, packing conservation laws, sampling
  * determinism, and the ORC round-trip pinned against a direct parquet
  * computation. Fixture scale sf0.001 via SparkSuite.run. */
class CurationSpec extends SparkSuite {

  private def docs = Tables.table(spark, sf, "documents")

  test("repetition: per-lang rows cover the corpus; fractions are valid probabilities") {
    val rows = run("q_text_repetition").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_repetitive") <= r.getAs[Long]("n_docs"))
      val top = r.getAs[Double]("avg_top_frac")
      val ttr = r.getAs[Double]("avg_ttr")
      assert(top > 0.0 && top <= 1.0)
      assert(ttr > 0.0 && ttr <= 1.0)
      // the modal token can't be rarer than the average token
      assert(top >= 1.0 / 500)
    }
  }

  test("stratified sample: deterministic, within stratum bounds, and exactly the md5 rule") {
    val rows = run("q_sample_stratified").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Long]("sampled_chars") >= 0L)
    }
    // re-derive the selected set directly; the gated agg must match it exactly
    val direct = docs
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"))
      .groupBy("lang").agg(count(lit(1)).as("m"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("m")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") == direct.getOrElse(r.getAs[String]("lang"), 0L))
    }
    // rerun identical (content-hash determinism, no RNG state anywhere)
    assert(run("q_sample_stratified").collect().toSeq == rows.toSeq)
  }

  test("sequence packing: conservation, contiguous bins, and capacity discipline") {
    val rows = run("q_pack_sequences").orderBy("bin").collect()
    val totalToks = docs.select(sum(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    val maxDoc = docs.select(max(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // bins are exactly 0..k with no holes (a doc starts in every window)
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L until rows.length).toSeq)
    rows.dropRight(1).foreach { r =>
      // a non-final bin spills only by the doc that straddles its boundary
      assert(r.getAs[Long]("n_tokens") <= 2048 + maxDoc - 1)
      // and the next doc moved on, so the bin holds at least one full window
      // minus the largest possible straddle
      assert(r.getAs[Long]("n_tokens") >= 2048 - maxDoc + 1)
    }
  }

  test("surprisal: top-10 by mean NLL, positive, descending, deterministic") {
    val rows = run("q_text_surprisal").collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Double]("avg_nll")).toSeq
    assert(scores.forall(_ > 0.0))
    assert(scores == scores.sorted.reverse)
    assert(run("q_text_surprisal").collect().toSeq == rows.toSeq)
  }

  test("curation funnel: survivors obey every gate it chains") {
    val rows = run("q_quality_pipeline").collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    // never more survivors than en docs in the length band
    val upper = docs
      .withColumn("t", size(split(col("text"), " ")))
      .filter(col("lang") === "en" && col("t") >= 20 && col("t") <= 400)
      .count()
    assert(n > 0 && n <= upper)
    rows.foreach { r =>
      val tokens = r.getAs[Long]("tokens")
      val cnt = r.getAs[Long]("n")
      assert(tokens >= 20 * cnt && tokens <= 400 * cnt)
    }
  }

  test("top-bigram: per-lang coverage of multi-token docs; fractions valid") {
    val rows = run("q_text_top_bigram").collect()
    val multi = docs.filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == multi)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
      val f = r.getAs[Double]("avg_top_bigram")
      assert(f > 0.0 && f <= 1.0)
    }
  }

  test("fixed-size hash sample: exactly min(20, stratum) per language, deterministic") {
    val rows = run("q_sample_topk_hash").collect()
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(r.getAs[Long]("n_sampled") == math.min(20L, strata(lang)))
    }
    assert(rows.map(_.getAs[String]("lang")).toSet == strata.keySet)
    assert(run("q_sample_topk_hash").collect().toSeq == rows.toSeq)
  }

  test("cluster representatives: multi-member clusters, quality-ranked, deterministic") {
    val rows = run("q_dedup_cluster_rep").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2)
      assert(r.getAs[Long]("rep_chars") > 0)
      assert(r.getAs[Long]("rep_doc") >= 0)
    }
    val sizes = rows.map(_.getAs[Long]("n_members")).toSeq
    assert(sizes == sizes.sorted.reverse)
    assert(run("q_dedup_cluster_rep").collect().toSeq == rows.toSeq)
  }

  test("funnel stages are monotonically non-increasing and bounded by the user count") {
    val r = run("q_ts_funnel").head()
    val (v, c, p) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase"))
    assert(v >= c && c >= p && p >= 0)
    val users = Tables.table(spark, sf, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(v <= users)
  }

  test("keywords: exactly 3 per language, scores positive, language markers surface") {
    val rows = run("q_text_keywords").collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rs) => assert(rs.length == 3) }
    rows.foreach(r => assert(r.getAs[Double]("score") > 0.0))
    // keyness: a top term must be MORE distinctive than the shared-vocabulary
    // baseline (every language uses the common pool, so a term appearing
    // uniformly across 5 languages scores well under 1)
    assert(rows.map(_.getAs[Double]("score")).max > 0.3)
    assert(run("q_text_keywords").collect().toSeq == rows.toSeq)
  }

  test("driver entry contract: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every declared query has a runnable fn; oracle map keys are a subset
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("ORC round-trip equals the direct parquet aggregation") {
    val orc = run("q_source_orc").collect().toSeq
    val direct = docs.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        sum(length(col("text"))).as("text_chars")) // the r13 fidelity column
      .orderBy("lang").collect().toSeq
    assert(orc == direct)
  }
}
