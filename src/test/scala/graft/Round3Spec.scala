package graft

import org.apache.spark.sql.functions._

/** Round-3 operator properties — invariants the DuckDB oracle gate cannot
  * express (cross-query consistency, algebraic equivalence to unsalted /
  * single-step forms). Fixture scale sf0.001 via SparkSuite.run. */
class Round3Spec extends SparkSuite {

  test("components fixpoint is internally consistent and merges at least as much as one step") {
    val comp = run("q_dedup_components").head()
    val nDocs = comp.getAs[Long]("n_docs")
    val nComp = comp.getAs[Long]("n_comp")
    assert(comp.getAs[Long]("n_merged") == nDocs - nComp)
    assert(comp.getAs[Long]("max_comp") >= 1 && comp.getAs[Long]("max_comp") <= nDocs)
    // one min-propagation step (q_dedup_canonical) cannot end with FEWER
    // canonicals than the fixpoint's component count: iterating only merges
    val canon = run("q_dedup_canonical").head()
    assert(canon.getAs[Long]("n_docs") == nDocs)
    assert(canon.getAs[Long]("n_canon") >= nComp)
  }

  test("decontamination counts are a subset of the test split") {
    val r = run("q_dedup_decontaminate").head()
    val nTest = r.getAs[Long]("n_test")
    val nCont = r.getAs[Long]("n_contaminated")
    assert(nCont >= 0 && nCont <= nTest)
    // the test split must agree with q_split_assign's bucketing of the corpus
    val splitTest = run("q_split_assign").collect()
      .filter(_.getAs[String]("split") == "test").map(_.getAs[Long]("n")).sum
    assert(nTest == splitTest)
  }

  test("tf-idf top-20 scores are positive and totally ordered") {
    val rows = run("q_text_tfidf").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0)) // every term in <all docs ⇒ ln(N/df) > 0
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("embedding outliers are bounded by the label population") {
    val rows = run("q_vec_outliers").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") >= 0 &&
        r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
    // every vector is in exactly one label group
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.table(spark, sf, "embeddings").count())
  }

  test("salted two-phase aggregation equals the plain one-phase groupBy exactly") {
    val salted = run("q_agg_salted")
    val plain = Tables.table(spark, sf, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Exact.moneySum(col("value")).as("total"))
      .orderBy("event_type")
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
