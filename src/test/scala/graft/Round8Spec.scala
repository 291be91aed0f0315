package graft

import org.apache.spark.sql.functions._

/** Round-8 operator properties the DuckDB oracle gate cannot express —
  * idempotence/consistency invariants for the curation additions and the
  * stream-static join, plus plan pins for the new map-side shapes.
  * Fixture scale sf0.001 via SparkSuite.run. */
class Round8Spec extends SparkSuite {
  import spark.implicits._

  test("pii scrub: placeholders replace every found span, counts are consistent") {
    val rows = run("q_text_pii_scrub").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every rendered doc carries exactly one phone and >= 1 email
      assert(r.getAs[Long]("n_phone") == r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_email") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("scrubbed_chars") > 0)
    }
  }

  test("pii scrub is idempotent: re-scrubbing scrubbed text changes nothing") {
    val email = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
    val phone = "[0-9]{3}-[0-9]{4}"
    val scrubbed = Seq("user 7 mail u7@ex3.com tel 123-4567 alt u8@ex0.com end")
      .toDF("text")
      .select(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
        phone, "<PHONE>").as("s1"))
      .select(col("s1"), regexp_replace(regexp_replace(col("s1"), email, "<EMAIL>"),
        phone, "<PHONE>").as("s2"))
      .head()
    assert(scrubbed.getString(0) == scrubbed.getString(1))
    assert(scrubbed.getString(0) ==
      "user 7 mail <EMAIL> tel <PHONE> alt <EMAIL> end")
  }

  test("url stats: domains partition the url set, char mass bounds hold") {
    val rows = run("q_text_url_stats").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_urls")
      val chars = r.getAs[Long]("url_chars")
      val dom = r.getAs[String]("domain")
      assert(dom.endsWith(".example"))
      // every URL is at least protocol + domain long
      assert(chars >= n * (dom.length + 7))
    }
  }

  test("stream enrich: every emitted window belongs to a real customer segment") {
    val segs = Tables.table(spark, sf, "customer")
      .select("c_mktsegment").distinct().collect().map(_.getString(0)).toSet
    val rows = run("q_stream_enrich").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(segs.contains(r.getAs[String]("c_mktsegment")))
      assert(r.getAs[Long]("n") >= 1)
    }
  }

  test("pii/url plans: render+regex stay map-side — one aggregation exchange only") {
    Seq("q_text_pii_scrub", "q_text_url_stats").foreach { q =>
      val p = run(q).queryExecution.executedPlan.toString
      // spread + final agg + sort; no join, no extra exchange from the scrub
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(n <= 2, s"$q has $n hash exchanges (want <= 2: spread round-robin is separate):\n$p")
    }
  }
}
