package graft

import org.apache.spark.sql.functions._

/** Behavior gates for the round-10 continuation operators (statistics
  * panel extensions). Each result is checked against an independent
  * in-process recomputation or a closed-form invariant — the DuckDB oracle
  * pins cross-engine value equality; these pin the SEMANTICS.
  */
class Round10bSpec extends SparkSuite {

  test("moments: skewness/kurtosis match Spark's native estimators") {
    // the native aggregates fold doubles in partition order — not bitwise
    // deterministic, but well within 1e-6 relative at this scale, which is
    // exactly the independence this twin wants (different algorithm, same
    // statistic)
    val got = run("q_agg_moments").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val native = Tables.table(spark, sf, "orders")
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("double").as("y"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), skewness(col("y")).as("sk"),
        kurtosis(col("y")).as("ku"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == native.keySet)
    got.foreach { case (k, (n, sk, ku)) =>
      val (nn, nsk, nku) = native(k)
      assert(n == nn)
      assert(math.abs(sk - nsk) <= 1e-6 * math.max(1d, math.abs(nsk)),
        s"$k skew got=$sk native=$nsk")
      assert(math.abs(ku - nku) <= 1e-6 * math.max(1d, math.abs(nku)),
        s"$k kurt got=$ku native=$nku")
    }
  }

  test("chi2: matches driver-side contingency recomputation") {
    val rows = Tables.table(spark, sf, "events")
      .select(col("event_type"), graft.Ts.epochMicros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getString(0), ((r.getLong(1) / 86400000000L) + 3) % 7))
    val n = rows.length.toDouble
    val rt = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val ct = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toDouble }
    val obs = rows.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val chi2 = (for { (t, r) <- rt; (d, c) <- ct } yield {
      val e = r * c / n
      val o = obs.getOrElse((t, d), 0d)
      (o - e) * (o - e) / e
    }).sum
    val dof = (rt.size - 1) * (ct.size - 1)
    val v = math.sqrt(chi2 / (n * (math.min(rt.size, ct.size) - 1)))
    val got = run("q_stats_chi2").collect()
    assert(got.length == 1)
    val r0 = got.head
    assert(r0.getLong(0) == rows.length.toLong)
    assert(r0.getLong(1) == dof.toLong)
    assert(math.abs(r0.getDouble(2) - chi2) <= 1e-4 * math.max(1d, chi2))
    assert(math.abs(r0.getDouble(3) - v) <= 1e-6)
  }

  test("benford: shares sum to 1, counts cover every order, digits in 1..9") {
    val rows = run("q_stats_benford").collect()
    val total = Tables.table(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1d) <= 1e-5)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(d >= 1 && d <= 9)
      val expect = math.log((d + 1d) / d) / math.log(10d)
      assert(math.abs(r.getDouble(3) - expect) <= 1e-6)
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) - r.getDouble(3))) <= 1e-5)
    }
  }
}
