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

  test("assoc lift: equals brute-force basket pair mining") {
    val ob = Tables.table(spark, sf, "lineitem")
      .join(Tables.table(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nByBrand = ob.groupBy(_._2).map { case (b, v) => b -> v.size.toLong }
    val nOrders = ob.map(_._1).distinct.length.toDouble
    val pairCounts = ob.groupBy(_._1).values.flatMap { basket =>
      val bs = basket.map(_._2).sorted
      for (i <- bs.indices; j <- (i + 1) until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val want = pairCounts.toSeq.filter(_._2 >= 20).map { case ((b1, b2), n12) =>
      val lift = math.rint(n12 * nOrders / (nByBrand(b1) * nByBrand(b2).toDouble)
        * 1e6) / 1e6
      (b1, b2, n12, nByBrand(b1), nByBrand(b2), lift)
    }.sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = run("q_assoc_lift").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSeq
    // same pair set and counts; lift within a rounding ulp of the recompute
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) ==
      want.map(t => (t._1, t._2, t._3, t._4, t._5)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._6 - w._6) <= 1e-6, s"${g._1}/${g._2}")
    }
  }

  test("heaps: totals are exact and the slope matches a driver-side OLS") {
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
      .sortBy(_._1)
    val seen = collection.mutable.Set.empty[String]
    var ct = 0L; var cv = 0L
    val pts = docs.map { case (_, toks) =>
      ct += toks.length
      toks.foreach(w => if (seen.add(w)) cv += 1)
      (math.log(ct.toDouble), math.log(cv.toDouble))
    }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r0 = run("q_text_heaps").collect().head
    assert(r0.getLong(0) == docs.length.toLong)
    assert(r0.getLong(1) == seen.size.toLong)
    assert(r0.getLong(2) == ct)
    assert(math.abs(r0.getDouble(3) - beta) <= 1e-6)
  }

  test("attribution: equals brute-force replay and conserves cents exactly") {
    val evs = Tables.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), graft.Ts.epochMicros(col("ts")),
        col("event_type"), floor(col("value") * 100 + 0.5).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    val purchases = evs.filter(_._4 == "purchase")
    val touches = evs.filter(e => e._4 == "click" || e._4 == "view")
      .groupBy(_._2)
    val ledger = collection.mutable.Map.empty[String, (Long, Set[Long], Long)]
      .withDefaultValue((0L, Set.empty, 0L))
    purchases.foreach { case (pid, u, pts, _, cents) =>
      val inWin = touches.getOrElse(u, Array.empty[(Long, Long, Long, String, Long)])
        .filter(t => t._3 >= pts - 604800000000L && t._3 < pts)
        .sortBy(t => (t._3, t._1))
      if (inWin.isEmpty) {
        val (n, ps, c) = ledger("direct")
        ledger("direct") = (n + 1, ps + pid, c + cents)
      } else {
        val k = inWin.length
        inWin.zipWithIndex.foreach { case (t, i) =>
          // FLOOR split (Math.floorDiv/floorMod == the query's pmod form):
          // identical to truncating / and % on the all-positive fixture,
          // and the form that conserves negative refund cents too
          val ac = Math.floorDiv(cents, k) +
            (if (i + 1 <= Math.floorMod(cents, k)) 1L else 0L)
          val (n, ps, c) = ledger(t._4)
          ledger(t._4) = (n + 1, ps + pid, c + ac)
        }
      }
    }
    val got = run("q_ts_attribution").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val want = ledger.map { case (ch, (n, ps, c)) => ch -> (n, ps.size.toLong, c) }
    assert(got == want.toMap)
    // conservation: channel ledger sums to the purchase ledger bitwise
    assert(got.values.map(_._3).sum == purchases.map(_._5).sum)
  }

  test("attribution conserves NEGATIVE (refund) cents — floor split, both forms agree") {
    // refund purchases make cents < 0: the pre-r13 div+pmod mix summed to
    // cents + k and the oracle's truncating //+% never distributed its
    // negative remainder — three different ledgers. The floor split must
    // conserve exactly for any sign (the fixture is all-positive, so only
    // a synthetic table can gate this).
    import java.sql.Timestamp
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_attr_neg").toString
    Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 00:00:00"), "click", 0.0),
      (2L, 1L, Timestamp.valueOf("2024-01-01 01:00:00"), "view", 0.0),
      (3L, 1L, Timestamp.valueOf("2024-01-01 02:00:00"), "purchase", -0.07),
      (4L, 2L, Timestamp.valueOf("2024-01-02 00:00:00"), "purchase", -1.23),
      (5L, 3L, Timestamp.valueOf("2024-01-03 00:00:00"), "click", 0.0),
      (6L, 3L, Timestamp.valueOf("2024-01-03 01:00:00"), "click", 0.0),
      (7L, 3L, Timestamp.valueOf("2024-01-03 02:00:00"), "view", 0.0),
      (8L, 3L, Timestamp.valueOf("2024-01-03 03:00:00"), "purchase", 1.00))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_ts_attribution")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // user1: cents=-7, k=2 → floorDiv=-4, floorMod=1 → click −3, view −4
    // user3: cents=100, k=3 → 34/33/33 by touch order (click, click, view)
    // user2: no touches → direct −123
    assert(got == Map("click" -> 64L, "view" -> 29L, "direct" -> -123L), got)
    assert(got.values.sum == -7L + -123L + 100L) // conservation, bitwise
  }

  test("throttle: equals brute-force sequential replay per user") {
    val byUser = Tables.table(spark, sf, "events")
      .select(col("user_id"), graft.Ts.epochMicros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val want = byUser.map { case (u, xs) =>
      val sorted = xs.map(t => (t._2, t._3)).sortBy(identity)
      var kept = 0L; var last = Long.MinValue
      sorted.foreach { case (us, _) =>
        if (last == Long.MinValue || us - last >= 60000000L) { kept += 1; last = us }
      }
      u -> (xs.length.toLong, kept)
    }
    val got = run("q_typed_throttle").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want.toMap)
    got.values.foreach { case (n, k) => assert(k >= 1L && k <= n) }
  }

  test("rfm: grid covers every customer once, conserves cents, quintiles balance") {
    val rows = run("q_agg_rfm").collect()
    val per = Tables.table(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("m"))
      .collect()
    assert(rows.map(_.getLong(3)).sum == per.length.toLong)
    assert(rows.map(_.getLong(4)).sum == per.map(_.getLong(1)).sum)
    Seq(0, 1, 2).foreach { dim =>
      val marginal = rows.groupBy(_.getLong(dim))
        .map { case (s, rs) => s -> rs.map(_.getLong(3)).sum }
      assert(marginal.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
      // ntile balance: quintile sizes differ by at most one
      assert(marginal.values.max - marginal.values.min <= 1)
    }
  }

  test("burstiness: matches a driver-side recompute over the full hour span") {
    val hrs = Tables.table(spark, sf, "events")
      .select(col("event_type"), graft.Ts.epochMicros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 3600000000L))
    val h = (hrs.map(_._2).max - hrs.map(_._2).min + 1).toDouble
    val got = run("q_ts_burstiness").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    val want = hrs.groupBy(_._1).map { case (t, xs) =>
      val counts = xs.groupBy(_._2).map(_._2.size.toDouble)
      val nn = counts.sum
      val mean = nn / h
      val varp = counts.map(c => c * c).sum / h - mean * mean
      val sigma = math.sqrt(varp)
      t -> (xs.length.toLong, varp / mean, (sigma - mean) / (sigma + mean))
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (t, (n, fano, b)) =>
      val (gh, gn, gf, gb) = got(t)
      assert(gh == h.toLong && gn == n)
      assert(math.abs(gf - fano) <= 1e-5, s"$t fano")
      assert(math.abs(gb - b) <= 1e-6, s"$t burstiness")
    }
  }

  test("ttest: matches a driver-side Welch recompute") {
    val xs = Tables.table(spark, sf, "documents")
      .select((col("lang") === "en").as("g"), col("n_chars"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1).toDouble))
    def stats(g: Boolean) = {
      val v = xs.filter(_._1 == g).map(_._2)
      val n = v.length.toDouble
      val m = v.sum / n
      (n, m, v.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (n1, m1, v1) = stats(true); val (n2, m2, v2) = stats(false)
    val q1 = v1 / n1; val q2 = v2 / n2
    val t = (m1 - m2) / math.sqrt(q1 + q2)
    val df = (q1 + q2) * (q1 + q2) /
      (q1 * q1 / (n1 - 1) + q2 * q2 / (n2 - 1))
    val r0 = run("q_stats_ttest").collect().head
    assert(r0.getLong(0) == n1.toLong && r0.getLong(1) == n2.toLong)
    assert(math.abs(r0.getDouble(2) - (m1 - m2)) <= 1e-4)
    assert(math.abs(r0.getDouble(3) - t) <= 1e-5)
    assert(math.abs(r0.getDouble(4) - df) <= 1e-2 * df)
  }

  test("snaive backtest: matches a gap-safe driver-side replay") {
    val daily = Tables.table(spark, sf, "events")
      .select(col("event_type"), graft.Ts.epochMicros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400000000L))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val want = daily.keys.map(_._1).toSeq.distinct.sorted.flatMap { t =>
      val byDay = daily.collect { case ((tt, d), n) if tt == t => d -> n }.toMap
      val scored = byDay.toSeq.flatMap { case (d, n) =>
        byDay.get(d - 7).map(f => (math.abs(n - f), n))
      }
      if (scored.isEmpty) None
      else {
        val sae = scored.map(_._1).sum.toDouble
        Some(t -> (scored.length.toLong, sae / scored.length,
          sae / scored.map(_._2).sum))
      }
    }.toMap
    val got = run("q_ts_snaive_backtest").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (t, (k, mae, wape)) =>
      val (gk, gm, gw) = got(t)
      assert(gk == k, s"$t days")
      assert(math.abs(gm - mae) <= 1e-6, s"$t mae")
      assert(math.abs(gw - wape) <= 1e-6, s"$t wape")
    }
  }

  test("abtest: matches a driver-side z recompute and assignment is balanced-ish") {
    val users = Tables.table(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 150d, 1L)
        .otherwise(0L)).as("conv"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def arm(u: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val hex = md.take(2).map("%02x".format(_)).mkString
      Integer.parseInt(hex, 16) % 2
    }
    val a0 = users.filter(u => arm(u._1) == 0)
    val a1 = users.filter(u => arm(u._1) == 1)
    val (n1, c1) = (a0.length.toDouble, a0.map(_._2).sum.toDouble)
    val (n2, c2) = (a1.length.toDouble, a1.map(_._2).sum.toDouble)
    val p1 = c1 / n1; val p2 = c2 / n2
    val pp = (c1 + c2) / (n1 + n2)
    val z = (p1 - p2) /
      math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    val r0 = run("q_stats_abtest").collect().head
    assert(r0.getLong(0) == n1.toLong && r0.getLong(1) == c1.toLong)
    assert(r0.getLong(2) == n2.toLong && r0.getLong(3) == c2.toLong)
    assert(math.abs(r0.getDouble(4) - (p1 - p2)) <= 1e-6)
    assert(math.abs(r0.getDouble(5) - z) <= 1e-5)
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
