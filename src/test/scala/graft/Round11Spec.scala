package graft

import org.apache.spark.sql.functions._

/** Behavior gates for the round-11 operators: series diagnostics (drawdown,
  * peaks, changepoint, Bollinger), nonparametric statistics (Mann–Whitney,
  * mutual information, runs test), sequence mining (Markov, session paths),
  * IGNORE NULLS windows, weighted median, 2-hop recommendations, and the
  * migration checksum. Each is checked against an independent in-process
  * brute-force formulation (the DuckDB oracle already pins cross-engine
  * value equality; these pin the SEMANTICS).
  */
class Round11Spec extends SparkSuite {

  /** (type, day, count) day-grain series of the fixture, driver-side. */
  private lazy val daily: Map[String, Seq[(Long, Long)]] =
    Tables.table(spark, sf, "events")
      .groupBy(col("event_type"),
        floor(graft.Ts.epochSec(col("ts")) / lit(86400d)).cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(x => (x._2, x._3)).sortBy(_._1).toSeq }

  test("drawdown: equals brute-force running-max scan") {
    val got = run("q_ts_drawdown").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    daily.foreach { case (t, series) =>
      var peak = Long.MinValue; var best = Long.MinValue; var bestDay = Long.MaxValue
      series.foreach { case (d, n) =>
        peak = math.max(peak, n)
        val dd = peak - n
        if (dd > best) { best = dd; bestDay = d }
      }
      assert(got(t) == (best, bestDay), s"type=$t")
    }
  }

  test("peaks: equals brute-force strict local maxima") {
    val got = run("q_ts_peaks").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    daily.foreach { case (t, series) =>
      val ns = series.map(_._2)
      val idx = (1 until ns.size - 1).filter(i => ns(i) > ns(i - 1) && ns(i) > ns(i + 1))
      val nPeaks = idx.size.toLong
      val top = idx.map(ns).max
      val topDay = idx.filter(i => ns(i) == top).map(i => series(i)._1).min
      assert(got(t) == (nPeaks, top, topDay), s"type=$t")
    }
  }

  test("changepoint: equals brute-force argmax of between-segment SS") {
    val got = run("q_ts_changepoint").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    daily.foreach { case (t, series) =>
      val ns = series.map(_._2)
      val nd = ns.size.toLong
      val tot = ns.sum
      var bestScore = -1d; var bestK = -1L
      var cum = 0L
      for (i <- 0 until ns.size - 1) {
        cum += ns(i)
        val k = i + 1L
        val num = cum * nd - tot * k
        val score = (num.toDouble * num.toDouble) / (k * (nd - k) * nd).toDouble
        if (score > bestScore) { bestScore = score; bestK = k }
      }
      val (nDays, cpK, cpDay) = got(t)
      assert(nDays == nd && cpK == bestK && cpDay == series((bestK - 1).toInt)._1,
        s"type=$t")
    }
  }

  test("bollinger: integer breach predicate equals the float band test") {
    val got = run("q_ts_bollinger").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    daily.foreach { case (t, series) =>
      val byDay = series.toMap
      var scored = 0L; var hi = 0L; var lo = 0L
      series.foreach { case (d, n) =>
        val win = (d - 6 to d).flatMap(byDay.get)
        if (win.size == 7) {
          scored += 1
          val m = win.sum / 7.0
          val sd = math.sqrt(win.map(x => (x - m) * (x - m)).sum / 7.0)
          if (n - m > 2 * sd) hi += 1
          if (m - n > 2 * sd) lo += 1
        }
      }
      assert(got(t) == (scored, hi, lo), s"type=$t")
    }
  }

  test("mann-whitney: half-rank U equals brute-force average-tie ranking") {
    val lens = Tables.table(spark, sf, "documents")
      .select(col("n_chars"), (col("lang") === "en").as("en"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val sorted = lens.map(_._1).sorted
    // average rank per value (1-based)
    val rankByV = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
    val r1 = lens.filter(_._2).map(x => rankByV(x._1)).sum
    val n1 = lens.count(_._2).toLong
    val u1x2Want = math.round(2 * r1) - n1 * (n1 + 1)
    val row = run("q_stats_mannwhitney").collect().head
    assert(row.getLong(0) == n1)
    assert(row.getLong(2) == u1x2Want)
  }

  test("mutual info: non-negative and below both marginal entropies") {
    val row = run("q_stats_mutual_info").collect().head
    val mi = row.getDouble(2)
    assert(mi >= 0d)
    // H(type) and H(dow) upper-bound MI; types ≤ 5 → H ≤ ln 5, dow ≤ ln 7
    assert(mi <= math.log(5) + 1e-9 && mi <= math.log(7) + 1e-9)
    assert(math.abs(row.getDouble(3) - mi / math.log(2)) < 2e-6)
  }

  test("runs test: equals brute-force sign-sequence scan") {
    val evs = Tables.table(spark, sf, "events")
      .select(col("event_type"), graft.Ts.epochMicros(col("ts")).as("us"),
        col("event_id"), floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = run("q_stats_runs").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    evs.groupBy(_._1).foreach { case (t, xs) =>
      val ordered = xs.sortBy(x => (x._2, x._3))
      val tot = ordered.map(_._4).sum
      val nAll = ordered.size.toLong
      val signs = ordered.map(x => nAll * x._4 - tot).filter(_ != 0).map(_ > 0)
      val runs = if (signs.isEmpty) 0L
        else 1L + signs.sliding(2).count(p => p.size == 2 && p(0) != p(1))
      assert(got(t) == (signs.count(identity).toLong,
        signs.count(!_).toLong, runs), s"type=$t")
    }
  }

  test("markov: per-state probabilities sum to 1 and counts match trigram grain") {
    val rows = run("q_seq_markov").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (from, xs) =>
      val pSum = xs.map(_._4).sum
      assert(math.abs(pSum - 1d) < 1e-4, s"from=$from pSum=$pSum")
    }
    // total transitions = total events - distinct users (one lead loss each)
    val nEvents = Tables.table(spark, sf, "events").count()
    val nUsers = Tables.table(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers)
  }

  test("session paths: path strings are capped at 8 steps and counts are sane") {
    val rows = run("q_seq_paths").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.size <= 10)
    rows.foreach { case (p, n) =>
      assert(p.split(">").length <= 8)
      assert(n >= 1)
    }
    // descending count order with path tie-break
    assert(rows.toSeq.sliding(2).forall {
      case Seq((p1, n1), (p2, n2)) => n1 > n2 || (n1 == n2 && p1 < p2)
      case _ => true
    })
  }

  test("ignore nulls: equals brute-force first/second/last purchase per user") {
    val evs = Tables.table(spark, sf, "events")
      .select(col("user_id"), graft.Ts.epochMicros(col("ts")).as("us"),
        col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val got = run("q_win_ignore_nulls").collect().map { r =>
      r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))
    }.toMap
    evs.groupBy(_._1).foreach { case (u, xs) =>
      val ordered = xs.sortBy(x => (x._2, x._3))
      val purchases = ordered.filter(_._4 == "purchase").map(_._5)
      val carries = ordered.map(_._4).zipWithIndex.flatMap { case (_, i) =>
        ordered.take(i).reverse.find(_._4 == "purchase").map(_._5)
      }
      val want = (purchases.headOption, purchases.lift(1), purchases.lastOption,
        if (carries.isEmpty) None else Some(carries.sum))
      assert(got(u) == want, s"user=$u")
    }
  }

  test("weighted median: equals brute-force cumulative-weight scan") {
    val li = Tables.table(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"),
        floor(col("l_quantity") + 0.5).cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = run("q_agg_weighted_median").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    li.groupBy(_._1).foreach { case (f, xs) =>
      val byV = xs.groupBy(_._2).map { case (v, ys) => v -> ys.map(_._3).sum }
        .toSeq.sortBy(_._1)
      val w = byV.map(_._2).sum
      var cum = 0L
      val med = byV.find { case (_, wv) => cum += wv; cum * 2 >= w }.get._1
      assert(got(f) == (w, med / 100.0), s"flag=$f")
    }
  }

  test("2-hop: equals brute-force wedge minus direct edges") {
    val oe = graft.operators.Graph.affinityGraph(spark, sf)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (oe ++ oe.map(_.swap)).toSet
    val nbr = adj.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2) }
    val want = nbr.map { case (u, ns) =>
      u -> ns.flatMap(w => nbr(w)).filter(v => v != u && !adj((u, v))).size.toLong
    }.filter(_._2 > 0)
    val top = want.toSeq.sortBy { case (u, n) => (-n, u) }.take(10)
    val got = run("q_graph_2hop").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == top)
  }

  test("checksum: equals in-process md5 arithmetic and covers every row") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Tables.table(spark, sf, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        floor(graft.Ts.epochSec(col("o_orderdate")) / lit(86400d)).cast("long").as("day"),
        col("o_orderpriority"))
      .collect()
      .map(r => (r.getString(0),
        md5hex(s"${r.getLong(1)}|${r.getLong(2)}|${r.getLong(3)}|${r.getLong(4)}|${r.getString(5)}")))
    val want = rows.groupBy(_._1).map { case (st, xs) =>
      val hs = xs.map(_._2)
      st -> (xs.size.toLong,
        hs.map(h => java.lang.Long.parseLong(h.take(4), 16)).sum,
        hs.min, hs.max)
    }
    val got = run("q_audit_checksum").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(got == want)
    assert(want.values.map(_._1).sum == rows.length.toLong)
  }

  test("gaps: equals brute-force consecutive-difference scan") {
    val evs = Tables.table(spark, sf, "events")
      .select(col("event_type"), graft.Ts.epochMicros(col("ts")).as("us"),
        col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = run("q_ts_gaps").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    evs.groupBy(_._1).foreach { case (t, xs) =>
      val us = xs.sortBy(x => (x._2, x._3)).map(_._2)
      val gaps = us.zip(us.tail).map { case (a, b) => (b - a, a) }
      val maxGap = gaps.map(_._1).max
      val want = (gaps.size.toLong, gaps.count(_._1 > 3600000000L).toLong,
        maxGap, gaps.filter(_._1 == maxGap).map(_._2).min)
      assert(got(t) == want, s"type=$t")
    }
  }

  test("acf: each lag equals brute-force Pearson over aligned pairs") {
    val got = run("q_ts_acf").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    daily.foreach { case (t, series) =>
      val ns = series.map(_._2.toDouble)
      (1 to 7).foreach { k =>
        if (ns.size > k) {
          val xs = ns.dropRight(k); val ys = ns.drop(k)
          val n = xs.size.toDouble
          val sx = xs.sum; val sy = ys.sum
          val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
          val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
          val r = (n * sxy - sx * sy) /
            (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
          val (gn, gr) = got((t, k.toLong))
          assert(gn == xs.size.toLong, s"type=$t k=$k")
          assert(math.abs(gr - r) < 1e-5, s"type=$t k=$k got=$gr want=$r")
        }
      }
    }
  }

  test("theil-sen: equals brute-force median of pairwise slopes") {
    val got = run("q_ts_theilsen").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    daily.foreach { case (t, series) =>
      val slopes = for {
        i <- series.indices; j <- (i + 1) until series.size
      } yield (series(j)._2 - series(i)._2).toDouble /
        (series(j)._1 - series(i)._1).toDouble
      val sorted = slopes.sorted
      // lower median: smallest element whose 1-based rank r has 2r >= n
      val lowerMed = sorted(((sorted.size + 1) / 2) - 1)
      val (np, slope) = got(t)
      assert(np == slopes.size.toLong, s"type=$t")
      assert(math.abs(slope - lowerMed) < 1e-6,
        s"type=$t got=$slope want=$lowerMed")
    }
  }

  test("ccf: each lag equals brute-force Pearson over shifted-day pairs") {
    val got = run("q_ts_ccf").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ca = daily("click").toMap
    val cb = daily("purchase").toMap
    (-3L to 3L).foreach { k =>
      val pairs = ca.toSeq.flatMap { case (d, x) => cb.get(d + k).map(y => (x.toDouble, y.toDouble)) }
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum; val syy = pairs.map(p => p._2 * p._2).sum
      val r = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      val (gn, gr) = got(k)
      assert(gn == pairs.size.toLong, s"k=$k")
      assert(math.abs(gr - r) < 1e-5, s"k=$k got=$gr want=$r")
    }
  }

  test("simpson: equals brute-force collision probability per source") {
    val docs = Tables.table(spark, sf, "documents")
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = run("q_stats_simpson").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val byLang = xs.groupBy(_._2).map { case (_, ys) => ys.size.toLong }
      val n = xs.size.toLong
      val coll = byLang.map(ni => ni * (ni - 1)).sum
      val simpson = 1.0 - coll.toDouble / (n.toDouble * (n - 1).toDouble)
      val (gl, gn, gs) = got(src)
      assert(gl == byLang.size.toLong && gn == n, s"source=$src")
      assert(math.abs(gs - simpson) < 1e-5, s"source=$src")
    }
  }

  test("levene: equals brute-force ANOVA on median absolute deviations") {
    val got = run("q_stats_levene").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    daily.foreach { case (t, series) =>
      val groups = series.groupBy { case (d, _) => ((d + 3) % 7) }
        .map { case (dow, xs) =>
          // lower median over (x, day) order = element at ceil(n/2) of x-sorted
          val sorted = xs.sortBy { case (d, x) => (x, d) }.map(_._2)
          val med = sorted(((sorted.size + 1) / 2) - 1)
          dow -> xs.map { case (_, x) => math.abs(x - med).toDouble }
        }
      val all = groups.values.flatten
      val n = all.size.toDouble; val k = groups.size.toDouble
      val gm = all.sum / n
      val ssb = groups.values.map(zs => zs.size * math.pow(zs.sum / zs.size - gm, 2)).sum
      val ssw = groups.values.flatMap(zs => { val m = zs.sum / zs.size; zs.map(z => (z - m) * (z - m)) }).sum
      val w = (ssb / (k - 1)) / (ssw / (n - k))
      val (gn, gw) = got(t)
      assert(gn == all.size.toLong, s"type=$t")
      assert(math.abs(gw - w) < 1e-4, s"type=$t got=$gw want=$w")
    }
  }

  test("holt: forecast is level plus trend and the group count is full") {
    val rows = run("q_ts_holt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, nd, l, b, f) =>
      assert(nd == daily(t).size.toLong, s"type=$t")
      assert(math.abs(f - (l + b)) < 2e-6, s"type=$t")
    }
  }

  test("rrf: fused score consistent with independently recomputed ranks") {
    val rows = run("q_vec_rrf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { case (_, rc, rd, rrf) =>
      val want = 1.0 / (60 + rc) + 1.0 / (60 + rd)
      assert(math.abs(rrf - want) < 1e-6)
    }
    assert(rows.map(_._4).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b
      case _ => true
    })
  }
}
