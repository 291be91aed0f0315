package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state typed Aggregators (SURVEY §2.12 UDAF surface, sketch
  * family): Misra–Gries heavy hitters and a per-group bounded-heap top-k.
  * Both are PARTIAL-AGGREGABLE — fixed-size buffers that combine map-side,
  * which is the whole point at 100 TB: the alternatives (exact distinct
  * counting for frequency, a window sort for grouped top-k) shuffle or sort
  * the full input, these ship O(capacity) state per partition/group.
  */

/** Misra–Gries frequent-items summary (Misra & Gries 1982) with the
  * summary-merge rule from Agarwal et al., "Mergeable Summaries" (PODS'12):
  * add counters pointwise, then subtract the (m+1)-largest count and drop
  * non-positives. The merged estimate only ever UNDER-counts, and the total
  * undercount after any merge tree is ≤ n/(m+1) — so any key with true
  * frequency above n/(m+1) is guaranteed present with a positive counter,
  * REGARDLESS of partitioning or merge order. Only that theorem-covered
  * slice of the summary is exposed through the oracle gate (the tail of the
  * candidate set legitimately varies with partition boundaries, exactly as
  * HLL digests vary between engines — same discipline as the
  * q_agg_approx_* bounds).
  */
class MisraGries(m: Int) extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], k: Long): Map[Long, Long] =
    b.get(k) match {
      case Some(c) => b.updated(k, c + 1)
      case None if b.size < m => b.updated(k, 1L)
      case None =>
        // classic MG step: a full summary + unseen key decrements everyone.
        // Single-pass builder, not view.mapValues.filter.toMap — this is
        // the hot path for every row whose key is outside the summary, and
        // the chained form walked the 64-entry map three times per such
        // row (r14 sweep)
        val bld = Map.newBuilder[Long, Long]
        b.foreach { case (key, c) => if (c > 1) bld += key -> (c - 1) }
        bld.result()
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= m) sum
    else {
      // subtract the (m+1)-th largest count, keep strictly positive
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(m)
      sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(r: Map[Long, Long]): Map[Long, Long] = r

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
}

/** Exact per-group top-k as a bounded buffer of (score, key) pairs, kept
  * sorted descending by (score, then ascending key) and truncated to k on
  * every step — grouped top-k WITHOUT a window sort: the window form sorts
  * every group in full (and at 100 TB the sort spills before the rank-k
  * cutoff is even known), while this buffer combines map-side in O(k) state
  * per group, the same shape the driver-side TakeOrdered strategy gives a
  * GLOBAL top-k (q_topk_global's plan). Exact and deterministic: the
  * (score desc, key asc) order is total, so partials merge to the same
  * top-k under any partitioning.
  */
class TopKHeap(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(b: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    // the buffer is sorted by construction: a full row's overwhelmingly
    // common case (v doesn't beat the current k-th) is ONE comparison, and
    // a qualifying row is an insertion — not the append + O(k log k)
    // re-sort this replaces (r14 sweep). `span` with <= keeps equal
    // incumbents ahead of v, exactly like the stable sort of (b :+ v).
    if (b.length >= k && ord.compare(v, b.last) >= 0) b
    else {
      val (pre, post) = b.span(e => ord.compare(e, v) <= 0)
      ((pre :+ v) ++ post).take(k)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    ((a ++ b).sorted(ord)).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** Exact distinct-count over a DENSE integer key domain as a fixed bitset —
  * the bitmap-index technique: one bit per possible key, partials merge by
  * OR (associative, commutative, idempotent), finish = popcount. Against
  * the two existing distinct paths this is the third point of the design
  * space: `countDistinct` is exact but plans an Expand + distinct shuffle
  * of the keys; HLL (q_agg_approx_distinct) is one-pass bounded-state but
  * approximate; the bitset is exact AND one-pass with map-side merge — the
  * right call whenever keys are dense surrogate ids (customer/user/part
  * numbers), which is exactly what warehouse dimensions hand out. State is
  * domain/8 bytes per group regardless of row count (32 KiB here); at a
  * 2^31 user-id domain the production step is the compressed (roaring)
  * variant of the same idea, with identical algebra.
  */
class BitsetDistinct(domain: Int) extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long]((domain + 63) >> 6)

  override def reduce(b: Array[Long], k: Long): Array[Long] = {
    require(k >= 0 && k < domain, s"key $k outside the dense domain [0, $domain)")
    b((k >> 6).toInt) |= 1L << (k & 63)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < r.length) { n += java.lang.Long.bitCount(r(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Fixed bitset built by OR — the build side of a Bloom/runtime filter.
  * Input rows are PRE-HASHED bit positions; state merges by OR (associative,
  * commutative, idempotent), so the finished bits are a pure function of the
  * input SET — identical under any partitioning or merge order. Same state
  * algebra as [[BitsetDistinct]], but finish returns the bits themselves:
  * the artifact a scan-side membership filter consumes.
  */
class OrBitset(nbits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long]((nbits + 63) >> 6)

  override def reduce(b: Array[Long], p: Long): Array[Long] = {
    require(p >= 0 && p < nbits, s"bit position $p outside [0, $nbits)")
    b((p >> 6).toInt) |= 1L << (p & 63)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Count-Min sketch (Cormode & Muthukrishnan 2005): d rows × w counters,
  * est(k) = min over rows of counter[h_i(k)]. Counters are plain SUMS, so
  * partials merge by pointwise addition — the whole sketch is a pure
  * function of the input MULTISET, bit-identical under any partitioning.
  * The structural guarantee is one-sided: collisions only ever ADD, so
  * est(k) ≥ true(k) for every key, after any merge tree — that theorem
  * (plus a measured overcount bound, the HLL-digest discipline) is what
  * faces the oracle gate. Hash rows are the four disjoint 8-hex-char
  * windows of md5(key) — the same engine-portable recipe the sampling and
  * LSH queries use, so DuckDB reproduces the estimates exactly.
  */
class CountMinSketch(d: Int, w: Int) extends Aggregator[String, Array[Long], Array[Long]] {
  require(d <= 4, "md5 yields four disjoint 8-hex-char hash windows")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(b: Array[Long], k: String): Array[Long] = {
    // an 8-hex-char window of the digest string IS the big-endian 4-byte
    // int at the same offset — extracted as byte arithmetic, value-identical
    // to parseLong(hex.substring(8i, 8i+8), 16) but with zero string work
    // on the per-row hot path (the formatting chain HashUtil's scaladoc
    // measured as dominant; r14 sweep). The digest itself comes from
    // HashUtil's shared ThreadLocal instead of a re-rolled one.
    val dig = HashUtil.md5().digest(k.getBytes("UTF-8"))
    var i = 0
    while (i < d) {
      val v = ((dig(4 * i) & 0xffL) << 24) | ((dig(4 * i + 1) & 0xffL) << 16) |
        ((dig(4 * i + 2) & 0xffL) << 8) | (dig(4 * i + 3) & 0xffL)
      b(i * w + (v % w).toInt) += 1
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object SketchAggregates {
  import Tables.table

  /** MG capacity: top-5 keys of the rendered sqrt-skew distribution hold
    * ~1.9% of the mass each, the guarantee needs > 1/(m+1) = 1.54% — ~24%
    * margin at every sf (the render is scale-free). */
  val MgCapacity = 64

  /** Dense-bitset domain from a data-derived max key: NULL-safe (an empty
    * relation yields max = NULL → domain 1, the empty bitset) and bounded
    * (past ~2^31 keys `.toInt + 1` would wrap NEGATIVE and the allocation
    * would throw NegativeArraySizeException on every task — the clear error
    * here names the roaring-bitmap production path instead; r14 diff
    * review). */
  private def bitsetDomain(maxKey: org.apache.spark.sql.Row): Int = {
    if (maxKey.isNullAt(0)) 1
    else {
      val m = maxKey.getLong(0)
      require(m >= 0 && m < Int.MaxValue - 63,
        s"key domain [0, $m] too large for a dense bitset — use the " +
          "compressed (roaring) variant the scaladoc describes")
      m.toInt + 1
    }
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_agg_heavy_hitters",
      "Misra–Gries heavy hitters under the sketch-bound oracle discipline: " +
        "a skewed BIGINT key is rendered from the event integers " +
        "(floor(sqrt(id mod 1e4)) — density of key v is ~(2v+1)/1e4, IEEE " +
        "sqrt is correctly rounded so the render is bit-identical on both " +
        "engines), the typed MG Aggregator (capacity 64) summarizes it in " +
        "one pass next to the exact counts, and the query emits the exact " +
        "top-5 plus two theorem-backed booleans: the key IS in the summary " +
        "and its undercount is ≤ n/(m+1) (Mergeable Summaries, PODS'12). " +
        "Both hold at ~24% margin for every partitioning and merge order — " +
        "while the summary's TAIL legitimately varies with partition " +
        "boundaries, so only the covered slice faces the gate (the HLL/GK " +
        "discipline). The DuckDB twin computes the exact side with literal " +
        "TRUEs: an MG implementation bug that evicts a guaranteed key " +
        "breaks the hash. Scale: the sketch is 64 counters per partition " +
        "merged once — frequency estimation with NO distinct-key shuffle.",
      (s, dir) => {
        val mg = udaf(new MisraGries(MgCapacity))
        val keyed = Tables.spread(s, table(s, dir, "events"))
          .select(floor(sqrt(col("event_id") % 10000)).cast("long").as("hk"))
        val summary = keyed.agg(
          mg(col("hk")).as("sketch"), count(lit(1)).as("n"))
        val top = keyed.groupBy("hk").agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("hk")).limit(5)
        top.crossJoin(broadcast(summary))
          .select(col("hk"), col("exact_n"),
            col("sketch").getItem(col("hk")).isNotNull.as("in_sketch"),
            (col("exact_n") - coalesce(col("sketch").getItem(col("hk")), lit(0L)) <=
              col("n").cast("double") / (MgCapacity + 1)).as("within_bound"))
          .orderBy(col("exact_n").desc, col("hk"))
      },
      Some(
        """WITH k AS (SELECT CAST(floor(sqrt(event_id % 10000)) AS BIGINT) AS hk FROM events),
          |c AS (SELECT hk, count(*) AS exact_n FROM k GROUP BY hk)
          |SELECT hk, exact_n, TRUE AS in_sketch, TRUE AS within_bound
          |FROM c ORDER BY exact_n DESC, hk LIMIT 5""".stripMargin)),

    GraftQuery(
      "q_agg_topk_heap",
      "Per-group top-k via the bounded-heap typed Aggregator — the partial-" +
        "aggregable alternative to q_win_rank's window: top-3 customers by " +
        "account balance per market segment, computed with O(3) state per " +
        "group combined map-side, no per-group sort anywhere in the plan. " +
        "Exact and total-ordered (balance desc, custkey asc), so the oracle " +
        "is the plain window form — same rows, radically different " +
        "physical shape, and the one that survives a 100 TB group.",
      (s, dir) => {
        val topk = udaf(new TopKHeap(3))
        table(s, dir, "customer")
          .groupBy("c_mktsegment")
          .agg(topk(col("c_acctbal"), col("c_custkey")).as("top"))
          .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("rk0", "p")))
          .select(col("c_mktsegment"), (col("rk0") + 1).as("rk"),
            col("p._2").as("c_custkey"), col("p._1").as("c_acctbal"))
          .orderBy("c_mktsegment", "rk")
      },
      Some(
        """SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
          |  SELECT c_mktsegment, c_custkey, c_acctbal,
          |    row_number() OVER (PARTITION BY c_mktsegment
          |      ORDER BY c_acctbal DESC, c_custkey) AS rk
          |  FROM customer)
          |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin)),

    GraftQuery(
      "q_agg_bitmap_distinct",
      "EXACT distinct customers per order priority via a fixed-bitset typed " +
        "Aggregator (the bitmap-index move): one bit per key in the dense " +
        "surrogate-id domain, partials merge by OR map-side, finish is a " +
        "popcount. The third point of the distinct design space next to " +
        "countDistinct (exact, but Expand + distinct shuffle of every key) " +
        "and HLL (one-pass bounded state, but approximate): exact AND " +
        "one-pass, state domain/8 bytes per group independent of row " +
        "count. The oracle is count(DISTINCT …) — same numbers from the " +
        "shuffle-free plan. At a 2^31 id domain the production variant is " +
        "the compressed (roaring) bitmap with identical algebra.",
      (s, dir) => {
        // domain from the DATA, like q_agg_bitmap_and — a hardcoded 2^18
        // crashed at sf >= 2 where o_custkey (150k x SF) outgrows it on a
        // query whose whole point is the 100 TB posture (r14 sweep). The
        // max() probe is an eager builder step: Bench.isEager prices it.
        val dom = bitsetDomain(table(s, dir, "orders").agg(max(col("o_custkey"))).head)
        val bits = udaf(new BitsetDistinct(dom))
        table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(bits(col("o_custkey")).as("n_users"), count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some(
        "SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_users, " +
          "count(*) AS n_orders FROM orders " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    GraftQuery(
      "q_join_bloom",
      "Bloom-filter-pruned semi join — the runtime-filter / sideways-" +
        "information-passing move made explicit: the dim side's keys " +
        "(BUILDING-segment customers) hash twice into a 16384-bit filter " +
        "built by the OrBitset Aggregator (8 KiB, OR-merged map-side, " +
        "partition-order-independent), and the FACT side is pruned by a " +
        "pure literal-bitset membership expression at the scan — no join, " +
        "no shuffle, before a single fact row moves. Survivors (true " +
        "matches + measured false positives) then take the exact broadcast " +
        "join. At 100 TB this is THE semi-join plan: the filter costs " +
        "O(bits) to broadcast where the dim itself may not fit, and no " +
        "false negatives is a theorem (bits only turn ON), so " +
        "bloom-then-exact equals the plain semi join — which is what the " +
        "per-priority n_match column proves against the oracle, with " +
        "n_false_pos as the honest cost of the 16 Ki sizing (visible at " +
        "sf0.1 where ~6k positions load the filter to 37%).",
      (s, dir) => {
        val nbits = 16384
        def h(c: Column, off: Int): Column =
          conv(substring(md5(c.cast("string")), off, 13), 16, 10)
            .cast("long") % nbits
        val dim = table(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val orBits = udaf(new OrBitset(nbits))
        val bits = dim
          .select(explode(array(h(col("c_custkey"), 1), h(col("c_custkey"), 14))).as("p"))
          .agg(orBits(col("p")))
          .head.getSeq[Long](0).toArray
        val bitsLit = typedLit(bits.toSeq)
        def member(p: Column): Column =
          call_function("shiftright",
            element_at(bitsLit, (call_function("shiftright", p, lit(6)) + 1).cast("int")),
            (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1
        table(s, dir, "orders")
          .filter(member(h(col("o_custkey"), 1)) && member(h(col("o_custkey"), 14)))
          .join(broadcast(dim), col("o_custkey") === col("c_custkey"), "left")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_cand"),
            count(col("c_custkey")).as("n_match"),
            (count(lit(1)) - count(col("c_custkey"))).as("n_false_pos"))
          .orderBy("o_orderpriority")
      },
      Some(
        """WITH dim AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
          |pos AS (
          |  SELECT CAST('0x'||substr(md5(CAST(c_custkey AS VARCHAR)),1,13) AS UBIGINT) % 16384 AS p FROM dim
          |  UNION
          |  SELECT CAST('0x'||substr(md5(CAST(c_custkey AS VARCHAR)),14,13) AS UBIGINT) % 16384 FROM dim),
          |cand AS (
          |  SELECT o_orderpriority, o_custkey FROM orders
          |  WHERE CAST('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,13) AS UBIGINT) % 16384 IN (SELECT p FROM pos)
          |    AND CAST('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),14,13) AS UBIGINT) % 16384 IN (SELECT p FROM pos)),
          |flagged AS (
          |  SELECT o_orderpriority, (o_custkey IN (SELECT c_custkey FROM dim)) AS hit FROM cand)
          |SELECT o_orderpriority, count(*) AS n_cand,
          |  count(*) FILTER (hit) AS n_match,
          |  count(*) FILTER (NOT hit) AS n_false_pos
          |FROM flagged GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    GraftQuery(
      "q_agg_countmin",
      "Count-Min sketch frequency estimation (d=4 rows x w=2048 counters, " +
        "64 KiB total) under the sketch-gate discipline: counters are sums, " +
        "so the sketch is a pure function of the input multiset — " +
        "bit-identical under any partitioning — and collisions only ADD, " +
        "so est >= exact for EVERY key is a theorem after any merge tree " +
        "(the ge_ok column). The measured side: overcount*w <= 4n " +
        "(bound_ok; measured max overcount is 15 vs slack 29 at sf0.01, " +
        "109 vs 293 at sf0.1 — deterministic, no RNG anywhere). Hash rows " +
        "are the four disjoint 8-hex-char md5 windows, so the oracle " +
        "rebuilds the identical sketch relationally (bucket sums per row, " +
        "min across rows). Scale posture: frequency queries over a 100 TB " +
        "stream cost ONE pass + 64 KiB of mergeable state, vs the full " +
        "(key, count) shuffle an exact group-by ships; the top-10 report " +
        "joins est against exact counts to expose the error the sketch " +
        "actually made.",
      (s, dir) => {
        val (d, w) = (4, 2048)
        val ordersK = table(s, dir, "orders")
          .select(col("o_custkey").cast("string").as("k"), col("o_custkey").as("custkey"))
        val cm = udaf(new CountMinSketch(d, w))
        val sketch = ordersK
          .agg(cm(col("k")))
          .head.getSeq[Long](0).toArray
        val sk = typedLit(sketch.toSeq)
        def pos(i: Int): Column =
          conv(substring(md5(col("custkey").cast("string")), 1 + 8 * i, 8), 16, 10)
            .cast("long") % w
        val est = least((0 until d).map(i =>
          element_at(sk, (lit(i.toLong * w) + pos(i) + 1).cast("int"))): _*)
        val total = broadcast(ordersK.agg(count(lit(1)).as("n_total")))
        ordersK.groupBy("custkey").agg(count(lit(1)).as("exact_cnt"))
          .withColumn("est", est)
          .crossJoin(total)
          .select(
            col("custkey"), col("exact_cnt"), col("est"),
            (col("est") >= col("exact_cnt")).as("ge_ok"),
            ((col("est") - col("exact_cnt")) * w <= lit(4L) * col("n_total")).as("bound_ok"))
          .orderBy(col("exact_cnt").desc, col("custkey"))
          .limit(10)
      },
      Some(
        """WITH c AS (SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY o_custkey),
          |h AS (SELECT k, cnt,
          |  CAST('0x'||substr(md5(CAST(k AS VARCHAR)),1,8) AS UBIGINT) % 2048 AS p0,
          |  CAST('0x'||substr(md5(CAST(k AS VARCHAR)),9,8) AS UBIGINT) % 2048 AS p1,
          |  CAST('0x'||substr(md5(CAST(k AS VARCHAR)),17,8) AS UBIGINT) % 2048 AS p2,
          |  CAST('0x'||substr(md5(CAST(k AS VARCHAR)),25,8) AS UBIGINT) % 2048 AS p3
          |  FROM c),
          |B0 AS (SELECT p0 AS p, CAST(sum(cnt) AS BIGINT) AS s FROM h GROUP BY p0),
          |B1 AS (SELECT p1 AS p, CAST(sum(cnt) AS BIGINT) AS s FROM h GROUP BY p1),
          |B2 AS (SELECT p2 AS p, CAST(sum(cnt) AS BIGINT) AS s FROM h GROUP BY p2),
          |B3 AS (SELECT p3 AS p, CAST(sum(cnt) AS BIGINT) AS s FROM h GROUP BY p3),
          |est AS (
          |  SELECT h.k, h.cnt, least(B0.s, B1.s, B2.s, B3.s) AS est
          |  FROM h JOIN B0 ON h.p0=B0.p JOIN B1 ON h.p1=B1.p
          |         JOIN B2 ON h.p2=B2.p JOIN B3 ON h.p3=B3.p)
          |SELECT k AS custkey, cnt AS exact_cnt, est,
          |  (est >= cnt) AS ge_ok,
          |  ((est - cnt) * 2048 <= 4 * (SELECT CAST(sum(cnt) AS BIGINT) FROM c)) AS bound_ok
          |FROM est ORDER BY cnt DESC, k LIMIT 10""".stripMargin)),

    GraftQuery(
      "q_agg_bitmap_and",
      "Bitmap-index INTERSECTION: per order priority, the exact count of " +
        "distinct ordering customers and of those also in the BUILDING " +
        "segment — computed entirely in bitset algebra. Each priority " +
        "group ORs customer ids into a dense bitset over the surrogate-id " +
        "domain (map-side mergeable, like q_agg_bitmap_distinct); the " +
        "BUILDING segment becomes an 8-KiB literal bitmap; intersection = " +
        "zip_with(&) + popcount — pure word-parallel ops, no second " +
        "distinct shuffle, no join of the fact table. That is the bitmap-" +
        "index move at 100 TB: predicate sets compose with AND/OR on " +
        "domain/8 bytes per group regardless of row count, while the " +
        "relational form (oracle: count(DISTINCT) + count(DISTINCT) " +
        "FILTER (IN dim)) re-shuffles every key per predicate. Exactness " +
        "of AND+popcount over any merge order is structural: OR is " +
        "associative/commutative/idempotent and AND distributes over it.",
      (s, dir) => {
        val cust = table(s, dir, "customer")
        val dom = bitsetDomain(cust.agg(max(col("c_custkey"))).head)
        val orBits = udaf(new OrBitset(dom))
        val dimBits = typedLit(
          cust.filter(col("c_mktsegment") === "BUILDING")
            .agg(orBits(col("c_custkey")))
            .head.getSeq[Long](0))
        def popcount(bits: Column): Column =
          aggregate(transform(bits, b => bit_count(b).cast("long")), lit(0L), _ + _)
        table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(orBits(col("o_custkey")).as("bits"))
          .select(
            col("o_orderpriority"),
            popcount(col("bits")).as("n_distinct"),
            popcount(zip_with(col("bits"), dimBits, _ bitwiseAND _)).as("n_building"))
          .orderBy("o_orderpriority")
      },
      Some(
        """WITH dim AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          |SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_distinct,
          |  count(DISTINCT o_custkey) FILTER (o_custkey IN (SELECT c_custkey FROM dim)) AS n_building
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
