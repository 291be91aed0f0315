package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
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
        // classic MG step: a full summary + unseen key decrements everyone
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
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
    ((b :+ v).sorted(ord)).take(k)

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

object SketchAggregates {
  import Tables.table

  /** MG capacity: top-5 keys of the rendered sqrt-skew distribution hold
    * ~1.9% of the mass each, the guarantee needs > 1/(m+1) = 1.54% — ~24%
    * margin at every sf (the render is scale-free). */
  val MgCapacity = 64

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
        val bits = udaf(new BitsetDistinct(1 << 18))
        table(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(bits(col("o_custkey")).as("n_users"), count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some(
        "SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_users, " +
          "count(*) AS n_orders FROM orders " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority"))
  )
}
