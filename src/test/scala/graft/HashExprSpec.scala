package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Gates for the audit-digest expression family (HashExpressions.scala):
  * every custom expression is pinned against the composed built-in it
  * replaces (same engine, same rows), so the DuckDB oracle twin — which
  * keeps using plain md5/concat_ws — stays valid by transitivity. Plus the
  * plan-shape pin that motivated the family: the checksum aggregate must be
  * a HashAggregate (min/max over a STRING buffer silently degraded it to
  * SortAggregate in r12 — two full input sorts, 2.78 s for a one-map-pass
  * checksum).
  */
class HashExprSpec extends SparkSuite {
  import spark.implicits._
  import graft.functions.HashExpr

  private val fixtures = Seq(
    (0L, 0L, 0L, 0L, ""),
    (1L, 2L, 3L, 4L, "1-URGENT"),
    (6000000L, 449999L, 10453502L, 9131L, "3-MEDIUM"),
    (-7L, -1L, -123456789L, -9999L, "edge|with|pipes"),
    (Long.MaxValue, Long.MinValue + 1, 42L, 7L, "ünïcode-ÿ €"),
    // Long.MinValue IN EVERY SLOT: -x overflows onto itself, so a digit loop
    // written in positive space emits garbage bytes for it (r13 review
    // finding — writeLong now renders in negative space)
    (Long.MinValue, Long.MinValue, Long.MinValue, Long.MinValue, "min"),
    (123L, 456L, 789L, 101112L, "5-LOW")
  )

  test("AuditDigest == md5(concat_ws('|', ...)) built-in, including negatives and multibyte") {
    val df = fixtures.toDF("k", "c", "m", "d", "p")
    val rows = df.select(
      HashExpr.auditDigest(col("k"), col("c"), col("m"), col("d"), col("p")).as("fused"),
      md5(concat_ws("|", col("k"), col("c"), col("m"), col("d"), col("p"))).as("builtin")
    ).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r))
  }

  test("AuditDigest null-propagates like concat_ws-of-null does NOT: explicit null gate") {
    // concat_ws skips nulls; AuditDigest is null-intolerant. The checksum
    // query's canon columns are non-null by fixture contract — this pin just
    // documents the (intended) divergence instead of letting it surprise.
    val df = Seq((Some(1L), 2L, 3L, 4L, "x"), (None, 2L, 3L, 4L, "x"))
      .toDF("k", "c", "m", "d", "p")
    val rows = df.select(
      HashExpr.auditDigest(col("k"), col("c"), col("m"), col("d"), col("p")).as("h"))
      .collect()
    assert(rows(0).getString(0) != null)
    assert(rows(1).isNullAt(0))
  }

  test("GraftMd5 == built-in md5; HexPrefix16 == conv(substring(h,1,4),16,10)") {
    val df = fixtures.map(_._5).toDF("s")
    val rows = df.select(
      HashExpr.md5Fast(col("s")).as("fast"),
      md5(col("s")).as("builtin")
    ).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r))
    val pfx = df.select(
      HashExpr.hexPrefix16(HashExpr.md5Fast(col("s"))).as("fast"),
      conv(substring(md5(col("s")), 1, 4), 16, 10).cast(LongType).as("builtin")
    ).collect()
    pfx.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("MinMax128 == min/max over the hex string, grouped, incl. high-bit digests") {
    // digests whose halves exercise the unsigned compare: leading 0/f chars,
    // ties on the high half resolved by the low half
    val hs = Seq(
      ("a", "00000000000000000000000000000001"),
      ("a", "0000000000000000ffffffffffffffff"),
      ("a", "8000000000000000e000000000000001"),
      ("a", "8000000000000000e000000000000000"),
      ("a", "ffffffffffffffffffffffffffffffff"),
      ("b", "7fffffffffffffff0123456789abcdef"),
      ("b", "80000000000000000123456789abcdef")
    )
    val df = hs.toDF("g", "h")
    val got = df.groupBy("g").agg(
        HashExpr.minHex128(col("h")).as("mn128"),
        HashExpr.maxHex128(col("h")).as("mx128"),
        min(col("h")).as("mn"), max(col("h")).as("mx"))
      .orderBy("g").collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(3), r)
      assert(r.getString(2) == r.getString(4), r)
    }
  }

  test("MinMax128 matches min/max(h) on real fixture digests end-to-end") {
    val day = floor(graft.Ts.epochSec(col("o_orderdate")) / lit(86400d))
      .cast(LongType)
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
    val h = HashExpr.auditDigest(col("o_orderkey"), col("o_custkey"),
      cents, day, col("o_orderpriority"))
    val base = graft.Tables.table(spark, sf, "orders")
      .select(col("o_orderstatus"), h.as("h"))
    val got = base.groupBy("o_orderstatus").agg(
        HashExpr.minHex128(col("h")).as("mn128"),
        HashExpr.maxHex128(col("h")).as("mx128"),
        min(col("h")).as("mn"), max(col("h")).as("mx"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getString(1) == r.getString(3), r)
      assert(r.getString(2) == r.getString(4), r)
    }
  }

  test("q_audit_checksum plans a HashAggregate — never SortAggregate") {
    val p = run("q_audit_checksum").queryExecution.executedPlan.toString
    assert(!p.contains("SortAggregate"), p)
    assert(p.contains("HashAggregate"), p)
  }
}
