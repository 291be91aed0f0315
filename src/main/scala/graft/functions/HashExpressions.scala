package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared digest machinery for [[GraftMd5]] — top-level object so generated
  * code can call it through the Scala static forwarder.
  *
  * Why not the built-in `md5()`: Spark's `Md5` expression routes each row
  * through commons-codec `DigestUtils.md5Hex`, which calls
  * `MessageDigest.getInstance("MD5")` PER ROW — a provider-lookup +
  * allocation path the JIT takes thousands of invocations to fully compile.
  * Measured on the audit-checksum query (150k rows, local[32], sf0.1): the
  * built-in needs ~6 passes to descend 4.2 s → 0.37 s steady state, so a
  * 3-sample interleaved bench records the warm-up, not the operator (r12:
  * 2.78 s median for a one-map-pass checksum). This helper hoists the
  * MessageDigest into a ThreadLocal (getInstance once per executor thread,
  * `reset()` between rows is a field clear) and hex-encodes via a table into
  * a preallocated byte[32] — same 32-char lowercase hex contract as the
  * built-in and as DuckDB's `md5()`, so oracle twins keep using plain md5.
  */
object HashUtil {
  // the ONE copy of the hex alphabet / thread-local digest / 32-hex encoder:
  // AuditDigestUtil and HexCodec below share these instead of re-rolling them
  private[functions] val hexChars: Array[Byte] = "0123456789abcdef".getBytes
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The calling thread's MD5 instance, reset and ready. */
  private[functions] def md5(): java.security.MessageDigest = {
    val md = digests.get(); md.reset(); md
  }

  /** 32-char lowercase hex of a 16-byte digest. */
  private[functions] def hex32(dig: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      val b = dig(i) & 0xff
      out(2 * i) = hexChars(b >>> 4)
      out(2 * i + 1) = hexChars(b & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** 32-char lowercase hex MD5 of the string's UTF-8 bytes — byte-identical
    * to Spark `md5(cast(s as binary))` and DuckDB `md5(s)`. */
  def md5Hex(s: UTF8String): UTF8String = hex32(md5().digest(s.getBytes))

  /** Value of the first 4 lowercase-hex chars — the 16-bit digest prefix the
    * associative audit checksum sums. Equivalent to
    * `conv(substring(h,1,4),16,10)` but pure byte arithmetic: `Conv` parses
    * through NumberConverter (div/mod loop + string alloc) at ~1.3 µs/row,
    * which doubled the checksum query's steady-state time. */
  def hexPrefix16(h: UTF8String): Long = {
    var v = 0L
    var i = 0
    while (i < 4 && i < h.numBytes()) {
      val c = h.getByte(i)
      val d = if (c >= 'a') c - 'a' + 10 else c - '0'
      v = v * 16 + d
      i += 1
    }
    v
  }
}

/** Codegen'd MD5-hex over a STRING column via [[HashUtil.md5Hex]] (see its
  * scaladoc for the measured case against the built-in `md5()`). Null
  * handling: standard UnaryExpression null-intolerance. */
case class GraftMd5(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_md5"
  override def nullSafeEval(s: Any): Any =
    HashUtil.md5Hex(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.md5Hex($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd 16-bit hex-prefix value of a lowercase hex digest string —
  * `conv(substring(h,1,4),16,10)` without the NumberConverter allocation. */
case class HexPrefix16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex_prefix16"
  override def nullSafeEval(s: Any): Any =
    HashUtil.hexPrefix16(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.hexPrefix16($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval body for [[AuditDigest]]. The '|'-joined canonical string is
  * never materialized: decimal digits of each long and the raw bytes of each
  * string land straight in a thread-local byte buffer, which is digested in
  * place. Byte-identical to
  * `md5(concat_ws('|', k, c, m, d, p))` — decimal rendering of a long and
  * UTF-8 of an ASCII string are engine-invariant — so the DuckDB twin keeps
  * using plain md5/concat_ws. Removing the per-row
  * `cast(long as string) ×4 + concat_ws + DigestUtils.md5Hex` chain is what
  * takes the checksum's per-row cost from ~2.5 µs to ~0.3 µs AND collapses
  * its JIT warm-up (the chain needed ~6 bench passes to reach steady state;
  * a 3-sample median therefore timed warm-up, not the operator — r12:
  * 2.78 s for a one-map-pass checksum over 150k rows). */
object AuditDigestUtil {
  private val bufs = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  private def writeLong(buf: Array[Byte], at: Int, v: Long): Int = {
    var pos = at
    // digits are produced in NEGATIVE space: -|v| exists for every long, so
    // Long.MinValue renders its true decimal form (the naive `x = -x` wraps
    // MinValue onto itself and `x % 10` then emits bytes below '0' — a
    // silent divergence from the md5(concat_ws) twin on adversarial input)
    var x = if (v < 0) { buf(pos) = '-'; pos += 1; v } else -v
    val start = pos
    do { buf(pos) = ('0' - (x % 10)).toByte; x /= 10; pos += 1 } while (x != 0)
    // digits were written little-endian; reverse in place
    var i = start; var j = pos - 1
    while (i < j) { val t = buf(i); buf(i) = buf(j); buf(j) = t; i += 1; j -= 1 }
    pos
  }

  def md5Canon(k: Long, c: Long, m: Long, d: Long, p: UTF8String): UTF8String = {
    var buf = bufs.get()
    val pn = p.numBytes()
    if (buf.length < 90 + pn) { buf = new Array[Byte](90 + pn); bufs.set(buf) }
    var pos = writeLong(buf, 0, k)
    buf(pos) = '|'; pos += 1
    pos = writeLong(buf, pos, c)
    buf(pos) = '|'; pos += 1
    pos = writeLong(buf, pos, m)
    buf(pos) = '|'; pos += 1
    pos = writeLong(buf, pos, d)
    buf(pos) = '|'; pos += 1
    p.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
    pos += pn
    val md = HashUtil.md5()
    md.update(buf, 0, pos)
    HashUtil.hex32(md.digest())
  }
}

/** Codegen'd fused canonicalize+digest for the audit checksum:
  * `md5(concat_ws('|', key, cust, cents, day, priority))` as ONE monomorphic
  * call per row (see [[AuditDigestUtil]] for why the composed built-ins were
  * 8× slower and warm-up-bound). Children: four LONGs and a STRING; null
  * handling is standard null-intolerance, matching concat_ws-of-nullable
  * only on the fixture's non-null audit columns (the oracle twin has the
  * same null behavior assumption spelled out in the query scaladoc). */
case class AuditDigest(children: Seq[Expression]) extends Expression {
  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(LongType, LongType, LongType, LongType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case ts => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (long, long, long, long, string), got $ts")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_audit_digest"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else AuditDigestUtil.md5Canon(
      vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Long],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Long],
      vs(4).asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val gens = children.map(_.genCode(ctx))
    val childCode = gens.map(_.code).reduce(_ + _)
    val anyNull = gens.map(g => s"(${g.isNull})").mkString(" || ")
    val argList = gens.map(g => s"${g.value}").mkString(", ")
    ev.copy(code =
      code"""
         |$childCode
         |boolean ${ev.isNull} = $anyNull;
         |org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.AuditDigestUtil.md5Canon($argList);
         |}
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Static bodies for the 128-bit digest codec expressions. */
object HexCodec {
  import HashUtil.hexChars

  /** Bits of hex chars [from, from+16) as a long (unsigned bit pattern). */
  def hexToLong(h: UTF8String, from: Int): Long = {
    var v = 0L
    var i = from
    val end = from + 16
    while (i < end) {
      val c = h.getByte(i)
      val d = if (c >= 'a') c - 'a' + 10 else c - '0'
      v = (v << 4) | d
      i += 1
    }
    v
  }

  /** 32-char lowercase hex of the 128-bit (hi, lo) pair — the inverse of
    * two [[hexToLong]] halves. */
  def longsToHex(hi: Long, lo: Long): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(i) = hexChars(((hi >>> ((15 - i) * 4)) & 0xf).toInt)
      out(16 + i) = hexChars(((lo >>> ((15 - i) * 4)) & 0xf).toInt)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Codegen'd half-digest extractor: chars [from, from+16) of a 32-char
  * lowercase hex string as a LONG bit pattern. */
case class HexHalf64(child: Expression, from: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex_half"
  override def nullSafeEval(s: Any): Any =
    HexCodec.hexToLong(s.asInstanceOf[UTF8String], from)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexCodec.hexToLong($c, $from)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd inverse of two [[HexHalf64]] halves. */
case class LongsToHex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (long, long), got ($l, $r)")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_longs_to_hex"
  override def nullSafeEval(a: Any, b: Any): Any =
    HexCodec.longsToHex(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HexCodec.longsToHex($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** HashAggregate-compatible min/max over a 128-bit value carried as two
  * LONG halves — the device that keeps `min(md5_hex)`/`max(md5_hex)` out of
  * SortAggregate.
  *
  * Why it exists: `min(h)`/`max(h)` over a STRING column put a StringType
  * field in the aggregation buffer, and HashAggregateExec requires every
  * buffer field to be UnsafeRow-MUTABLE (fixed-width) — so the whole
  * aggregate silently degraded to SortAggregate, which SORTS the full input
  * on the group key at BOTH the partial and final stages. On the audit
  * checksum that sort dominated (r12 bench: 2.78 s vs ~0.15 s for the same
  * shape with numeric aggregates), and its generated comparator was also the
  * slow-JIT-warm-up path that made 3-sample medians unrepresentative. Two
  * LongType buffer fields keep the HashAggregate fast path; lexicographic
  * order over lowercase fixed-width hex == unsigned numeric order of the
  * 128-bit value == unsigned-pairwise order of the halves, so the result is
  * EXACTLY min/max of the hex string, reconstructed by [[LongsToHex]].
  * Unsigned long comparison is `(x ^ Long.MIN_VALUE) < (y ^ Long.MIN_VALUE)`
  * expressed declaratively — every update/merge expression is codegen'd
  * arithmetic, no imperative state. */
case class MinMax128(hi: Expression, lo: Expression, isMin: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, If, IsNull, IsNotNull, Literal, Or, And, LessThan, EqualTo, BitwiseXor}
  import org.apache.spark.sql.catalyst.dsl.expressions._

  override def children: Seq[Expression] = Seq(hi, lo)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = if (isMin) "graft_min128" else "graft_max128"
  override def checkInputDataTypes(): TypeCheckResult =
    (hi.dataType, lo.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (long, long), got ($l, $r)")
    }

  private val bHi = AttributeReference("bHi", LongType)()
  private val bLo = AttributeReference("bLo", LongType)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(bHi, bLo)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, LongType), Literal(null, LongType))

  private def ux(e: Expression): Expression =
    BitwiseXor(e, Literal(Long.MinValue))
  /** (aHi,aLo) strictly precedes (bHi,bLo) in the aggregate's direction,
    * comparing halves as unsigned. */
  private def beats(aHi: Expression, aLo: Expression,
      oHi: Expression, oLo: Expression): Expression = {
    def lt(x: Expression, y: Expression) =
      if (isMin) LessThan(ux(x), ux(y)) else LessThan(ux(y), ux(x))
    Or(lt(aHi, oHi), And(EqualTo(aHi, oHi), lt(aLo, oLo)))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val take = Or(IsNull(bHi), beats(hi, lo, bHi, bLo))
    Seq(If(take, hi, bHi), If(take, lo, bLo))
  }
  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(IsNotNull(bHi.right),
      Or(IsNull(bHi.left), beats(bHi.right, bLo.right, bHi.left, bLo.left)))
    Seq(If(take, bHi.right, bHi.left), If(take, bLo.right, bLo.left))
  }
  override lazy val evaluateExpression: Expression =
    If(IsNull(bHi), Literal(null, StringType), LongsToHex(bHi, bLo))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hi = newChildren(0), lo = newChildren(1))
}

object HashExpr {
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression

  def md5Fast(c: Column): Column =
    ColumnBridge.column(GraftMd5(ColumnBridge.expression(c)))
  def hexPrefix16(c: Column): Column =
    ColumnBridge.column(HexPrefix16(ColumnBridge.expression(c)))
  def auditDigest(k: Column, c: Column, m: Column, d: Column,
      p: Column): Column =
    ColumnBridge.column(AuditDigest(
      Seq(k, c, m, d, p).map(ColumnBridge.expression)))

  private def minMax128(h: Column, isMin: Boolean): Column = {
    val he = ColumnBridge.expression(h)
    ColumnBridge.column(MinMax128(HexHalf64(he, 0), HexHalf64(he, 16), isMin)
      .toAggregateExpression())
  }
  /** Exact `min(h)` over 32-char lowercase hex digests on the HashAggregate
    * fast path (see [[MinMax128]]). */
  def minHex128(h: Column): Column = minMax128(h, isMin = true)
  /** Exact `max(h)`, same device. */
  def maxHex128(h: Column): Column = minMax128(h, isMin = false)
}
