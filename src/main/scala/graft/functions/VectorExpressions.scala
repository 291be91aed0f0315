package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd dot product over two FLOAT[] columns, accumulating in DOUBLE.
  *
  * Semantically identical — bitwise — to the composable form
  * `aggregate(zip_with(a, b, (x,y) => x.cast(double)*y.cast(double)), 0d, _+_)`:
  * double products of float operands are exact, and the fold is sequential
  * left-to-right. But the higher-order-function form is interpreted per row
  * (lambda dispatch per element, no whole-stage codegen), which made the
  * pairwise-similarity query ~25× slower than this tight generated loop.
  * This is the "custom Catalyst Expression where built-ins underperform"
  * escape hatch (SURVEY.md §4) — used by every §2.11 vector operator.
  *
  * Null handling: standard BinaryExpression null-intolerance (null array →
  * null). Array elements are assumed non-null (embedding fixtures guarantee
  * it); lengths may differ — the loop runs over the common prefix, matching
  * zip_with-then-sum over equal-length inputs.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd dot product of a FLOAT[] column against a CONSTANT double vector
  * (e.g. an LSH hyperplane). The constants live in a referenced array — no
  * per-row literal-array construction, no lambda dispatch. Bitwise-identical
  * to `aggregate(zip_with(v, array(lits...), (x,y) => x.cast(double)*y), 0d, _+_)`
  * and to the DuckDB list_zip twin with a literal list.
  */
case class FloatDotConst(child: Expression, plane: Seq[Double])
    extends UnaryExpression {

  // Seq (not Array) so case-class equality is structural — Array fields are
  // reference-equal, which would defeat canonicalization / subexpression
  // elimination for semantically identical plans
  @transient private lazy val planeArr: Array[Double] = plane.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_const"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val arr = planeArr
    val n = math.min(x.numElements(), arr.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * arr(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planeRef = ctx.addReferenceObj("plane", planeArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $planeRef.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * $planeRef[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingles over a tokens array: output[i] = toks[i .. i+n-1]
  * joined by single spaces; empty array when the doc has fewer than n tokens.
  *
  * Exists for speed, not semantics: the composable form
  * `transform(sequence(1, size-2), i -> concat_ws(' ', element_at...))` pays
  * interpreted-lambda dispatch PER ELEMENT (~20× slower measured); this
  * expression is one eval call per ROW with a tight compiled loop.
  * CodegenFallback is fine here — the eval itself is compiled Scala, and the
  * expression feeds an explode (generator) which breaks whole-stage anyway.
  */
case class StringShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  // at construction, not eval: n <= 0 would NegativeArraySizeException every
  // executor task (n < 0) or silently emit len+1 empty shingles (n = 0) —
  // the SQL builder and the Column API both route here (r14 sweep)
  require(n >= 1, s"$prettyName shingle width n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val len = toks.numElements()
    val out = len - n + 1
    if (out <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val res = new Array[Any](out)
      var i = 0
      while (i < out) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        res(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(res)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval body for [[TokenRollingHash]] — a top-level object so the
  * generated code can call it through the Scala static forwarder. */
object RollingHashUtil {
  /** h = fold over tokens: (h*31 + ascii(t)*numChars(t)) mod 1000003, h0 = 0.
    * ascii(t) follows Spark's `ascii`: code point of the first character, 0
    * for the empty string — which also matches DuckDB's `ascii`. */
  def hash(toks: ArrayData): Long = {
    val n = toks.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val nc = t.numChars()
      val a = if (nc > 0) t.substring(0, 1).toString.codePointAt(0) else 0
      h = (h * 31 + a.toLong * nc) % 1000003L
      i += 1
    }
    h
  }
}

/** Codegen'd polynomial rolling hash over a tokens array — the document
  * fingerprint operator. Bitwise-identical to the composable form
  * `aggregate(transform(toks, t -> ascii(t)*length(t)), 0L, (a,b) -> (a*31+b) % 1000003)`,
  * but that pays interpreted-lambda dispatch per ELEMENT twice (transform +
  * aggregate); this is one compiled call per ROW — the same treatment
  * FloatDotProduct gave the dot product.
  */
case class TokenRollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fp"

  override def nullSafeEval(a: Any): Any =
    RollingHashUtil.hash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RollingHashUtil.hash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval body for [[SimHash16]] — top-level object so generated code
  * can call it through the Scala static forwarder. */
object SimHashUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 16-bit SimHash over the DISTINCT tokens of the array: per token,
    * h = first two md5 bytes big-endian (≡ the relational
    * `conv(substring(md5(w),1,4),16,10)`), each of h's 16 bits votes ±1,
    * fingerprint bit bt set iff its vote sum is positive. Dedup happens here
    * (HashSet over the row's tokens) — same contribution set as the
    * `explode(array_distinct(...))` relational form, without materializing
    * the distinct array or the exploded relation. */
  def fingerprint(toks: ArrayData): Int = {
    val digest = md.get()
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    val votes = new Array[Int](16)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      // null elements vote nothing — the relational form's md5(null) → null
      // rows are skipped by the vote sums, and the SQL-registered function
      // accepts containsNull arrays
      if (t != null && seen.add(t)) {
        digest.reset()
        val d = digest.digest(t.getBytes)
        val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        var bt = 0
        while (bt < 16) {
          votes(bt) += (if (((h >> bt) & 1) == 1) 1 else -1)
          bt += 1
        }
      }
      i += 1
    }
    var fp = 0
    var bt = 0
    while (bt < 16) { if (votes(bt) > 0) fp |= 1 << bt; bt += 1 }
    fp
  }
}

/** Codegen'd 16-bit SimHash fingerprint over a tokens array — one compiled
  * call per DOCUMENT. Replaces round 2's relational formulation
  * (explode(array_distinct(tokens)) → md5-prefix int → 16 conditional vote
  * sums → per-doc 16-way aggregation), which paid an md5 + 16 CASE
  * evaluations per (doc, token) ROW plus a full explode shuffle — measured
  * 4.8× the DuckDB twin; the oracle SQL still spells that relational form,
  * and the bit-identical hash is pinned by the gate.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_simhash16"

  override def nullSafeEval(a: Any): Any =
    SimHashUtil.fingerprint(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashUtil.fingerprint($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API surface for the vector expressions. */
/** Shared eval body for [[TopPairsWithin]]. */
object TopPairsUtil {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Spark's Round(x, 6) for doubles, exactly (BigDecimal.valueOf +
    * HALF_UP, NaN/Infinity passed through — BigDecimal.valueOf would
    * THROW on them, e.g. for a zero-norm vector's 0/0 cosine): the pair
    * ordering below must match the composed round-then-orderBy form
    * bit-for-bit, ties included. */
  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** All-pairs cosine within ONE block, top-k under (sim desc, ida, idb).
    * Arithmetic is the same sequential double fold as [[FloatDotProduct]]
    * and the same sqrt/divide tree as the join form — bitwise-identical
    * sims. */
  def topPairs(block: ArrayData, k: Int): ArrayData = {
    val total = block.numElements()
    val ids = new Array[Long](total)
    val vecs = new Array[Array[Float]](total)
    var n = 0 // entries kept: NULL embeddings are skipped, not NPE'd —
    // callers filter them out symmetrically with the oracle, this is the
    // defensive backstop (advisor r13)
    var i = 0
    while (i < total) {
      val row = block.getStruct(i, 2)
      if (!row.isNullAt(1)) {
        ids(n) = row.getLong(0)
        vecs(n) = row.getArray(1).toFloatArray()
        n += 1
      }
      i += 1
    }
    val norms = new Array[Double](n)
    i = 0
    while (i < n) {
      val v = vecs(i)
      var s = 0.0
      var d = 0
      while (d < v.length) { s += v(d).toDouble * v(d).toDouble; d += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    // bounded worst-first heap: root = the weakest kept pair.
    // sim compares via Double.compare — the TOTAL order Spark's DoubleType
    // sort uses (NaN above +Inf, NaN ties NaN), so a NaN-component vector's
    // NaN cosine ranks exactly where the join+orderBy form ranks it (first),
    // instead of the naive `>`/`==` pair under which NaN compares false
    // both ways and the comparator goes intransitive. ZERO-NORM vectors form
    // no pair at all (the class-22 guarded-cosine contract: similarity
    // against the zero vector is undefined → excluded at pair FORMATION,
    // mirrored by the oracle's `squaredNorm > 0` source filter — NOT by a
    // sim-level NULL filter, which would diverge on a zero-norm × NaN-norm
    // pair whose den = 0·NaN = NaN keeps a NaN sim ranked first. The
    // pre-guard 0/0 NaN ranked zero-norm pairs FIRST here while DuckDB's
    // /0 NULL ranked them last — a latent top-k divergence).
    case class P(ida: Long, idb: Long, sim: Double)
    def better(a: P, b: P): Boolean = { // a strictly precedes b in output order
      val c = java.lang.Double.compare(a.sim, b.sim)
      c > 0 || (c == 0 &&
        (a.ida < b.ida || (a.ida == b.ida && a.idb < b.idb)))
    }
    val heap = new java.util.PriorityQueue[P](k + 1,
      (x: P, y: P) => if (better(x, y)) 1 else if (better(y, x)) -1 else 0)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        // the join form's predicate is the STRICT ida < idb on ID VALUES:
        // two rows sharing a vec_id produce no pair there, so none here
        if (ids(i) == ids(j) || norms(i) == 0.0 || norms(j) == 0.0) { j += 1 }
        else {
        val (lo, hi) = if (ids(i) < ids(j)) (i, j) else (j, i)
        val a = vecs(lo); val b = vecs(hi)
        var s = 0.0
        var d = 0
        val len = math.min(a.length, b.length)
        while (d < len) { s += a(d).toDouble * b(d).toDouble; d += 1 }
        val p = P(ids(lo), ids(hi), round6(s / (norms(lo) * norms(hi))))
        if (heap.size < k) heap.add(p)
        else if (better(p, heap.peek())) { heap.poll(); heap.add(p) }
        j += 1
        }
      }
      i += 1
    }
    val out = new Array[P](heap.size)
    var w = heap.size - 1
    while (w >= 0) { out(w) = heap.poll(); w -= 1 } // drain worst-first
    new GenericArrayData(out.map(p =>
      InternalRow(p.ida, p.idb, p.sim): Any))
  }
}

/** Per-block exact top-k similar pairs: array<struct<id:long,
  * vec:array<float>>> → array<struct<ida,idb,sim>>, ordered (sim desc, ida,
  * idb) with sim = round(cos, 6) — EXACTLY the ordering of the label-blocked
  * self-join + round + orderBy form it replaces.
  *
  * Why: the join form materializes every candidate pair as an UnsafeRow
  * carrying BOTH 64-float embeddings (~199k pairs × 550B at sf0.1 — the
  * measured 1.1 s was row copying, not arithmetic: the dots themselves are
  * ~13M mul-adds ≈ 20 ms). Collecting each block once (10 × ~52 KB rows)
  * and looping in place does the same arithmetic with zero pair
  * materialization. EXACT by composition: every candidate pair lives in
  * exactly one block, so the global top-k under a total order is a subset
  * of the union of per-block top-k's. (An LSH/ANN candidate pre-filter —
  * r12 verdict's sketch — was REJECTED for this query: sign-bucket recall
  * < 1 cannot guarantee the hash-exact top-20 the oracle gate demands.)
  * Scale: parallelism = #blocks; at 100 TB blocks are LSH buckets / finer
  * shards (the dedup family's device), not 10 coarse labels — the fixture's
  * 200-vector blocks match that production block size. CodegenFallback:
  * ONE invocation per block (10 rows), nothing to win from codegen. */
case class TopPairsWithin(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _) // any containsNull: elements are dense
        if fs.length == 2 && fs(0).dataType == LongType &&
          fs(1).dataType.isInstanceOf[ArrayType] &&
          fs(1).dataType.asInstanceOf[ArrayType].elementType == FloatType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<long, array<float>>>, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ida", LongType, nullable = false),
    StructField("idb", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_top_pairs"
  override def nullSafeEval(a: Any): Any =
    TopPairsUtil.topPairs(a.asInstanceOf[ArrayData], k)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpr {
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normF(a: Column): Column = org.apache.spark.sql.functions.sqrt(dotF(a, a))

  def dotConst(a: Column, plane: Seq[Double]): Column =
    ColumnBridge.column(FloatDotConst(ColumnBridge.expression(a), plane))

  def shingles(toks: Column, n: Int = 3): Column =
    ColumnBridge.column(StringShingles(ColumnBridge.expression(toks), n))

  def rollingFp(toks: Column): Column =
    ColumnBridge.column(TokenRollingHash(ColumnBridge.expression(toks)))

  def simhash16(toks: Column): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(toks)))

  def tokenCounts(toks: Column): Column =
    ColumnBridge.column(TokenCounts(ColumnBridge.expression(toks)))

  def tokenStats(toks: Column): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(toks)))

  def maxPairDist2(xs: Column): Column =
    ColumnBridge.column(MaxPairDist2(ColumnBridge.expression(xs)))

  def shingleHashes(toks: Column, n: Int = 3): Column =
    ColumnBridge.column(DistinctShingleHashes(ColumnBridge.expression(toks), n))

  def topPairs(block: Column, k: Int): Column =
    ColumnBridge.column(TopPairsWithin(ColumnBridge.expression(block), k))
}

/** Shared eval body for [[TokenCounts]] — top-level object so generated code
  * can call it through the Scala static forwarder. */
object TokenCountsUtil {
  /** (word → count) pairs over the row's tokens, first-seen order (a
    * LinkedHashMap), so the output is a pure function of the token sequence.
    * Downstream consumers (explode → window/agg) are order-insensitive;
    * determinism here just keeps plans replay-stable. */
  def counts(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val m = new java.util.LinkedHashMap[org.apache.spark.unsafe.types.UTF8String, Long]()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) m.merge(t, 1L, (x, y) => x + y)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd per-document token counting: array<string> →
  * array<struct<w string, c bigint>> — the map-side pre-reduction of the
  * classic `explode → groupBy(doc, w).count()` shape. One compiled hash-map
  * pass per ROW replaces a Generate of every raw token (460 rows/doc here)
  * plus a (doc_id, w) hash-aggregate exchange: downstream relations explode
  * the already-reduced pairs (~7× fewer generated rows on this corpus) and
  * need no per-doc aggregation at all. Counts are exactly the relational
  * form's — the oracle SQL keeps spelling explode+GROUP BY, and the gate
  * pins equality.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_token_counts"

  override def nullSafeEval(a: Any): Any =
    TokenCountsUtil.counts(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenCountsUtil.counts($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval body for [[TokenStats]]. */
object TokenStatsUtil {
  def stats(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = toks.numElements()
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Long]()
    var top = 0L
    var total = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val c = m.merge(t, 1L, (x, y) => x + y)
        if (c > top) top = c
        total += 1L
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(total, top, m.size.toLong)
  }
}

/** Codegen'd per-document token statistics: array<string> →
  * struct<n_tok, top_cnt, n_distinct bigint> — everything the repetition /
  * type-token-ratio quality gates need, in one compiled pass per ROW with no
  * explode and no shuffle (the relational form pays a full Generate plus a
  * (doc, w) exchange to learn three numbers per doc). The fractions built
  * from these are single IEEE divisions of exact integers, so thresholds
  * stay cross-engine deterministic; the oracle keeps the explode+GROUP BY
  * spelling and the gate pins equality.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "graft_token_stats"

  override def nullSafeEval(a: Any): Any =
    TokenStatsUtil.stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenStatsUtil.stats($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval body for [[MaxPairDist2]]. */
object MaxPairDist2Util {
  /** max over unordered pairs of Δlat²+Δlon² — one compiled O(k²) loop.
    * Points with a null struct or a null lat/lon field are SKIPPED, matching
    * the replaced transform/array_max formulation (null arithmetic → null
    * pair distance → ignored by array_max) — without the guard a misparsed
    * track point would read as 0.0 and contribute a bogus pair. Returns
    * Double.NegativeInfinity when fewer than 2 valid points (mapped to null
    * by the expression, matching array_max over an empty pair list). */
  def maxD2(xs: ArrayData): Double = {
    val n = xs.numElements()
    var best = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val a = xs.getStruct(i, 2)
        if (!a.isNullAt(0) && !a.isNullAt(1)) {
          val alat = a.getDouble(0); val alon = a.getDouble(1)
          var j = i + 1
          while (j < n) {
            if (!xs.isNullAt(j)) {
              val b = xs.getStruct(j, 2)
              if (!b.isNullAt(0) && !b.isNullAt(1)) {
                val dlat = alat - b.getDouble(0)
                val dlon = alon - b.getDouble(1)
                val d2 = dlat * dlat + dlon * dlon
                if (d2 > best) best = d2
              }
            }
            j += 1
          }
        }
      }
      i += 1
    }
    best
  }
}

/** Codegen'd max pairwise equirectangular squared displacement over a
  * collected track (array<struct<lat double, lon double>>). Replaces the
  * nested higher-order transform/slice/flatten/array_max formulation, which
  * paid interpreted lambda dispatch per PAIR (O(track²) closure calls per
  * station) and materialized the full pair-distance array; this is one
  * compiled loop per ROW holding a running max. Same IEEE multiply-adds in
  * the same per-pair expression — max is order-insensitive, so the result is
  * bit-identical; fewer-than-2-point tracks yield null (≡ array_max([])).
  */
case class MaxPairDist2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 2 && fs.forall(_.dataType == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<double,double>>, got $t")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_max_pair_dist2"

  override def nullSafeEval(a: Any): Any = {
    val d = MaxPairDist2Util.maxD2(a.asInstanceOf[ArrayData])
    if (d == Double.NegativeInfinity) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d")
      s"""
         |final double $d = graft.functions.MaxPairDist2Util.maxD2($a);
         |if ($d == Double.NEGATIVE_INFINITY) { ${ev.isNull} = true; }
         |else { ${ev.value} = $d; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval body for [[DistinctShingleHashes]]. */
object ShingleHashUtil {
  /** Per-doc DISTINCT word-n-gram shingles, as 64-bit hashes, in one pass:
    * build each shingle string, dedupe on the STRING (a hash collision can
    * therefore only merge shingles across documents, never within one), and
    * emit XXH64(bytes, seed 42) — the same family Spark's xxhash64 uses; the
    * consumers only ever compare these hashes to each other, so the exact
    * constant does not matter, only determinism. */
  def hashes(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val out = len - n + 1
    if (out <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](out * 2)
    val res = new java.util.ArrayList[Any](out)
    var i = 0
    while (i < out) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val sh = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
      if (seen.add(sh)) {
        val b = sh.getBytes
        res.add(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            b.length, 42L))
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(res.toArray)
  }
}

/** Codegen'd fused shingle→distinct→hash: array<string> tokens → array<long>
  * of the doc's DISTINCT n-gram shingle hashes. Replaces the three-operator
  * chain `xxhash64(explode(array_distinct(graft_shingles(toks))))`, which
  * materialized the full shingle-string array, a second distinct copy, and
  * per-row hash calls — this is one compiled pass per document with a string
  * HashSet and in-loop hashing. Used by the jaccard/decontamination family,
  * whose shingle relation is regenerated per consumer by design (see
  * q_dedup_ngram_jaccard's scaladoc): cheaper regeneration compounds.
  */
case class DistinctShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  // same construction-time guard as StringShingles (r14 sweep)
  require(n >= 1, s"$prettyName shingle width n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    ShingleHashUtil.hashes(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashUtil.hashes($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
