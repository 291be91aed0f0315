package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking — the cluster answer to the one deliberately
  * single-partition operator in the contract (q_win_rownum_dense's bare
  * `dense_rank() OVER (ORDER BY …)`, see Windows.scala scaladoc and
  * docs/SCALE.md).
  *
  * A global window moves EVERY row to one partition. But a global DENSE rank
  * is a function of the row's key VALUE alone, so it factors into:
  *
  *   1. distinct keys            — shuffle shrinks to key cardinality
  *   2. rank each distinct key   — window over the (small) key relation
  *   3. broadcast-join ranks back — map-side, no fact shuffle at all
  *
  * The fact table is never globally sorted and never leaves its partitions.
  * Stage 2 is itself a window, but over |distinct keys| rows — for ranking
  * dimensions like priority/status/grade (the common use) that is dozens of
  * rows regardless of fact size; for high-cardinality keys swap stage 3's
  * broadcast for a shuffle join and stage 2 stays bounded by the key count,
  * not the row count.
  *
  * Equivalence to `dense_rank() OVER (ORDER BY key)` is pinned in
  * WindowsTimeSeriesSpec for both dense and ordinary rank (rank needs the
  * per-key multiplicities — a running sum over counts — also computed on the
  * distinct relation).
  */
object GlobalRank {

  /** The (distinct key `__k` → dense rank `out`) relation alone — for callers
    * that join it at a different point in their plan (e.g. after a row_number
    * filter) while the rank DOMAIN stays the full input. Joining ranks derived
    * from a filtered subset would renumber whenever a key value vanished from
    * it — always build the ranks from the unfiltered relation. */
  def denseRanks(df: DataFrame, key: Column, out: String): DataFrame = {
    require(out != "__k", "output name collides with the internal key column")
    df.select(key.as("__k")).distinct()
      .withColumn(out, dense_rank().over(Window.orderBy(col("__k"))))
  }

  /** dense_rank() OVER (ORDER BY key) without a global shuffle of `df`.
    * Null-safe join (<=>): the window form ranks null keys (first), so the
    * rewrite must not drop them — plain === would. */
  def denseRank(df: DataFrame, key: Column, out: String): DataFrame = {
    // a pre-existing `out` column would survive the join and make every
    // later col(out) AMBIGUOUS_REFERENCE (same hazard the totalOut guard
    // below covers; r13 review found it guarded only half-way)
    require(!df.columns.contains(out) && !df.columns.contains("__k"),
      s"input already has a column named '$out' or '__k'")
    df.join(broadcast(denseRanks(df, key, out)), key <=> col("__k")).drop("__k")
  }

  /** row_number() OVER (ORDER BY sortCols…) over a near-unique key WITHOUT a
    * single-partition window — decomposed through a caller-supplied MONOTONE
    * banding of the sort order (`band` must be non-decreasing along the sort
    * direction, e.g. `floor(-score * 1024)` for a `score DESC` order):
    * per-band local row_numbers in a PARTITIONED window, band counts + an
    * exclusive-offset fold over the tiny band-grain relation, broadcast
    * back. Fully declarative — no range-partitioner sampling, no driver
    * fetch, no checkpoint — so the plan stays lazy, the result is identical
    * at any partitioning (integer arithmetic only), and the fact relation
    * moves through exactly ONE hash exchange. The q_hist_equidepth
    * materialize-and-count device solves the same problem when no natural
    * banding of the key exists; banding wins when one does, which for score
    * ranks (a monotone float bucketization) is always.
    *
    * Band-size skew follows the value distribution — pick the band width so
    * the densest band stays executor-sized (the densest SCORE bucket, not
    * the corpus, bounds a partition). */
  /** PRECONDITION: `sortCols` must fully tie-break (end in a unique key) —
    * every call site's determinism already requires this; here it also
    * licenses the inert trailing sort keys below.
    *
    * One-materialization plan shape: the explicit repartition on the band
    * is the SHARED exchange both branches consume (ReuseExchange). Without
    * it the offsets aggregation is a second full computation of `df` — for
    * rank inputs that are themselves expensive (a corpus-wide dot-product
    * scan, a fact-table aggregate) that recompute, not the banding
    * arithmetic, dominates. Exchange reuse demands CANONICALLY IDENTICAL
    * subtrees, which column pruning breaks unless both branches reference
    * the same columns; three devices below pin that down:
    *
    *  1. the offsets branch rides THROUGH the window (per-band count =
    *     max of the local row_number) instead of aggregating the
    *     pre-window relation, so it cannot prune the window away;
    *  2. every orderable payload column is appended as an INERT trailing
    *     sort key — order is already fully decided by `sortCols`, so they
    *     change nothing, but they make both branches' window subtrees
    *     reference every column (identical pruning);
    *  3. the offsets join is null-safe (<=>) — besides null-band
    *     correctness (a null band must form its own band, not drop), a
    *     plain === would let the optimizer infer an IsNotNull filter into
    *     one branch's copy of the exchange subtree only.
    */
  /** When `totalOut` is non-null every output row also carries the GLOBAL
    * row count under that name — the total is the sum of the per-band
    * counts the offsets fold already computes, one more window expression
    * over the tiny band-grain relation riding the same broadcast. Callers
    * that need `n` for a bucket formula (equi-depth histograms, exact
    * ntile quantiles) get it WITHOUT a second scan of the input or a
    * separate count+crossJoin broadcast — at any scale that second scan
    * is a full pass over the fact table.
    *
    * NULL BANDS order FIRST (the offsets fold runs __band ASC NULLS
    * FIRST) — correct when the null rows sort first under `sortCols`,
    * i.e. an ASC sort on the nullable key itself. For a DESC sort Spark
    * orders nulls LAST, so a caller ranking a nullable metric descending
    * must band nulls explicitly to the end (the same caller-owns-
    * placement rule as the NaN note below); every current caller either
    * ranks non-null aggregates or guards explicitly. */
  def rowNumberBanded(df: DataFrame, band: Column, sortCols: Seq[Column],
      out: String, totalOut: String = null): DataFrame = {
    val internal = Seq("__band", "__rn", "__n", "__off", "__band2")
    require(!df.columns.contains(out) &&
      internal.forall(c => !df.columns.contains(c)),
      s"input already has '$out' or an internal __band/__rn/__n/__off column" +
        " — rowNumberBanded would silently overwrite it")
    // out/totalOut must also avoid the INTERNAL names (r14 sweep): out =
    // "__rn" would pass the input-side guards, then the final
    // drop(__band,__band2,__off,__rn) deletes the just-computed rank column
    require(!internal.contains(out),
      s"output name '$out' collides with an internal column")
    require(totalOut == null ||
      (!df.columns.contains(totalOut) && !internal.contains(totalOut) &&
        totalOut != out),
      s"totalOut '$totalOut' collides with an input, internal, or output column")
    val b = df.withColumn("__band", band).repartition(col("__band"))
    val inert = df.schema.fields
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
      .map(f => col(f.name).asc)
    val wL = Window.partitionBy("__band").orderBy(sortCols ++ inert: _*)
    val wB = Window.orderBy("__band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val win = b.withColumn("__rn", row_number().over(wL))
    val counts = win.groupBy("__band").agg(max(col("__rn")).as("__n"))
      .withColumn("__off", sum(col("__n")).over(wB) - col("__n"))
    val offs =
      if (totalOut == null) counts.select(col("__band").as("__band2"), col("__off"))
      else counts
        .withColumn(totalOut, sum(col("__n")).over(
          Window.orderBy("__band").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("__band").as("__band2"), col("__off"), col(totalOut))
    // NOTE the band expression owns NaN placement: floor(-NaN·K) CASTS TO
    // 0, landing NaN mid-order — a caller whose scores can be NaN must
    // guard explicitly; [[nanGuardedDescBand]] is the canonical guard.
    win.join(broadcast(offs), col("__band") <=> col("__band2"))
      .withColumn(out, col("__off") + col("__rn"))
      .drop("__band", "__band2", "__off", "__rn")
  }

  /** rank() OVER (ORDER BY key) — like [[denseRank]] plus per-key counts:
    * rank(v) = 1 + Σ count(k < v), a running sum over the distinct relation. */
  def rank(df: DataFrame, key: Column, out: String): DataFrame = {
    // same guards as denseRank/rowNumberBanded (r14 sweep: this sibling was
    // missed in the r13 hardening): out = "__k" would overwrite the grouped
    // key and join rank values against rank numbers (silently near-empty
    // output); out = "__n" would collide with the count column; a
    // pre-existing out/__k makes every later col(out) AMBIGUOUS_REFERENCE
    require(out != "__k" && out != "__n" &&
      !df.columns.contains(out) && !df.columns.contains("__k"),
      s"output name '$out' collides with an input column or an internal" +
        " __k/__n column")
    val w = Window.orderBy(col("__k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = df.groupBy(key.as("__k")).agg(count(lit(1)).as("__n"))
      .withColumn(out, (sum(col("__n")).over(w) - col("__n") + 1).cast("int"))
      .drop("__n")
    df.join(broadcast(ranks), key <=> col("__k")).drop("__k")
  }

  /** Band expression for a SCORE-DESCENDING banded rank whose score can be
    * NaN or NULL: NaN sorts FIRST under DESC (Spark double total order), so
    * it must band to Long.MinValue — the naive floor(-NaN·K) casts to 0 and
    * lands NaN mid-order, silently corrupting every rank below it. NULL
    * sorts LAST under Spark's default desc (and under DuckDB's desc — the
    * cross-engine agreement the class-22 guarded-cosine devices rely on),
    * so it bands to Long.MaxValue — an unguarded NULL would band to NULL,
    * and the band-offset window (ascending band order, NULLs FIRST) would
    * silently rank every degenerate row ahead of all real scores. Callers'
    * scores are cosines/normalized dots (|score| ≤ ~1, bands within ±k),
    * nowhere near the sentinel bands. The canonical guard for
    * rowNumberBanded callers (q_vec_rrf and q_vec_mips each hand-rolled it
    * before — r13 review). */
  def nanGuardedDescBand(score: Column, k: Int): Column =
    when(isnan(score), lit(Long.MinValue))
      .when(score.isNull, lit(Long.MaxValue))
      .otherwise(floor(-score * k).cast("long"))
}
