package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The UDAF surface (SURVEY.md §2.12): a typed Aggregator computing the
  * element-wise mean of a float-vector column in one pass — the full-width
  * centroid that q_ann_ivf assembles via posexplode + per-dim avg + re-collect
  * (three operators); here it is a single partial-aggregable function.
  *
  * Buffer = (per-dim double sums, per-dim counts): PER-POSITION counts, not
  * one vector count, because the semantic contract is the oracle's
  * per-position avg — with ragged vector lengths a single count divides
  * short-vector-absent positions by too much, and a NULL element (legal in
  * parquet list<float>) must be SKIPPED at its position exactly like
  * DuckDB's avg skips NULL, not crash the Seq[Float] decoder (r14 sweep).
  * A position no value reached yields NULL (None), matching avg of an
  * empty/all-NULL position. Partial buffers combine associatively apart
  * from double-addition rounding, which sits ~1e-13 below the round(…,6)
  * the declared query applies — partition-order-safe in practice at any
  * scale.
  */
object VecMean extends Aggregator[Seq[Option[Float]], (Array[Double], Array[Long]), Seq[Option[Double]]] {

  override def zero: (Array[Double], Array[Long]) =
    (Array.empty[Double], Array.empty[Long])

  override def reduce(b: (Array[Double], Array[Long]),
      v: Seq[Option[Float]]): (Array[Double], Array[Long]) = {
    if (v == null) b
    else {
      val n = v.length
      val sums = if (b._1.length >= n) b._1 else java.util.Arrays.copyOf(b._1, n)
      val cnts = if (b._2.length >= n) b._2 else java.util.Arrays.copyOf(b._2, n)
      var i = 0
      while (i < n) {
        v(i) match {
          case Some(f) => sums(i) += f.toDouble; cnts(i) += 1
          case None => () // NULL element: skipped at its position, like avg
        }
        i += 1
      }
      (sums, cnts)
    }
  }

  override def merge(a: (Array[Double], Array[Long]),
      b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    val (small, big) = if (a._1.length <= b._1.length) (a, b) else (b, a)
    val sums = java.util.Arrays.copyOf(big._1, big._1.length)
    val cnts = java.util.Arrays.copyOf(big._2, big._2.length)
    var i = 0
    while (i < small._1.length) { sums(i) += small._1(i); cnts(i) += small._2(i); i += 1 }
    (sums, cnts)
  }

  override def finish(r: (Array[Double], Array[Long])): Seq[Option[Double]] =
    r._1.indices.map(i => if (r._2(i) == 0) None else Some(r._1(i) / r._2(i)))

  // native (array<double>, array<bigint>) buffer — the javaSerialization
  // encoder this replaces shipped every partial buffer across the exchange
  // as an ObjectOutputStream payload (r14 sweep)
  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Array[Long])]()

  override def outputEncoder: Encoder[Seq[Option[Double]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Option[Double]]]()
}

object VectorAggregates {
  import Tables.table

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_vec_centroid_full",
      "Full 64-dim per-label centroid via the typed VecMean Aggregator (UDAF surface), " +
        "output relationally (label, pos, c) for engine-portable comparison.",
      (s, dir) => {
        val mean = udaf(VecMean)
        table(s, dir, "embeddings")
          .groupBy("label")
          .agg(mean(col("embedding")).as("centroid"))
          .select(col("label"), posexplode(col("centroid")).as(Seq("pos0", "c")))
          .select(col("label"), (col("pos0") + 1).as("pos"), round(col("c"), 6).as("c"))
          .orderBy("label", "pos")
      },
      Some(
        "SELECT label, CAST(pos AS INT) AS pos, round(avg(v), 6) AS c FROM (" +
          "SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v " +
          "FROM embeddings) GROUP BY label, pos ORDER BY label, pos"))
  )
}
