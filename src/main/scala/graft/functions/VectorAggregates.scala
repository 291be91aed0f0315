package graft.functions

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The UDAF surface (SURVEY.md §2.12): a typed Aggregator computing the
  * element-wise mean of a float-vector column in one pass — the full-width
  * centroid that q_ann_ivf assembles via posexplode + per-dim avg + re-collect
  * (three operators); here it is a single partial-aggregable function.
  *
  * Buffer = (per-dim double sums, count): partial buffers combine
  * associatively apart from double-addition rounding, which sits ~1e-13
  * below the round(…,6) the declared query applies — partition-order-safe
  * in practice at any scale.
  */
object VecMean extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val sums = if (b._1.length >= v.length) b._1 else java.util.Arrays.copyOf(b._1, v.length)
      var i = 0
      while (i < v.length) { sums(i) += v(i).toDouble; i += 1 }
      (sums, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (small, big) = if (a._1.length <= b._1.length) (a._1, b._1) else (b._1, a._1)
    val sums = java.util.Arrays.copyOf(big, big.length)
    var i = 0
    while (i < small.length) { sums(i) += small(i); i += 1 }
    (sums, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.toSeq.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
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
