package graft.functions

import graft.{Exact, GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over the embedding column
  * (SURVEY.md §2.11 stretch set). q_vec_knn is the brute-force baseline;
  * these are the scale paths:
  *
  *  - IVF (inverted-file): partition vectors into cells (here: the label
  *    column as the coarse quantizer — at 100 TB the cells come from a
  *    k-means fit), store full per-cell centroids, route a query to its
  *    nearest centroid, search only that cell. Search cost drops from O(n)
  *    to O(n / cells); the centroid table is tiny and broadcast.
  *
  *  - Random-hyperplane LSH: 8 fixed hyperplanes → 8 sign bits → 256
  *    buckets; queries probe only their bucket (cosine-preserving hashing).
  *    Bucketing is a map-side pass; the bucket join is an equi-join — both
  *    shapes shuffle-friendly at any scale.
  *
  * Both are oracle-checked in DuckDB: the hyperplane constants are generated
  * once (seeded) and embedded into BOTH the Spark plan and the oracle SQL, so
  * there is a single source of truth.
  *
  * Determinism: centroids are double averages cast per-element to FLOAT
  * (absorbing partition-order noise far below float precision), after which
  * all cosine math is the exact double-product/sequential-fold discipline of
  * [[graft.Exact]].
  */
object Similarity {
  import Tables.table

  private val Dims = 64
  private val NumPlanes = 8

  /** Fixed hyperplanes, seeded — rounded to 6 decimals so the SQL literal and
    * the Scala double are the same IEEE value on both engines. */
  private[graft] val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Seq.fill(Dims)(math.rint(rnd.nextGaussian() * 1e6) / 1e6))
  }

  private def planeSql(p: Seq[Double]) = p.mkString("[", ", ", "]")

  /** dot(float[], const double[]) — codegen'd FloatDotConst: the hyperplane
    * is a referenced constant array, not a per-row literal construction. */
  private def dotPlane(v: org.apache.spark.sql.Column, p: Seq[Double]) =
    VectorExpr.dotConst(v, p)

  private def dotPlaneSql(v: String, p: Seq[Double]) =
    s"list_sum(list_transform(list_zip($v, ${planeSql(p)}), z -> CAST(z[1] AS DOUBLE) * z[2]))"

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_ann_ivf",
      "IVF ANN: per-cell full 64-dim centroids (one aggregation of 64 per-dim avgs, " +
        "cast to float), query routed to its nearest centroid, exact top-10 within that " +
        "cell only.",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        // fused centroid build: 64 avg aggregates in ONE groupBy(label) pass
        // (no posexplode row inflation, one exchange of cells × 64 doubles);
        // same IEEE doubles, order noise absorbed by the float cast
        val cent = e
          .groupBy("label")
          .agg(array((0 until Dims).map(i =>
            avg(col("embedding")(i)).cast("float")): _*).as("centroid"))
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"), Exact.norm(col("embedding")).as("qn"))
        val cell = cent.crossJoin(broadcast(q))
          .select(col("label"),
            (Exact.dot(col("centroid"), col("qv")) /
              (Exact.norm(col("centroid")) * col("qn"))).as("csim"))
          .orderBy(col("csim").desc, col("label"))
          .limit(1)
          .select(col("label").as("cell"))
        e.filter(col("vec_id") =!= 0)
          .join(broadcast(cell), col("label") === col("cell"))
          .crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(Exact.dot(col("embedding"), col("qv")) /
              (Exact.norm(col("embedding")) * col("qn")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10)
      },
      Some(
        s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
           |exp AS (SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v FROM e),
           |avgs AS (SELECT label, pos, avg(v) AS c FROM exp GROUP BY label, pos),
           |cent AS (SELECT label, list_transform(list(c ORDER BY pos), x -> CAST(x AS FLOAT)) AS centroid
           |         FROM avgs GROUP BY label),
           |q AS (SELECT embedding AS qv, sqrt(${Exact.squaredNormSql("embedding")}) AS qn
           |      FROM e WHERE vec_id = 0),
           |cell AS (SELECT label FROM cent, q
           |  ORDER BY ${Exact.dotSql("centroid", "qv")} / (sqrt(${Exact.squaredNormSql("centroid")}) * qn) DESC, label
           |  LIMIT 1)
           |SELECT e.vec_id, round(${Exact.dotSql("e.embedding", "q.qv")} /
           |    (sqrt(${Exact.squaredNormSql("e.embedding")}) * q.qn), 6) AS sim
           |FROM e, q, cell WHERE e.label = cell.label AND e.vec_id <> 0
           |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin)),

    GraftQuery(
      "q_ann_ivf_multiprobe",
      "IVF ANN with multi-probe (nprobe=2): route the query to its TWO nearest " +
        "centroids and search the union of those cells — the standard recall " +
        "knob when the true neighbor sits just across a cell boundary. Cost is " +
        "O(nprobe · n / cells); the probed-cell set is tiny and broadcast, so " +
        "the plan shape is identical to single-probe.",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val cent = e
          .groupBy("label")
          .agg(array((0 until Dims).map(i =>
            avg(col("embedding")(i)).cast("float")): _*).as("centroid"))
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"), Exact.norm(col("embedding")).as("qn"))
        val cells = cent.crossJoin(broadcast(q))
          .select(col("label"),
            (Exact.dot(col("centroid"), col("qv")) /
              (Exact.norm(col("centroid")) * col("qn"))).as("csim"))
          .orderBy(col("csim").desc, col("label"))
          .limit(2)
          .select(col("label").as("cell"))
        e.filter(col("vec_id") =!= 0)
          .join(broadcast(cells), col("label") === col("cell"))
          .crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(Exact.dot(col("embedding"), col("qv")) /
              (Exact.norm(col("embedding")) * col("qn")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10)
      },
      Some(
        s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
           |exp AS (SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v FROM e),
           |avgs AS (SELECT label, pos, avg(v) AS c FROM exp GROUP BY label, pos),
           |cent AS (SELECT label, list_transform(list(c ORDER BY pos), x -> CAST(x AS FLOAT)) AS centroid
           |         FROM avgs GROUP BY label),
           |q AS (SELECT embedding AS qv, sqrt(${Exact.squaredNormSql("embedding")}) AS qn
           |      FROM e WHERE vec_id = 0),
           |cell AS (SELECT label FROM cent, q
           |  ORDER BY ${Exact.dotSql("centroid", "qv")} / (sqrt(${Exact.squaredNormSql("centroid")}) * qn) DESC, label
           |  LIMIT 2)
           |SELECT e.vec_id, round(${Exact.dotSql("e.embedding", "q.qv")} /
           |    (sqrt(${Exact.squaredNormSql("e.embedding")}) * q.qn), 6) AS sim
           |FROM e, q WHERE e.label IN (SELECT label FROM cell) AND e.vec_id <> 0
           |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin)),

    GraftQuery(
      "q_ann_ivf_kmeans",
      "IVF ANN with a REAL trained coarse quantizer: seeded fixed-iteration " +
        "Lloyd's k-means (K=8, init = embeddings of vec_id 1..8, 2 unrolled " +
        "iterations), then route the query to its nearest trained centroid and " +
        "search that cell only. Every step is deterministic and oracle-expressible: " +
        "assignment is a (dist, cid) argmin — min(struct) here, the equivalent " +
        "row_number spelling in the oracle; double distance math is the identical " +
        "IEEE expression on both engines — centroid updates are per-dim double " +
        "averages cast to FLOAT (absorbing partition-order noise), and the " +
        "iteration count is pinned. Scale shape: the embedding table never " +
        "crosses an exchange — distances are map-side behind the broadcast " +
        "centroids, the argmin reduces slim (vec_id, dist, cid) rows, and the " +
        "assignment broadcasts back; updates are ONE fused aggregation of 64 " +
        "per-dim avgs with map-side partials.",
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        val K = 8
        val e = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        def dist(v: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
          Exact.dot(v, v) + Exact.dot(c, c) - lit(2.0) * Exact.dot(v, c)
        // nearest-centroid assignment, embeddings never shuffled: distances
        // are computed map-side after broadcasting the K centroids, the argmin
        // reduces SLIM (vec_id, dist, cid) rows — min(struct(dist, cid)) is
        // the same lexicographic (dist, cid) tie-break a row_number window
        // gives, without dragging the 64-dim arrays through an exchange —
        // and the tiny assignment broadcasts back onto the embedding scan.
        // (At corpus scales where the assignment outgrows a broadcast, that
        // last join becomes a vec_id-keyed shuffle join; the embedding table
        // still crosses no exchange for the distance math itself.)
        def assign(cent: DataFrame): DataFrame =
          e.join(broadcast(cent))
            .select(col("vec_id"),
              dist(col("embedding"), col("centroid")).as("dist"), col("cid"))
            .groupBy("vec_id")
            .agg(min(struct(col("dist"), col("cid"))).as("m"))
            .select(col("vec_id").as("aid"), col("m.cid").as("cid"))
        def withCells(asg: DataFrame): DataFrame =
          e.join(broadcast(asg), col("vec_id") === col("aid")).drop("aid")
        // Lloyd update: per-dim double avg over the cell, cast per-element to
        // FLOAT. Fused to ONE aggregation — 64 avg aggregates keyed by cid —
        // instead of the earlier posexplode → groupBy(cid,pos) → groupBy(cid)
        // chain: no 64× row inflation, one exchange (8 cids × 64 doubles)
        // instead of two, and the per-stage latency of an iterative fit is
        // what dominates this query (each Lloyd round is a scheduling
        // barrier). Same IEEE value: avg of the same doubles, order noise
        // absorbed by the float cast exactly as before.
        def update(assigned: DataFrame): DataFrame = assigned
          .groupBy("cid")
          .agg(array((0 until Dims).map(i =>
            avg(col("embedding")(i)).cast("float")): _*).as("centroid"))
        val c0 = e.filter(col("vec_id").between(1, K))
          .select(col("vec_id").cast("int").as("cid"), col("embedding").as("centroid"))
        val c2 = update(withCells(assign(update(withCells(assign(c0))))))
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"), Exact.norm(col("embedding")).as("qn"))
        val qCell = c2.crossJoin(broadcast(q))
          .select(col("cid"), dist(col("qv"), col("centroid")).as("dist"))
          .orderBy(col("dist"), col("cid"))
          .limit(1)
          .select(col("cid").as("qcell"))
        withCells(assign(c2)).filter(col("vec_id") =!= 0)
          .join(broadcast(qCell), col("cid") === col("qcell"))
          .crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(Exact.dot(col("embedding"), col("qv")) /
              (Exact.norm(col("embedding")) * col("qn")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10)
      },
      Some {
        val K = 8
        def distSql(v: String, c: String) =
          s"(${Exact.squaredNormSql(v)} + ${Exact.squaredNormSql(c)} - 2.0*${Exact.dotSql(v, c)})"
        def assignSql(cent: String, out: String) =
          s"""$out AS (SELECT vec_id, embedding, cid FROM (
             |  SELECT e.vec_id, e.embedding, c.cid,
             |    row_number() OVER (PARTITION BY e.vec_id
             |      ORDER BY ${distSql("e.embedding", "c.centroid")}, c.cid) AS rn
             |  FROM e CROSS JOIN $cent c) WHERE rn = 1)""".stripMargin
        def updateSql(assigned: String, out: String) =
          s"""${out}_exp AS (SELECT cid, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
             |  FROM $assigned),
             |${out}_avg AS (SELECT cid, pos, avg(v) AS c FROM ${out}_exp GROUP BY cid, pos),
             |$out AS (SELECT cid, list_transform(list(c ORDER BY pos), x -> CAST(x AS FLOAT)) AS centroid
             |  FROM ${out}_avg GROUP BY cid)""".stripMargin
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
           |c0 AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS centroid FROM e
           |  WHERE vec_id BETWEEN 1 AND $K),
           |${assignSql("c0", "a1")},
           |${updateSql("a1", "c1")},
           |${assignSql("c1", "a2")},
           |${updateSql("a2", "c2")},
           |${assignSql("c2", "a3")},
           |q AS (SELECT embedding AS qv, sqrt(${Exact.squaredNormSql("embedding")}) AS qn
           |  FROM e WHERE vec_id = 0),
           |qcell AS (SELECT cid FROM c2, q ORDER BY ${distSql("qv", "centroid")}, cid LIMIT 1)
           |SELECT a3.vec_id, round(${Exact.dotSql("a3.embedding", "q.qv")} /
           |    (sqrt(${Exact.squaredNormSql("a3.embedding")}) * q.qn), 6) AS sim
           |FROM a3, q, qcell WHERE a3.cid = qcell.cid AND a3.vec_id <> 0
           |ORDER BY sim DESC, a3.vec_id LIMIT 10""".stripMargin
      }),

    GraftQuery(
      "q_ann_lsh",
      s"Random-hyperplane LSH ANN: $NumPlanes fixed seeded hyperplanes → sign-bit bucket; " +
        "top-10 cosine within the query's bucket. Hyperplane constants are shared " +
        "verbatim between the Spark plan and the oracle SQL.",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val bucketCol = planes.zipWithIndex
          .map { case (p, k) => when(dotPlane(col("embedding"), p) > 0, 1 << k).otherwise(0) }
          .reduce(_ + _)
        val bucketed = e.select(col("vec_id"), col("embedding"),
          Exact.norm(col("embedding")).as("nrm"), bucketCol.as("bucket"))
        val q = bucketed.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"), col("nrm").as("qn"), col("bucket").as("qb"))
        bucketed.filter(col("vec_id") =!= 0)
          .join(broadcast(q), col("bucket") === col("qb"))
          .select(col("vec_id"),
            round(Exact.dot(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10)
      },
      Some {
        val bucketSql = planes.zipWithIndex
          .map { case (p, k) => s"CASE WHEN ${dotPlaneSql("embedding", p)} > 0 THEN ${1 << k} ELSE 0 END" }
          .mkString(" + ")
        s"""WITH b AS (SELECT vec_id, embedding,
           |  sqrt(${Exact.squaredNormSql("embedding")}) AS nrm,
           |  $bucketSql AS bucket FROM embeddings),
           |q AS (SELECT embedding AS qv, nrm AS qn, bucket AS qb FROM b WHERE vec_id = 0)
           |SELECT b.vec_id, round(${Exact.dotSql("b.embedding", "q.qv")} / (b.nrm * q.qn), 6) AS sim
           |FROM b, q WHERE b.bucket = q.qb AND b.vec_id <> 0
           |ORDER BY sim DESC, b.vec_id LIMIT 10""".stripMargin
      })
  )
}
