package graft

import org.apache.spark.sql.functions._

/** Fixed-point PageRank invariants (operators/Graph.scala) beyond the oracle
  * gate: ranking shape, the teleport floor, and bit-exact determinism
  * (the operator's whole reason to use integer arithmetic). */
class GraphSpec extends SparkSuite {

  test("pagerank: top-20 suppliers, descending, above the teleport floor") {
    val rows = run("q_graph_pagerank").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val prs = rows.map(_.getAs[Long]("pr")).toSeq
    assert(prs == prs.sorted.reverse)
    // every node keeps at least the damping teleport mass
    assert(prs.forall(_ >= 150000000L))
    rows.foreach { r =>
      val k = r.getAs[Long]("supp_key")
      assert(k >= 0 && k < 10000)
    }
  }

  test("pagerank: bit-exact across reruns (integer arithmetic, no float reduction order)") {
    val a = run("q_graph_pagerank").collect().toSeq
    val b = run("q_graph_pagerank").collect().toSeq
    assert(a == b)
  }

  test("pagerank: supplier ranks dominated by high-degree suppliers on the fixture") {
    // the undirected order graph concentrates rank on suppliers touched by
    // many customers: the top supplier's rank must exceed the uniform start
    val rows = run("q_graph_pagerank").collect()
    assert(rows.head.getAs[Long]("pr") > 1000000000L)
  }
}
