package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DistinctShingleHashes, FloatDotProduct, MaxPairDist2,
  SimHash16, StringShingles, TokenCounts, TokenRollingHash, TokenStats}

/** SparkSessionExtensions entry point (SURVEY.md §4): registers the engine's
  * custom Catalyst expressions as SQL functions so `spark.sql("SELECT
  * graft_dot(a, b) ...")` works, not only the Column API.
  *
  * Activate with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic, or
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * The engine deliberately injects no optimizer rules or planner strategies:
  * every SURVEY §2 operator plans to the physical shape we want with stock
  * Catalyst (verified by PlanShapeSpec) — custom rules would be scaffolding
  * with nothing to fix.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(arrayFloat, arrayFloat) takes 2 arguments")
        FloatDotProduct(children.head, children(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[StringShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_shingles(arrayString, n) takes 2 arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => sys.error(s"graft_shingles n must be an INT literal, got $other")
        }
        StringShingles(children.head, n)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_simhash16(arrayString) takes 1 argument")
        SimHash16(children.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_rolling_fp"),
      new ExpressionInfo(classOf[TokenRollingHash].getName, "graft_rolling_fp"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_rolling_fp(arrayString) takes 1 argument")
        TokenRollingHash(children.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "graft_token_counts"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_token_counts(arrayString) takes 1 argument")
        TokenCounts(children.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "graft_token_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_token_stats(arrayString) takes 1 argument")
        TokenStats(children.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_max_pair_dist2"),
      new ExpressionInfo(classOf[MaxPairDist2].getName, "graft_max_pair_dist2"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_max_pair_dist2(arrayStruct(lat,lon)) takes 1 argument")
        MaxPairDist2(children.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[DistinctShingleHashes].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_shingle_hashes(arrayString, n) takes 2 arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => sys.error(s"graft_shingle_hashes n must be an INT literal, got $other")
        }
        DistinctShingleHashes(children.head, n)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_packet_fields"),
      new ExpressionInfo(classOf[graft.streaming.PacketFields].getName, "graft_packet_fields"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_packet_fields(rawLine) takes 1 argument")
        graft.streaming.PacketFields(children.head)
      }))
  }
}
