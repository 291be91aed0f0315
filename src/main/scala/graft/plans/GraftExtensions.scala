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

  /** One registration: name + the class (for ExpressionInfo) + usage text
    * for the arity error + the builder over the arity-checked children.
    * (r14 sweep: nine verbatim injectFunction blocks collapsed to this.) */
  private def register(e: SparkSessionExtensions, name: String, clazz: Class[_],
      arity: Int, usage: String)(build: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity, s"$name$usage takes $arity arguments")
        build(children)
      }))

  /** The shingle width argument: an INT literal >= 1 (the expressions
    * re-assert the bound at construction; this is the friendly SQL-side
    * message — r14 sweep: an unbounded n crashed executors with a raw
    * NegativeArraySizeException). */
  private def intLiteral(name: String, ex: Expression): Int = ex match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)
        if v >= 1 => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
      sys.error(s"$name n must be >= 1, got $v")
    case other => sys.error(s"$name n must be an INT literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    register(e, "graft_dot", classOf[FloatDotProduct], 2,
      "(arrayFloat, arrayFloat)")(c => FloatDotProduct(c.head, c(1)))
    register(e, "graft_shingles", classOf[StringShingles], 2,
      "(arrayString, n)")(c =>
      StringShingles(c.head, intLiteral("graft_shingles", c(1))))
    register(e, "graft_simhash16", classOf[SimHash16], 1,
      "(arrayString)")(c => SimHash16(c.head))
    register(e, "graft_rolling_fp", classOf[TokenRollingHash], 1,
      "(arrayString)")(c => TokenRollingHash(c.head))
    register(e, "graft_token_counts", classOf[TokenCounts], 1,
      "(arrayString)")(c => TokenCounts(c.head))
    register(e, "graft_token_stats", classOf[TokenStats], 1,
      "(arrayString)")(c => TokenStats(c.head))
    register(e, "graft_max_pair_dist2", classOf[MaxPairDist2], 1,
      "(arrayStruct(lat,lon))")(c => MaxPairDist2(c.head))
    register(e, "graft_shingle_hashes", classOf[DistinctShingleHashes], 2,
      "(arrayString, n)")(c =>
      DistinctShingleHashes(c.head, intLiteral("graft_shingle_hashes", c(1))))
    register(e, "graft_packet_fields", classOf[graft.streaming.PacketFields], 1,
      "(rawLine)")(c => graft.streaming.PacketFields(c.head))
  }
}
