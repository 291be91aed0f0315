package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.LeafExecNode
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Identity-distinct stand-in for `ReusedExchangeExec`, used ONLY by the
  * bench/census plan-memoization path ([[graft.PlanHonesty]]) — never by
  * query planning (Catalyst keeps inserting the stock node; Verify and the
  * library run stock plans untouched).
  *
  * Why it must exist: `PlanHonesty.rewireReuse` retargets each cloned
  * tree's reuse references at the clone's OWN exchange instances. Doing
  * that with a fresh `ReusedExchangeExec(out, clonedExchange)` silently
  * no-ops: the cloned exchange is a STRUCTURAL clone of the stale one, so
  * the new node is `==` the node it replaces, and `TreeNode.mapChildren`'s
  * copy-on-write keeps the old child whenever `newChild fastEquals
  * oldChild` (fastEquals = `eq || ==`). The rewire therefore never reached
  * the tree, every reuse-bearing plan failed the `reuseClosed` honesty
  * gate, and all 33 such queries fell back to full per-pass re-planning
  * inside the bench timer (measured by `graft.ReuseProbe`: open=33 before
  * this class, open=0 after). A DIFFERENT class can never be `==` the
  * stock node, so the replacement survives every fastEquals check on the
  * way up.
  *
  * Execution semantics match the stock node where the bench needs them:
  * rows/batches/broadcast come straight off the target exchange instance,
  * which caches its result per-instance — two plan positions sharing one
  * instance compute the shuffle/broadcast exactly once per pass, exactly
  * like `ReusedExchangeExec`. `output` keeps the original reuse node's
  * attribute ids, so parent codegen's bindings are untouched (rows are
  * positionally identical; the ids only rename). Planner-facing niceties
  * (`outputPartitioning` attribute remapping) are deliberately NOT
  * re-implemented: the clone is executed, never re-planned (AQE off in
  * Bench), so nothing consults them after `EnsureRequirements` already
  * ran on the source plan.
  */
case class HonestReusedExchangeExec(override val output: Seq[Attribute],
                                    exchange: Exchange)
    extends LeafExecNode {
  override def supportsColumnar: Boolean = exchange.supportsColumnar
  override def vectorTypes: Option[Seq[String]] = exchange.vectorTypes
  override protected def doExecute(): RDD[InternalRow] = exchange.execute()
  override protected def doExecuteColumnar(): RDD[ColumnarBatch] =
    exchange.executeColumnar()
  override def doExecuteBroadcast[T](): Broadcast[T] =
    exchange.executeBroadcast[T]()
  override def nodeName: String = "HonestReusedExchange"
  // canonicalize exactly like the stock node: to the TARGET's canonical
  // form. Without this, an exchange that CONTAINS a rewired reuse (the
  // chained-rank shape) changes canonical form relative to its stale
  // original, and the outer reuse's byCanon lookup misses.
  override protected def doCanonicalize():
      org.apache.spark.sql.execution.SparkPlan = exchange.canonicalized
  // keep treeString from inlining the whole target subtree at every
  // reuse site (the stock node does the same via its string args)
  override def stringArgs: Iterator[Any] =
    Iterator(output, s"[reuses ${exchange.nodeName} #${exchange.id}]")
}
