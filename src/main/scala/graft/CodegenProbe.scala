package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.WholeStageCodegenExec

/** Dev-only: is a query's generated whole-stage source IDENTICAL across two
  * independent plan builds (⇒ codegen-cache hit ⇒ one JIT-warm class), and
  * how big is it? Diagnoses per-pass recompile/re-JIT suspicion. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      def sources(): Seq[String] = {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        // collectWithSubqueries: a churning span inside a subquery plan
        // would otherwise print stableAcrossBuilds=true (r15 probe sweep —
        // the same node-local-collect blindness PlanSweep fixed in r14)
        plan.collectWithSubqueries {
          case w: WholeStageCodegenExec => w.doCodeGen()._2.body }
      }
      val a = sources()
      val b = sources()
      println(s"[codegen] $n spans=${a.size} sizes=${a.map(_.length).mkString(",")} " +
        s"stableAcrossBuilds=${a == b}")
    }
    spark.stop()
  }
}
