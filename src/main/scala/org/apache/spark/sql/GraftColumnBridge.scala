package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters (Spark 4
  * moved Column onto ColumnNode; classic.ExpressionUtils is the supported
  * internal path). Lets graft wrap its native Catalyst expressions as
  * Columns without routing through the session function registry — the
  * derive() projections must not depend on registration order.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Forces Janino compilation of every whole-stage-codegen region in a
  * plan — including the build plans of cached relations and the current
  * plan of AQE nodes — and THROWS on any failure.
  *
  * Why: at execution time a failed whole-stage compile only logs and
  * falls back to interpreted evaluation. That silent fallback cost the
  * derive() projection ~10× (five ~50-regex-node phonetic chains blew
  * Janino's 64 KB method limit) and no test noticed. CodegenCompileSpec
  * walks the heavy query plans through this so a regression fails loudly.
  */
object GraftCodegenCheck {
  import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
  import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}

  /** Compiles all codegen stages reachable from `df`'s executed plan;
    * returns how many compiled. Throws on the first failure.
    *
    * The frame is EXECUTED first: under AQE, CollapseCodegenStages runs
    * per query stage at materialization time, so an unexecuted adaptive
    * plan contains no WholeStageCodegenExec nodes to check.
    */
  def compileAllStages(df: DataFrame): Int = {
    // Execute THIS queryExecution (df.count() would plan a separate one,
    // leaving this plan's adaptive stages unmaterialized).
    df.queryExecution.toRdd.count()
    var n = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case w: WholeStageCodegenExec =>
          val (_, code) = w.doCodeGen()
          CodeGenerator.compile(code)
          n += 1
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: InMemoryTableScanExec => walk(s.relation.cachedPlan)
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }
}
