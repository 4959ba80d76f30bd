package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Plan audit over the whole query bank — the "would this survive 100×?"
  * check (SURVEY §6), runnable per round:
  *
  *   sbt "runMain graft.PlanAudit [sfDir]"
  *
  * For every SparkEntry query it reports shuffle count, join strategies,
  * parquet scans without pushed filters where a filter exists upstream, and
  * operators outside whole-stage codegen. The numbers change with AQE at
  * real scale; the point is catching structural regressions (a dim join
  * degrading to sort-merge, a filter not reaching the scan, a fallback
  * expression landing in a per-row hot path).
  */
object PlanAudit {

  final case class Audit(
      shuffles: Int,
      broadcastJoins: Int,
      sortMergeJoins: Int,
      scans: Int,
      scansWithPushdown: Int,
      fallbackExprs: Seq[String],
      // rank-limit pushdown (InferWindowGroupLimit): the physical node that
      // keeps `row_number().over(...) <= k` at O(k) state per group instead
      // of buffering/sorting whole groups — the scale premise of the whole
      // topk-per-group family, pinned so a Spark upgrade or conf flip that
      // stops it firing fails a spec instead of silently reintroducing
      // fact-sized per-group sorts
      windowGroupLimits: Int = 0,
      // the two quadratic join executors (r16): a BroadcastNestedLoopJoin
      // is O(|left|·|right|) compute (acceptable ONLY when one side is
      // bounded metadata — a sketch-cell frame, a ≤10-row dim); a
      // CartesianProduct additionally shuffles the full product. The
      // whole-bank sweep asserts both are zero outside an explicit,
      // justified whitelist.
      nestedLoopJoins: Int = 0,
      cartesianJoins: Int = 0
  )

  def audit(plan: SparkPlan): Audit = {
    val nodes = collectAll(plan)
    val scans = nodes.filter(_.nodeName.toLowerCase.contains("scan"))
    def pushed(p: SparkPlan): Boolean = {
      val s = p.toString
      s.contains("PushedFilters: [") && !s.contains("PushedFilters: []")
    }
    Audit(
      shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike]),
      broadcastJoins = nodes.count(_.isInstanceOf[BroadcastHashJoinExec]),
      sortMergeJoins = nodes.count(_.isInstanceOf[SortMergeJoinExec]),
      scans = scans.size,
      scansWithPushdown = scans.count(pushed),
      fallbackExprs = nodes
        .flatMap(_.expressions)
        .flatMap(_.collect {
          // Imperative AGGREGATES (TypedImperativeAggregate) carry the
          // CodegenFallback marker but never run through interpreted
          // per-row eval — the aggregate exec calls update() directly on a
          // typed buffer. Only non-aggregate fallbacks poison a hot path.
          case e: CodegenFallback
              if !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions
                .aggregate.ImperativeAggregate] => e.prettyName
        })
        .distinct,
      windowGroupLimits = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec]),
      nestedLoopJoins = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      cartesianJoins = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])
    )
  }

  /** All nodes, descending into AQE wrappers and materialized query stages
    * (both hide their subtree from the plain `children` walk).
    */
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
    case q: QueryStageExec        => q +: collectAll(q.plan)
    case other =>
      other +: (other.children.flatMap(collectAll) ++
        other.subqueries.flatMap(collectAll))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    println(f"${"query"}%-22s shuf  bcast  smj  scans  pushed  codegen-fallback-exprs")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.count() // materialize AQE final plan
        val a = audit(df.queryExecution.executedPlan)
        println(f"$name%-22s ${a.shuffles}%4d  ${a.broadcastJoins}%5d  ${a.sortMergeJoins}%3d  " +
          f"${a.scans}%5d  ${a.scansWithPushdown}%6d  ${a.fallbackExprs.mkString(",")}")
      } catch {
        case e: Throwable => println(f"$name%-22s AUDIT FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
