package graft

import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Tree-walk plan-shape counter (verdict r14 item 5). The previous
  * string-derived counts (`indexOf("Exchange")` over `plan.toString`)
  * inflated on persisted subtrees: an `InMemoryRelation` PRINTS its
  * whole cached plan — q_tfidf_sim's probe row read 622 "broadcasts"
  * that were one cached frame's plan text repeated per reference — and
  * `"Exchange"` matched Broadcast/Reused exchanges indiscriminately.
  * Walking the actual operator tree gives exact, non-inflating counts:
  *
  *  - `AdaptiveSparkPlanExec` unwraps to its CURRENT plan (the final
  *    adaptive plan after execution — callers execute first);
  *  - `QueryStageExec` unwraps to the materialized stage plan, so AQE
  *    stage boundaries don't hide the exchanges they wrap;
  *  - `ReusedExchangeExec` counts as a REUSE, never a new exchange
  *    (reuse is the optimization the count should credit);
  *  - `InMemoryTableScanExec` is a LEAF: the cached plan below it ran
  *    once at materialization and is not part of this query's
  *    execution, so nothing under it is counted;
  *  - subquery plans (scalar subqueries, DPP filters) are walked too —
  *    they execute as part of the query.
  */
object PlanWalk {

  final case class Counts(
      shuffleExchanges: Int,
      broadcastExchanges: Int,
      reusedExchanges: Int,
      broadcastHashJoins: Int,
      broadcastNestedLoopJoins: Int,
      sortMergeJoins: Int,
      shuffledHashJoins: Int,
      cartesianProducts: Int,
      codegenSpans: Int)

  def count(root: SparkPlan): Counts = {
    var sx, bx, rx, bhj, bnlj, smj, shj, cp, wsc = 0
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = {
      if (!seen.add(p)) return
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _: ReusedExchangeExec => rx += 1
        case _: InMemoryTableScanExec => ()
        case n =>
          n match {
            case _: ShuffleExchangeLike => sx += 1
            case _: BroadcastExchangeLike => bx += 1
            case _: BroadcastHashJoinExec => bhj += 1
            case _: BroadcastNestedLoopJoinExec => bnlj += 1
            case _: SortMergeJoinExec => smj += 1
            case _: ShuffledHashJoinExec => shj += 1
            case _: CartesianProductExec => cp += 1
            case _: WholeStageCodegenExec => wsc += 1
            case _ => ()
          }
          n.children.foreach(walk)
          n.subqueries.foreach(walk)
      }
    }
    walk(root)
    Counts(sx, bx, rx, bhj, bnlj, smj, shj, cp, wsc)
  }
}
