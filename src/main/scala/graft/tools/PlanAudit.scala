package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Pre-flight plan lint: walk a query's physical plan for the shapes that
  * work on a laptop and die on a cluster — the checks PlanSpec pins for
  * the built-in queries, packaged so USER pipelines can be audited before
  * a 100 TB run ("would this plan survive a 100× scale-up?").
  *
  * Rules:
  *   - `cartesian_product`      — CartesianProductExec: |A|·|B| rows.
  *   - `nested_loop_join`       — BroadcastNestedLoopJoinExec: every probe
  *                                row scans the whole broadcast side; fine
  *                                for tiny broadcasts, fatal mid-plan.
  *                                A build side that is a SCALAR (ungrouped)
  *                                aggregate is exempt — a one-row
  *                                crossJoin(broadcast(df.agg(...))) is the
  *                                standard way to thread a global total
  *                                through a plan, not a scale risk.
  *                                (A grouped-but-bounded broadcast — e.g.
  *                                k-means' k-row centroid table — still
  *                                flags: the auditor can't see the bound,
  *                                so read that finding as "verify the
  *                                broadcast side is bounded".)
  *   - `global_window`          — a Window (or WindowGroupLimit) with an
  *                                empty PARTITION BY: the entire dataset
  *                                sorts through ONE task. Use the
  *                                two-phase prefix sums (`Scale.global*`)
  *                                instead. Exempt when the window's input
  *                                subtree already AGGREGATED — the
  *                                two-phase prefix sums themselves window
  *                                a per-partition micro-table (≤ one row
  *                                per task), and that shape must not
  *                                self-flag. The exemption is a
  *                                heuristic: a global window over a huge
  *                                grouped aggregate slips through.
  *   - `single_partition_sort`  — a Sort fed by an Exchange to one
  *                                partition: same single-task funnel,
  *                                same aggregated-input exemption.
  *
  * A finding is advice, not an error — scalar aggregates legitimately
  * exchange to one partition (they carry partial rows, not data), which is
  * why that shape alone is NOT flagged. Deterministic and side-effect
  * free: auditing never executes the query.
  */
object PlanAudit {

  final case class Finding(rule: String, node: String)

  /** Audit a DataFrame's physical plan (AQE plans are unwrapped). */
  def audit(df: DataFrame): Seq[Finding] =
    auditPlan(df.queryExecution.executedPlan)

  def auditPlan(root: SparkPlan): Seq[Finding] = {
    val findings = scala.collection.mutable.ArrayBuffer.empty[Finding]
    def short(p: SparkPlan): String = p.simpleStringWithNodeId().take(160)
    def isAgg(p: SparkPlan): Boolean = p match {
      case _: HashAggregateExec | _: SortAggregateExec |
           _: ObjectHashAggregateExec => true
      case _ => false
    }
    def scalarAgg(p: SparkPlan): Boolean = p match {
      case h: HashAggregateExec       => h.groupingExpressions.isEmpty
      case h: SortAggregateExec       => h.groupingExpressions.isEmpty
      case h: ObjectHashAggregateExec => h.groupingExpressions.isEmpty
      case _                          => false
    }
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case c: CartesianProductExec =>
          findings += Finding("cartesian_product", short(c))
        case j: BroadcastNestedLoopJoinExec =>
          val build = j.buildSide match {
            case BuildLeft  => j.left
            case BuildRight => j.right
          }
          if (!build.exists(scalarAgg))
            findings += Finding("nested_loop_join", short(j))
        case w: WindowExec
            if w.partitionSpec.isEmpty && !w.child.exists(isAgg) =>
          findings += Finding("global_window", short(w))
        case w: WindowGroupLimitExec
            if w.partitionSpec.isEmpty && !w.child.exists(isAgg) =>
          findings += Finding("global_window", short(w))
        case s: SortExec =>
          s.child match {
            case e: ShuffleExchangeExec
                if e.outputPartitioning == SinglePartition &&
                  !e.exists(isAgg) =>
              findings += Finding("single_partition_sort", short(s))
            case _ =>
          }
        case _ =>
      }
      p match {
        case a: AdaptiveSparkPlanExec => () // children walked via executedPlan
        case _ => p.children.foreach(walk); p.subqueries.foreach(walk)
      }
    }
    walk(root)
    findings.toSeq
  }

  /** Throw (with the findings listed) if the plan has any red flag —
    * the CI-gate form. */
  def assertClean(df: DataFrame): Unit = {
    val fs = audit(df)
    require(fs.isEmpty,
      "plan audit found scale red flags:\n" +
        fs.map(f => s"  [${f.rule}] ${f.node}").mkString("\n"))
  }
}
