package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** PARTITION-LOCAL RUNNING SUMS — the per-partition phase of graft's
  * two-phase prefix sums ([[graft.ops.Scale.globalCumSums]] /
  * `groupedCumSum`) as a dedicated physical operator.
  *
  * Why it exists: the two-phase shape range-partitions the data ONCE
  * (every partition holds a contiguous key range) and then needs, per
  * row, the running sum WITHIN its physical partition (plus a broadcast
  * per-partition offset). Expressing that inner phase as
  * `Window.partitionBy(__pid…)` forces a SECOND full exchange —
  * `hashpartitioning(__pid…)` — because Catalyst cannot know that
  * `spark_partition_id()` is, by construction, already clustered: one
  * pid per physical partition. This operator states that knowledge:
  * it requires NO distribution (no exchange) and only a partition-LOCAL
  * sort on `order`, computing inclusive running LongType sums per
  * physical partition, restarting whenever the `resets` tuple changes
  * (resets ⊆ the partition sort prefix keeps reset groups contiguous —
  * the callers' range partitioning guarantees it).
  *
  * Scale consequence: every prefix-sum consumer (ranks, vocab ids,
  * context-window cuts, CCNet buckets, PR curves, batch packing) drops
  * one full data shuffle; the network cost of a 100 TB rank becomes ONE
  * range exchange instead of two back-to-back exchanges of the same
  * bytes. NULL values contribute 0 (SQL SUM semantics); sums are exact
  * Longs (the callers' contract — counts and token lengths).
  */
case class PartitionRunningSum(order: Seq[SortOrder],
                               resets: Seq[Expression],
                               values: Seq[Expression],
                               outAttrs: Seq[AttributeReference],
                               child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): PartitionRunningSum = copy(child = newChild)
}

case class PartitionRunningSumExec(order: Seq[SortOrder],
                                   resets: Seq[Expression],
                                   values: Seq[Expression],
                                   outAttrs: Seq[AttributeReference],
                                   child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  // no required distribution — THE point: the upstream range exchange is
  // the only data shuffle; we only need each partition locally sorted
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = order

  protected override def doExecute(): RDD[InternalRow] = {
    val nVals = values.length
    val childOutput = child.output
    val resetExprs = resets
    val valueExprs = values
    val fullOutput = output
    val sumAttrs: Seq[Attribute] = outAttrs
    child.execute().mapPartitionsInternal { iter =>
      val resetProj =
        if (resetExprs.nonEmpty) UnsafeProjection.create(resetExprs, childOutput)
        else null
      val valProj = UnsafeProjection.create(valueExprs, childOutput)
      val outProj = UnsafeProjection.create(
        fullOutput.map(_.asInstanceOf[Expression]), childOutput ++ sumAttrs)
      val sums = new Array[Long](nVals)
      val sumsRow = new GenericInternalRow(nVals)
      val joined = new JoinedRow
      var prevKey: UnsafeRow = null
      var first = true
      iter.map { row =>
        if (resetProj != null) {
          val k = resetProj(row)
          if (first || k != prevKey) {
            java.util.Arrays.fill(sums, 0L)
            prevKey = k.copy()
          }
        } else if (first) java.util.Arrays.fill(sums, 0L)
        first = false
        val v = valProj(row)
        var i = 0
        while (i < nVals) {
          if (!v.isNullAt(i)) sums(i) += v.getLong(i)
          sumsRow.update(i, sums(i))
          i += 1
        }
        outProj(joined(row, sumsRow))
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): PartitionRunningSumExec = copy(child = newChild)
}

/** Planner strategy mapping the logical node to its exec — injected once
  * per session via `spark.experimental.extraStrategies` (public API). */
object PartitionPrefixStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartitionRunningSum(order, resets, values, outAttrs, child) =>
      PartitionRunningSumExec(order, resets, values, outAttrs,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

object PartitionPrefix {

  private def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    spark match {
      case s: org.apache.spark.sql.classic.SparkSession =>
        val cur = s.experimental.extraStrategies
        if (!cur.contains(PartitionPrefixStrategy))
          s.experimental.extraStrategies = cur :+ PartitionPrefixStrategy
      case other => throw new IllegalStateException(
        s"PartitionPrefix requires a classic SparkSession, got $other")
    }

  /** Split a possibly sort-decorated Column into its bare column plus the
    * catalyst direction/null-ordering (mirroring [[Shim.reverseSort]]'s
    * node handling; an undecorated column sorts ascending with the
    * direction's default null ordering, exactly like `orderBy`). */
  private def splitSort(c: Column): (Column, SortDirection, NullOrdering) =
    c.node match {
      case s: org.apache.spark.sql.internal.SortOrder =>
        val dir = s.sortDirection match {
          case org.apache.spark.sql.internal.SortOrder.Ascending => Ascending
          case org.apache.spark.sql.internal.SortOrder.Descending => Descending
        }
        val no = s.nullOrdering match {
          case org.apache.spark.sql.internal.SortOrder.NullsFirst => NullsFirst
          case org.apache.spark.sql.internal.SortOrder.NullsLast => NullsLast
        }
        (Column(s.child), dir, no)
      case _ => (c, Ascending, Ascending.defaultNullOrdering)
    }

  /** Append inclusive partition-local running sums of each `values`
    * column (integral, NULL adds 0) to `df`, sorted partition-locally by
    * `order`, restarting at each change of the `resets` tuple. No
    * exchange is introduced: the caller owns the partitioning (range
    * partitioning with `resets` as a prefix of the partition key). */
  def runningSums(df: DataFrame, order: Seq[Column], resets: Seq[Column],
                  values: Seq[(Column, String)]): DataFrame = {
    require(values.nonEmpty, "need at least one (value, name) pair")
    val spark = df.sparkSession
    ensureStrategy(spark)
    // Column trees are lazy ColumnNodeExpressions in Spark 4 — resolution
    // happens only in the analyzer, so route every expression through a
    // throwaway projection over df and harvest the RESOLVED project list.
    val orderSplit = order.map(splitSort)
    val allCols = orderSplit.map(_._1) ++ resets ++ values.map(_._1)
    val probe = df.select(allCols.zipWithIndex.map { case (c, i) =>
      c.as(s"__ppx$i") }: _*)
    val proj = probe.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
    val resolved: Seq[Expression] = proj.projectList.map {
      case Alias(e, _) => e
      case a => a
    }
    val child = proj.child
    val nOrd = order.length
    val nRst = resets.length
    val sorts = orderSplit.zipWithIndex.map { case ((_, dir, no), i) =>
      SortOrder(resolved(i), dir, no, Seq.empty)
    }
    val resetExprs = resolved.slice(nOrd, nOrd + nRst)
    val valueExprs = resolved.drop(nOrd + nRst).map { e =>
      e.dataType match {
        case LongType => e
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => Cast(e, LongType)
        case other => throw new IllegalArgumentException(
          s"partitionRunningSums: value must be integral, got $other")
      }
    }
    val outAttrs = values.map { case (_, name) =>
      AttributeReference(name, LongType, nullable = false)()
    }
    val plan = PartitionRunningSum(sorts, resetExprs, valueExprs, outAttrs,
      child)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }
}
