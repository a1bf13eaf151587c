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

/** GLOBAL running sums over an already-range-partitioned child — the WHOLE
  * two-phase prefix sum as one operator. The two-phase shape needs (a) each
  * partition's running sums and (b) every partition's exclusive offset (the
  * sum of all earlier partitions). Expressed in DataFrame operators, (b)
  * forced the ranged relation to be CACHED (two consumers of one exchange —
  * without a shared materialization the range sampler can draw different
  * boundaries per consumer and ranks corrupt silently), aggregated,
  * windowed, broadcast and hash-joined back. This operator computes (b) as
  * a MICRO-JOB over the child's OWN materialized shuffle output (one
  * bounded driver collect of numPartitions × nValues longs — the same
  * driver-literal idiom as the broadcast offsets it replaces) and folds the
  * offsets into the partition-local pass as initial values.
  *
  * Scale consequence: the ranged relation is no longer cached AT ALL — a
  * 100 TB prefix sum stops writing 100 TB into the block manager (and
  * evicting everything else) just to pin partition boundaries; boundary
  * consistency is free here because both passes execute the SAME exchange
  * instance (one RangePartitioner, one map output). Locally each prefix sum
  * drops the cache fill, the offsets shuffle, the broadcast build and the
  * join — ~3 fewer jobs per call.
  */
case class GlobalRunningSum(order: Seq[SortOrder],
                            values: Seq[Expression],
                            outAttrs: Seq[AttributeReference],
                            child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GlobalRunningSum = copy(child = newChild)
}

case class GlobalRunningSumExec(order: Seq[SortOrder],
                                values: Seq[Expression],
                                outAttrs: Seq[AttributeReference],
                                child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  // no required distribution — the caller owns the (range) partitioning;
  // the partition-local sort orders rows within each partition
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = order

  protected override def doExecute(): RDD[InternalRow] = {
    val nVals = values.length
    val childOutput = child.output
    val valueExprs = values
    val fullOutput = output
    val sumAttrs: Seq[Attribute] = outAttrs
    // PASS 1 — per-partition totals, a micro-job over the same exchange
    // instance pass 2 reads (sums are order-independent; the duplicated
    // partition-local sort is the price of not caching the relation).
    // Bounded driver data: numPartitions × nVals longs.
    val partSums: Array[Array[Long]] = sparkContext.runJob(
      child.execute(),
      (it: Iterator[InternalRow]) => {
        val proj = UnsafeProjection.create(valueExprs, childOutput)
        val s = new Array[Long](nVals)
        while (it.hasNext) {
          val v = proj(it.next())
          var i = 0
          while (i < nVals) {
            if (!v.isNullAt(i)) s(i) += v.getLong(i)
            i += 1
          }
        }
        s
      })
    // exclusive prefix offsets per partition
    val offsets = new Array[Array[Long]](partSums.length)
    val acc = new Array[Long](nVals)
    var p = 0
    while (p < partSums.length) {
      offsets(p) = acc.clone()
      var i = 0
      while (i < nVals) { acc(i) += partSums(p)(i); i += 1 }
      p += 1
    }
    // PASS 2 — partition-local running sums seeded with the offsets
    child.execute().mapPartitionsWithIndexInternal { (pid, iter) =>
      val valProj = UnsafeProjection.create(valueExprs, childOutput)
      val outProj = UnsafeProjection.create(
        fullOutput.map(_.asInstanceOf[Expression]), childOutput ++ sumAttrs)
      val sums = offsets(pid).clone()
      val sumsRow = new GenericInternalRow(nVals)
      val joined = new JoinedRow
      iter.map { row =>
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
      newChild: SparkPlan): GlobalRunningSumExec = copy(child = newChild)
}

/** PER-GROUP running sums over an already-range-partitioned child — the
  * grouped sibling of [[GlobalRunningSum]], same contract as
  * `Scale.groupedCumSum`: the child is range-partitioned by
  * (groups ++ order), so each group's rows are CONTIGUOUS across the
  * partition sequence. Cross-partition offsets then exist only for the
  * FIRST group of each partition (a group reaching partition p from
  * earlier partitions must be p's first group — contiguity), so pass 1
  * collects just (first group key, its sums, last group key, its sums)
  * per partition — 2 keys per partition regardless of group count, which
  * beats the old offsets micro-table (≤ partitions × groups rows,
  * aggregated + windowed + broadcast + joined, over a CACHED copy of the
  * whole relation). The driver walks partitions backwards accumulating
  * last-group sums while the boundary group continues (the classic
  * segmented-scan fixup), and pass 2 seeds each partition's first group
  * with its offset.
  */
case class GroupedRunningSum(order: Seq[SortOrder],
                             resets: Seq[Expression],
                             values: Seq[Expression],
                             outAttrs: Seq[AttributeReference],
                             child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GroupedRunningSum = copy(child = newChild)
}

case class GroupedRunningSumExec(order: Seq[SortOrder],
                                 resets: Seq[Expression],
                                 values: Seq[Expression],
                                 outAttrs: Seq[AttributeReference],
                                 child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
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
    // PASS 1 — boundary-group sums per partition (rows arrive sorted, so
    // the first/last group are the leading/trailing runs). Tuple per
    // partition: (firstKeyBytes, firstSums, lastKeyBytes, lastSums);
    // null keys = empty partition.
    val edges: Array[(Array[Byte], Array[Long], Array[Byte], Array[Long])] =
      sparkContext.runJob(
      child.execute(),
      (it: Iterator[InternalRow]) => {
        val keyProj = UnsafeProjection.create(resetExprs, childOutput)
        val valProj = UnsafeProjection.create(valueExprs, childOutput)
        var firstKey: UnsafeRow = null
        var firstSums: Array[Long] = null
        var curKey: UnsafeRow = null
        var curSums = new Array[Long](nVals)
        while (it.hasNext) {
          val row = it.next()
          val k = keyProj(row)
          if (curKey == null || k != curKey) {
            if (curKey != null && firstKey == null) {
              // the leading run just ended
              firstKey = curKey
              firstSums = curSums
            }
            if (curKey != null) curSums = new Array[Long](nVals)
            curKey = k.copy()
          }
          val v = valProj(row)
          var i = 0
          while (i < nVals) {
            if (!v.isNullAt(i)) curSums(i) += v.getLong(i)
            i += 1
          }
        }
        if (curKey == null) // empty partition
          (null: Array[Byte], null: Array[Long],
            null: Array[Byte], null: Array[Long])
        else if (firstKey == null) { // one group spans the whole partition
          val kb = curKey.getBytes
          (kb, curSums, kb, curSums)
        } else
          (firstKey.getBytes, firstSums, curKey.getBytes, curSums)
      })
    // driver fixup: offset of partition p's FIRST group = sum of the
    // trailing runs of the maximal chain of earlier partitions whose last
    // group equals it (walk stops at a partition holding >1 group; empty
    // partitions are skipped — a group can span one)
    val offsets = new Array[Array[Long]](edges.length)
    var p = 0
    while (p < edges.length) {
      val off = new Array[Long](nVals)
      if (edges(p)._1 != null) {
        val fk = edges(p)._1
        var q = p - 1
        var walking = true
        while (walking && q >= 0) {
          val (efk, _, elk, els) = edges(q)
          if (efk == null) q -= 1 // empty partition: look past it
          else if (java.util.Arrays.equals(elk, fk)) {
            var i = 0
            while (i < nVals) { off(i) += els(i); i += 1 }
            if (java.util.Arrays.equals(efk, elk)) q -= 1
            else walking = false
          } else walking = false
        }
      }
      offsets(p) = off
      p += 1
    }
    // PASS 2 — partition-local running sums restarting per group, the
    // first group seeded with its cross-partition offset
    child.execute().mapPartitionsWithIndexInternal { (pid, iter) =>
      val keyProj = UnsafeProjection.create(resetExprs, childOutput)
      val valProj = UnsafeProjection.create(valueExprs, childOutput)
      val outProj = UnsafeProjection.create(
        fullOutput.map(_.asInstanceOf[Expression]), childOutput ++ sumAttrs)
      val sums = offsets(pid).clone()
      val sumsRow = new GenericInternalRow(nVals)
      val joined = new JoinedRow
      var prevKey: UnsafeRow = null
      var first = true
      iter.map { row =>
        val k = keyProj(row)
        if (first) { prevKey = k.copy(); first = false }
        else if (k != prevKey) {
          java.util.Arrays.fill(sums, 0L)
          prevKey = k.copy()
        }
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
      newChild: SparkPlan): GroupedRunningSumExec = copy(child = newChild)
}

/** Planner strategy mapping the logical nodes to their execs — injected
  * once per session via `spark.experimental.extraStrategies` (public API). */
object PartitionPrefixStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartitionRunningSum(order, resets, values, outAttrs, child) =>
      PartitionRunningSumExec(order, resets, values, outAttrs,
        planLater(child)) :: Nil
    case GlobalRunningSum(order, values, outAttrs, child) =>
      GlobalRunningSumExec(order, values, outAttrs, planLater(child)) :: Nil
    case GroupedRunningSum(order, resets, values, outAttrs, child) =>
      GroupedRunningSumExec(order, resets, values, outAttrs,
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

  /** Append inclusive GLOBAL running sums of each `values` column
    * (integral, NULL adds 0) to `df`, which the caller must already have
    * range-partitioned by `order` (every partition a contiguous key
    * range). One operator does the whole two-phase prefix sum: a micro-job
    * collects per-partition totals from the same materialized exchange,
    * and the partition-local pass starts each partition at its exclusive
    * offset — no cache, no offsets shuffle, no broadcast join. */
  def globalRunningSums(df: DataFrame, order: Seq[Column],
                        values: Seq[(Column, String)]): DataFrame = {
    require(values.nonEmpty, "need at least one (value, name) pair")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val orderSplit = order.map(splitSort)
    val allCols = orderSplit.map(_._1) ++ values.map(_._1)
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
    val sorts = orderSplit.zipWithIndex.map { case ((_, dir, no), i) =>
      SortOrder(resolved(i), dir, no, Seq.empty)
    }
    val valueExprs = resolved.drop(nOrd).map { e =>
      e.dataType match {
        case LongType => e
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => Cast(e, LongType)
        case other => throw new IllegalArgumentException(
          s"globalRunningSums: value must be integral, got $other")
      }
    }
    // internal names, re-aliased through a Project below: a custom node's
    // produced attributes must NOT surface directly in the Dataset output —
    // the analyzer's self-join deduplication renews Project aliases but
    // not unknown nodes' produced attrs (two copies of this subtree in one
    // join would then carry the SAME exprId and fail analysis with
    // "conflicting references"). Hidden behind the alias they stay
    // subtree-internal, exactly like the old two-branch form's __run cols.
    val outAttrs = values.map { case (_, name) =>
      AttributeReference(s"__grs_$name", LongType, nullable = false)()
    }
    val plan = GlobalRunningSum(sorts, valueExprs, outAttrs, child)
    val raw = org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
    raw.select(df.columns.map(org.apache.spark.sql.functions.col).toSeq ++
      values.map { case (_, name) =>
        org.apache.spark.sql.functions.col(s"__grs_$name").as(name) }: _*)
  }

  /** [[globalRunningSums]] restarting per `resets` group — the grouped
    * two-phase prefix sum as ONE operator over the caller's range
    * partitioning by (resets ++ order). Cross-partition offsets are
    * collected as boundary-group sums (2 group keys per partition) and
    * fixed up on the driver; no cache, no offsets micro-table, no
    * broadcast join. */
  def groupedRunningSums(df: DataFrame, order: Seq[Column],
                         resets: Seq[Column],
                         values: Seq[(Column, String)]): DataFrame = {
    require(values.nonEmpty, "need at least one (value, name) pair")
    require(resets.nonEmpty, "use globalRunningSums when there are no groups")
    val spark = df.sparkSession
    ensureStrategy(spark)
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
          s"groupedRunningSums: value must be integral, got $other")
      }
    }
    val outAttrs = values.map { case (_, name) =>
      AttributeReference(s"__grs_$name", LongType, nullable = false)()
    }
    val plan = GroupedRunningSum(sorts, resetExprs, valueExprs, outAttrs,
      child)
    val raw = org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
    raw.select(df.columns.map(org.apache.spark.sql.functions.col).toSeq ++
      values.map { case (_, name) =>
        org.apache.spark.sql.functions.col(s"__grs_$name").as(name) }: _*)
  }
}
