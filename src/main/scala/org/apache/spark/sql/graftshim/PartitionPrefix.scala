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
import org.apache.spark.sql.types.{DoubleType, LongType}

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
    // LongType sums add exactly (order-free); DoubleType sums follow SQL
    // SUM semantics (NULL skipped; NULL result while no non-null value has
    // been seen yet) and are emitted as offset + local-running-sum — the
    // same association the two-branch Window form produced.
    val isDbl: Array[Boolean] = values.map(_.dataType == DoubleType).toArray
    val anyDbl = isDbl.exists(identity)
    PartitionPrefix.assertTwoPassSafe(child, nodeName)
    // PASS 1 — per-partition totals, a micro-job over the same exchange
    // instance pass 2 reads. All-integral totals are order-independent, so
    // the micro-job reads BENEATH the EnsureRequirements-inserted
    // partition-local sort (dropping one redundant full sort per prefix
    // sum); double totals keep the sorted read so their addition order —
    // and thus the float result — is deterministic run to run.
    // Bounded driver data: numPartitions × nVals accumulators.
    val pass1Plan = if (anyDbl) child else child match {
      case s: org.apache.spark.sql.execution.SortExec if !s.global => s.child
      case other => other
    }
    val partTotals: Array[(Array[Long], Array[Double], Array[Long])] =
      sparkContext.runJob(
      pass1Plan.execute(),
      (it: Iterator[InternalRow]) => {
        val proj = UnsafeProjection.create(valueExprs, childOutput)
        val ls = new Array[Long](nVals)
        val ds = new Array[Double](nVals)
        val cs = new Array[Long](nVals) // non-null counts (double NULL rule)
        while (it.hasNext) {
          val v = proj(it.next())
          var i = 0
          while (i < nVals) {
            if (!v.isNullAt(i)) {
              if (isDbl(i)) { ds(i) += v.getDouble(i); cs(i) += 1 }
              else ls(i) += v.getLong(i)
            }
            i += 1
          }
        }
        (ls, ds, cs)
      })
    // exclusive prefix offsets per partition (doubles accumulate in
    // ascending pid order — the order the offsets window added them)
    val lOff = new Array[Array[Long]](partTotals.length)
    val dOff = new Array[Array[Double]](partTotals.length)
    val cOff = new Array[Array[Long]](partTotals.length)
    val lAcc = new Array[Long](nVals)
    val dAcc = new Array[Double](nVals)
    val cAcc = new Array[Long](nVals)
    var p = 0
    while (p < partTotals.length) {
      lOff(p) = lAcc.clone(); dOff(p) = dAcc.clone(); cOff(p) = cAcc.clone()
      val (ls, ds, cs) = partTotals(p)
      var i = 0
      while (i < nVals) { lAcc(i) += ls(i); dAcc(i) += ds(i); cAcc(i) += cs(i); i += 1 }
      p += 1
    }
    // PASS 2 — partition-local running sums seeded with the offsets
    child.execute().mapPartitionsWithIndexInternal { (pid, iter) =>
      val valProj = UnsafeProjection.create(valueExprs, childOutput)
      val outProj = UnsafeProjection.create(
        fullOutput.map(_.asInstanceOf[Expression]), childOutput ++ sumAttrs)
      val sums = lOff(pid).clone()
      val dBase = dOff(pid)
      val cBase = cOff(pid)
      val dLoc = new Array[Double](nVals)
      val cLoc = new Array[Long](nVals)
      val sumsRow = new GenericInternalRow(nVals)
      val joined = new JoinedRow
      iter.map { row =>
        val v = valProj(row)
        var i = 0
        while (i < nVals) {
          if (isDbl(i)) {
            if (!v.isNullAt(i)) { dLoc(i) += v.getDouble(i); cLoc(i) += 1 }
            if (cBase(i) + cLoc(i) == 0L) sumsRow.update(i, null)
            else sumsRow.update(i, dBase(i) + dLoc(i))
          } else {
            if (!v.isNullAt(i)) sums(i) += v.getLong(i)
            sumsRow.update(i, sums(i))
          }
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
    val isDbl: Array[Boolean] = values.map(_.dataType == DoubleType).toArray
    PartitionPrefix.assertTwoPassSafe(child, nodeName)
    // PASS 1 — boundary-group sums per partition (rows arrive sorted, so
    // the first/last group are the leading/trailing runs; the sort cannot
    // be unwrapped here — boundary detection needs the grouped order).
    // GroupEdge per partition; null keys = empty partition.
    val edges: Array[PartitionPrefix.GroupEdge] = sparkContext.runJob(
      child.execute(),
      (it: Iterator[InternalRow]) => {
        val keyProj = UnsafeProjection.create(resetExprs, childOutput)
        val valProj = UnsafeProjection.create(valueExprs, childOutput)
        var firstKey: UnsafeRow = null
        var firstL: Array[Long] = null
        var firstD: Array[Double] = null
        var firstC: Array[Long] = null
        var curKey: UnsafeRow = null
        var curL = new Array[Long](nVals)
        var curD = new Array[Double](nVals)
        var curC = new Array[Long](nVals)
        while (it.hasNext) {
          val row = it.next()
          val k = keyProj(row)
          if (curKey == null || k != curKey) {
            if (curKey != null && firstKey == null) {
              // the leading run just ended
              firstKey = curKey
              firstL = curL; firstD = curD; firstC = curC
            }
            if (curKey != null) {
              curL = new Array[Long](nVals)
              curD = new Array[Double](nVals)
              curC = new Array[Long](nVals)
            }
            curKey = k.copy()
          }
          val v = valProj(row)
          var i = 0
          while (i < nVals) {
            if (!v.isNullAt(i)) {
              if (isDbl(i)) { curD(i) += v.getDouble(i); curC(i) += 1 }
              else curL(i) += v.getLong(i)
            }
            i += 1
          }
        }
        if (curKey == null) // empty partition
          PartitionPrefix.GroupEdge(null, null, null, null, null, null, null, null)
        else if (firstKey == null) { // one group spans the whole partition
          val kb = curKey.getBytes
          PartitionPrefix.GroupEdge(kb, curL, curD, curC, kb, curL, curD, curC)
        } else
          PartitionPrefix.GroupEdge(firstKey.getBytes, firstL, firstD, firstC,
            curKey.getBytes, curL, curD, curC)
      })
    // driver fixup: offset of partition p's FIRST group = sum of the
    // trailing runs of the maximal chain of earlier partitions whose last
    // group equals it (walk stops at a partition holding >1 group; empty
    // partitions are skipped — a group can span one). The chain is
    // collected walking backwards, then folded ASCENDING so double
    // addition order matches the pid-ascending offsets window it replaces.
    val lOffs = new Array[Array[Long]](edges.length)
    val dOffs = new Array[Array[Double]](edges.length)
    val cOffs = new Array[Array[Long]](edges.length)
    var p = 0
    while (p < edges.length) {
      val lo = new Array[Long](nVals)
      val dOffAcc = new Array[Double](nVals)
      val co = new Array[Long](nVals)
      if (edges(p).firstKey != null) {
        val fk = edges(p).firstKey
        val chain = scala.collection.mutable.ArrayBuffer
          .empty[PartitionPrefix.GroupEdge]
        var q = p - 1
        var walking = true
        while (walking && q >= 0) {
          val e = edges(q)
          if (e.firstKey == null) q -= 1 // empty partition: look past it
          else if (java.util.Arrays.equals(e.lastKey, fk)) {
            chain += e
            if (java.util.Arrays.equals(e.firstKey, e.lastKey)) q -= 1
            else walking = false
          } else walking = false
        }
        chain.reverseIterator.foreach { e =>
          var i = 0
          while (i < nVals) {
            lo(i) += e.lastL(i); dOffAcc(i) += e.lastD(i); co(i) += e.lastC(i)
            i += 1
          }
        }
      }
      lOffs(p) = lo; dOffs(p) = dOffAcc; cOffs(p) = co
      p += 1
    }
    // PASS 2 — partition-local running sums restarting per group, the
    // first group seeded with its cross-partition offset
    child.execute().mapPartitionsWithIndexInternal { (pid, iter) =>
      val keyProj = UnsafeProjection.create(resetExprs, childOutput)
      val valProj = UnsafeProjection.create(valueExprs, childOutput)
      val outProj = UnsafeProjection.create(
        fullOutput.map(_.asInstanceOf[Expression]), childOutput ++ sumAttrs)
      val zeroD = new Array[Double](nVals)
      val zeroL = new Array[Long](nVals)
      val sums = lOffs(pid).clone()
      var dBase = dOffs(pid)
      var cBase = cOffs(pid)
      val dLoc = new Array[Double](nVals)
      val cLoc = new Array[Long](nVals)
      val sumsRow = new GenericInternalRow(nVals)
      val joined = new JoinedRow
      var prevKey: UnsafeRow = null
      var first = true
      iter.map { row =>
        val k = keyProj(row)
        if (first) { prevKey = k.copy(); first = false }
        else if (k != prevKey) {
          java.util.Arrays.fill(sums, 0L)
          java.util.Arrays.fill(dLoc, 0.0)
          java.util.Arrays.fill(cLoc, 0L)
          dBase = zeroD; cBase = zeroL // groups past the first: no offset
          prevKey = k.copy()
        }
        val v = valProj(row)
        var i = 0
        while (i < nVals) {
          if (isDbl(i)) {
            if (!v.isNullAt(i)) { dLoc(i) += v.getDouble(i); cLoc(i) += 1 }
            if (cBase(i) + cLoc(i) == 0L) sumsRow.update(i, null)
            else sumsRow.update(i, dBase(i) + dLoc(i))
          } else {
            if (!v.isNullAt(i)) sums(i) += v.getLong(i)
            sumsRow.update(i, sums(i))
          }
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

  /** Pass-1 boundary-group record of [[GroupedRunningSumExec]]: the
    * leading and trailing group run of one partition (key bytes are the
    * UnsafeRow projection of the reset tuple; all-null = empty
    * partition). `*L` holds Long sums, `*D` double sums, `*C` double
    * non-null counts (SQL SUM's NULL rule). */
  final case class GroupEdge(
      firstKey: Array[Byte], firstL: Array[Long],
      firstD: Array[Double], firstC: Array[Long],
      lastKey: Array[Byte], lastL: Array[Long],
      lastD: Array[Double], lastC: Array[Long])

  /** The two-pass operators execute their child TWICE (totals micro-job +
    * output pass); consistency relies on every expression above the
    * child's materialization boundary (shuffle / query stage / cached
    * scan) being deterministic — a nondeterministic one (rand()-derived
    * columns without a checkpoint) would diverge between the passes and
    * corrupt sums silently. All in-repo callers route through
    * `repartitionByRange`, whose exchange IS that boundary; this assert
    * turns the contract violation into a loud failure. */
  private[graftshim] def assertTwoPassSafe(root: SparkPlan, op: String): Unit = {
    def walk(p: SparkPlan): Unit = p match {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => ()
      case _: org.apache.spark.sql.execution.adaptive.QueryStageExec => ()
      case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => ()
      case other =>
        require(other.expressions.forall(_.deterministic),
          s"$op executes its child twice; nondeterministic expressions " +
            "above the child's shuffle/materialization boundary would " +
            "compute different values per pass and corrupt the sums — " +
            "materialize them first (localCheckpoint, or the callers' " +
            s"checkpointInput flag). Offending node: $other")
        other.children.foreach(walk)
    }
    walk(root)
  }

  /** Value expressions the running-sum operators accept: integral types
    * sum exactly as Long; float/double sum as Double (SQL SUM's result
    * type), with the NULL-until-first-non-null rule preserved. Anything
    * else (decimal, interval) keeps the callers' Window fallback. */
  private def toSumValue(fn: String)(e: Expression): Expression =
    e.dataType match {
      case LongType | DoubleType => e
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => Cast(e, LongType)
      case org.apache.spark.sql.types.FloatType => Cast(e, DoubleType)
      case other => throw new IllegalArgumentException(
        s"$fn: value must be integral or float, got $other")
    }

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
    val valueExprs = resolved.drop(nOrd).map(toSumValue("globalRunningSums"))
    // internal names, re-aliased through a Project below: a custom node's
    // produced attributes must NOT surface directly in the Dataset output —
    // the analyzer's self-join deduplication renews Project aliases but
    // not unknown nodes' produced attrs (two copies of this subtree in one
    // join would then carry the SAME exprId and fail analysis with
    // "conflicting references"). Hidden behind the alias they stay
    // subtree-internal, exactly like the old two-branch form's __run cols.
    val outAttrs = values.zip(valueExprs).map { case ((_, name), e) =>
      AttributeReference(s"__grs_$name", e.dataType,
        nullable = e.dataType == DoubleType)()
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
    * broadcast join.
    *
    * GROUP-KEY CONTRACT: group columns must be EXACT types (integers,
    * strings, dates…). Group boundaries compare by projected UnsafeRow
    * BYTES, which differs from SQL grouping for floating-point keys
    * (-0.0 vs 0.0, NaN bit patterns) — normalize float group keys
    * upstream (no in-repo caller groups by floats). */
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
    val valueExprs =
      resolved.drop(nOrd + nRst).map(toSumValue("groupedRunningSums"))
    val outAttrs = values.zip(valueExprs).map { case ((_, name), e) =>
      AttributeReference(s"__grs_$name", e.dataType,
        nullable = e.dataType == DoubleType)()
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
