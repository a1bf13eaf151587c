package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer

/** Approximate top-k frequency sketch: the Misra-Gries "frequent" summary
  * as a Catalyst aggregate — heavy hitters (top tokens, domains, keys) over
  * an arbitrarily large column WITHOUT shuffling every distinct key the way
  * an exact `groupBy(key).count().orderBy(...).limit(j)` must. Optionally
  * WEIGHTED (`weight` child): top items by token count, bytes, or any
  * positive long weight instead of row count.
  *
  * Why Misra-Gries and not Space-Saving/count-min: MG summaries are
  * MERGEABLE with a proved error bound (Agarwal, Cormode, Huang, Phillips,
  * Wei, Yi — "Mergeable Summaries", PODS'12): merging two summaries by
  * summing per-key counts, subtracting the (k+1)-th largest combined count
  * and dropping non-positive entries yields a valid k-counter MG summary of
  * the concatenated streams. That is exactly the contract map-side partial
  * aggregation + shuffle-merge needs — each partition shuffles a bounded
  * summary, merges are order-insensitive within the bound, and the final
  * estimate of any key sits within W/(k+1) below its true weight (W = total
  * weight; estimates never exceed truth).
  *
  * The update path applies the same truncation rule with a 2k working
  * buffer (truncate to k once 2k entries accumulate): this handles
  * arbitrary positive weights — which the classic decrement-all cannot —
  * and amortizes the O(k log k) truncation over k insertions. At most 2k
  * counters per partition cross the shuffle.
  *
  * When the column has ≤ k distinct values no counter is ever truncated and
  * the summary IS the exact (weighted) count table regardless of
  * partitioning — the deterministic regime the oracle query pins down.
  *
  * Input: StringType or LongType item (ints should be cast by the caller);
  * integral weight, NULL/non-positive weights skipped. Output:
  * array<struct<item, est_count:long>> sorted est desc, item asc —
  * deterministic output order for equal summaries.
  */
case class HeavyHittersAgg(
    item: Expression,
    weight: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Long]]
  with BinaryLike[Expression] {

  require(k > 0, "heavy_hitters k must be positive")

  override def left: Expression = item
  override def right: Expression = weight

  private def isString = item.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (item.dataType, weight.dataType) match {
      case (StringType | LongType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType | LongType, other) => TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters weight must be integral, got ${other.sql}")
      case (other, _) => TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters needs string or bigint input, got ${other.sql}")
    }

  override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
    new java.util.HashMap[Any, Long](k * 2)

  /** Subtract the (k+1)-th largest count from every entry, drop ≤ 0 — the
    * PODS'12 merge/truncation rule; at most k entries survive.
    */
  private def truncateToK(buf: java.util.HashMap[Any, Long]): Unit = {
    val counts = new Array[Long](buf.size)
    var i = 0
    val vs = buf.values().iterator()
    while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
    val jt = buf.entrySet().iterator()
    while (jt.hasNext) {
      val e = jt.next()
      if (e.getValue <= cut) jt.remove() else e.setValue(e.getValue - cut)
    }
  }

  override def update(buf: java.util.HashMap[Any, Long],
                      input: InternalRow): java.util.HashMap[Any, Long] = {
    val v = item.eval(input)
    if (v == null) return buf
    val wRaw = weight.eval(input)
    if (wRaw == null) return buf
    val w = wRaw match {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
      case other => other.asInstanceOf[Number].longValue
    }
    if (w <= 0) return buf
    // UTF8String from eval may point into a reused row buffer — copy
    // before it becomes a map key
    val key: Any = v match {
      case s: UTF8String => if (buf.containsKey(s)) s else s.clone()
      case other => other
    }
    val cur = buf.get(key)
    buf.put(key, cur + w)
    if (buf.size > 2 * k) truncateToK(buf)
    buf
  }

  override def merge(b1: java.util.HashMap[Any, Long],
                     b2: java.util.HashMap[Any, Long]): java.util.HashMap[Any, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey, cur + e.getValue)
    }
    if (b1.size > k) truncateToK(b1)
    b1
  }

  override def eval(buf: java.util.HashMap[Any, Long]): Any = {
    val entries = new Array[(Any, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb
      else (ia, ib) match {
        case (a: UTF8String, b: UTF8String) => a.compareTo(b) < 0
        case (a: java.lang.Long, b: java.lang.Long) => a < b
        case _ => false
      }
    }
    // a 2k-entry working buffer can reach eval (single-partition plans skip
    // the merge); present the k-truncated summary either way
    val top = if (sorted.length > k) {
      val cut = sorted(k)._2
      sorted.collect { case (it0, c) if c > cut => (it0, c - cut) }
    } else sorted
    new GenericArrayData(top.map { case (item0, c) =>
      InternalRow(item0, c)
    }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[Any, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      val e = it0.next()
      bytes += 8 + (if (isString) 4 + e.getKey.asInstanceOf[UTF8String].numBytes else 8)
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (isString) {
        val b = e.getKey.asInstanceOf[UTF8String].getBytes
        bb.putInt(b.length); bb.put(b)
      } else bb.putLong(e.getKey.asInstanceOf[Long])
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = new java.util.HashMap[Any, Long](math.max(n * 2, k * 2))
    var i = 0
    while (i < n) {
      val key: Any =
        if (isString) {
          val len = bb.getInt(); val b = new Array[Byte](len); bb.get(b)
          UTF8String.fromBytes(b)
        } else bb.getLong()
      m.put(key, bb.getLong())
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", item.dataType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HeavyHittersAgg =
    copy(item = newLeft, weight = newRight)
}

object HeavyHittersAgg {
  /** Unweighted form: every row counts 1. */
  def apply(item: Expression, k: Int): HeavyHittersAgg =
    HeavyHittersAgg(item, Literal(1L), k)
}
