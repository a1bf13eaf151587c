package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer

/** Approximate top-k frequency sketch: the Misra-Gries "frequent" summary
  * as a Catalyst aggregate — heavy hitters (top tokens, domains, keys) over
  * an arbitrarily large column WITHOUT shuffling every distinct key the way
  * an exact `groupBy(key).count().orderBy(...).limit(j)` must.
  *
  * Why Misra-Gries and not Space-Saving/count-min: MG summaries are
  * MERGEABLE with a proved error bound (Agarwal, Cormode, Huang, Phillips,
  * Wei, Yi — "Mergeable Summaries", PODS'12): merging two k-counter
  * summaries by summing per-key counts, subtracting the (k+1)-th largest
  * combined count and dropping non-positive entries yields a valid k-counter
  * MG summary of the concatenated streams. That is exactly the contract
  * map-side partial aggregation + shuffle-merge needs — each partition
  * shuffles ≤ k counters, merges are associative-enough for Spark's
  * arbitrary combine order, and the final estimate of any key is within
  * n/(k+1) below its true count (MG counts never over-count after merge
  * truncation is accounted: est ∈ [true - n/(k+1), true]).
  *
  * When the column has ≤ k distinct values no counter is ever evicted and
  * the summary IS the exact count table regardless of partitioning — the
  * deterministic regime the oracle query pins down.
  *
  * Input: StringType or LongType (ints should be cast by the caller).
  * Output: array<struct<item, est_count:long>> sorted est desc, item asc —
  * deterministic output order for equal summaries.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "heavy_hitters k must be positive")

  private def isString = child.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters needs string or bigint input, got ${other.sql}")
    }

  override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
    new java.util.HashMap[Any, Long](k * 2)

  override def update(buf: java.util.HashMap[Any, Long],
                      input: InternalRow): java.util.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String from eval may point into a reused row buffer — copy
      // before it becomes a map key
      val key: Any = v match {
        case s: UTF8String => if (buf.containsKey(s)) s else s.clone()
        case other => other
      }
      val cur = buf.get(key)
      if (cur != 0L || buf.containsKey(key)) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key, 1L)
      else {
        // classic MG decrement-all: amortized O(1) per row (each decrement
        // cancels one prior increment), O(k) worst-case on this branch
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
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
    if (b1.size > k) {
      // subtract the (k+1)-th largest combined count, drop non-positive —
      // at most k entries are strictly greater, so the summary shrinks to
      // ≤ k while keeping the mergeable error bound
      val counts = new Array[Long](b1.size)
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val jt = b1.entrySet().iterator()
      while (jt.hasNext) {
        val e = jt.next()
        if (e.getValue <= cut) jt.remove() else e.setValue(e.getValue - cut)
      }
    }
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
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
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
      StructField("item", child.dataType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}
