package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a Catalyst aggregate —
  * the pure-SQL entry to the sketch layer [[graft.ops.Sketch.countMin]]
  * exposes relationally. One call aggregates a string key column into the
  * flattened depth×width counter matrix (`array<bigint>`, cell (d, b) at
  * index d·width + b); the companion `cm_estimate` SQL macro reads point
  * estimates back out with the same bucket arithmetic.
  *
  * Bucketing is the repo's portable 60-bit md5 leaf —
  * `pmod(portableHash(d || '|' || key), width)`, bit-identical to
  * [[graft.ops.Sketch.portableHash]] and the `cm_bucket` macro — so the
  * aggregate's counters EQUAL the relational builder's cell table
  * (SqlFunctionsSpec pins the equivalence) and replay in DuckDB.
  * Counter addition commutes, so the summary is partition- and
  * merge-order-invariant; NULL keys are not counted (the relational
  * builder's convention). The buffer is depth·width longs — bounded, the
  * map-side-combine contract a 100 TB scan needs.
  */
case class CountMinAgg(
    key: Expression,
    width: Int,
    depth: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(width > 0, "count_min_agg width must be positive")
  require(depth > 0, "count_min_agg depth must be positive")
  require(width.toLong * depth <= (1L << 22),
    "count_min_agg counter table exceeds the aggregation-buffer budget")

  override def child: Expression = key

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min_agg key must be a string (CAST it), got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  // one digest instance per deserialized aggregate (per task thread —
  // Catalyst copies the expression per partition, so no cross-thread
  // sharing); digest() resets it after each call, so the update hot path
  // does no provider lookups or MessageDigest allocations per row
  @transient private lazy val md5: MessageDigest =
    MessageDigest.getInstance("MD5")

  /** First 15 hex chars of md5("d|key") as a nonnegative 60-bit long —
    * the JVM twin of [[graft.ops.Sketch.portableHash]]'s expression tree
    * (7 full digest bytes + the high nibble of the 8th).
    */
  private def bucket(d: Int, k: UTF8String): Int = {
    val dig = md5
      .digest((d.toString + "|" + k.toString).getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h = (h << 4) | ((dig(7) & 0xf0L) >>> 4)
    (h % width).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = key.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) { buf(d * width + bucket(d, k)) += 1L; d += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf).toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(key = newChild)
}
