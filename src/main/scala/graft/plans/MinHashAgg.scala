package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Custom Catalyst aggregate: the k-permutation MinHash signature in ONE
  * buffer pass.
  *
  * The composable formulation (k separate `min(pmod(h*a_i+b_i, p))` aggregate
  * expressions) evaluates k aggregate buffers per row with per-expression
  * dispatch; this TypedImperativeAggregate keeps one primitive long[k] buffer
  * and updates it in a tight loop — the standard pattern for sketch
  * aggregates (cf. Spark's own HyperLogLogPlusPlus / datasketches aggs).
  * Map-side partial aggregation and merge() work as usual, so the shuffle
  * carries one k-long signature per (doc, partition) instead of raw shingles.
  *
  * Input: a LongType column (e.g. xxhash64 of the shingle). Output:
  * array<long> of k signature mins. h_i(x) = (a_i·x + b_i) mod p with
  * p = 2^31-1 (products stay < 2^62: no int64 overflow under ANSI).
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val p = 2147483647L // 2^31 - 1

  // identical draw sequence to Dedup.minhashSignaturesComposed so the two
  // formulations are bit-equal (differential-tested)
  @transient private lazy val coeffs: Array[Long] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k) {
      val a = math.abs(rnd.nextLong()) % (p - 1) + 1
      val b = math.abs(rnd.nextLong()) % p
      Array(a, b)
    }.flatten
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = ((v.asInstanceOf[Long] % p) + p) % p
      var i = 0
      while (i < k) {
        val a = coeffs(2 * i)
        val b = coeffs(2 * i + 1)
        val h = (a * x + b) % p
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
