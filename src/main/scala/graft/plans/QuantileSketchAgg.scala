package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared state machinery of the quantile-sketch Catalyst aggregates: the
  * per-level point buffer (level l holds points of weight 2^l), the
  * deterministic keep-evens compaction of `Sketch.compactLevels` applied
  * buffer-locally, and the (lvl, v, w) struct-array codec. One `k` bounds
  * every level's occupancy, so buffers are O(k·log(n/k)).
  */
private[plans] object QsketchState {
  type Buf = Array[scala.collection.mutable.ArrayBuffer[Double]]

  // 2^62 rows would be needed to populate level 62 — an unreachable bound
  // that keeps weights in a long
  val MaxLevels = 62

  def empty(levels: Int = 1): Buf =
    Array.fill(levels)(scala.collection.mutable.ArrayBuffer.empty[Double])

  /** Deterministic halving sweep from `startLevel` upward (a full sweep,
    * not exit-on-first-ok: a merged buffer can hold an overfull level
    * ABOVE a non-overfull one): sort ascending, first cnt%2 stay, every
    * second remaining point promotes at doubled weight — the exact
    * per-level rule of `Sketch.compactLevels`, applied to this buffer's
    * points.
    */
  def compactFrom(buf0: Buf, startLevel: Int, k: Int): Buf = {
    var buf = buf0
    var l = startLevel
    while (l < buf.length) {
      if (buf(l).size > k) {
        val sorted = buf(l).sorted
        val off = sorted.size % 2
        require(l + 1 < MaxLevels, "qsketch compaction exceeded level bound")
        if (l + 1 >= buf.length)
          buf = buf :+ scala.collection.mutable.ArrayBuffer.empty[Double]
        val kept = scala.collection.mutable.ArrayBuffer.empty[Double]
        var i = 0
        while (i < off) { kept += sorted(i); i += 1 }
        var j = off + 1
        while (j < sorted.size) { buf(l + 1) += sorted(j); j += 2 }
        buf(l) = kept
      }
      l += 1
    }
    buf
  }

  /** Append a point at `lvl`, growing the level array as needed, then
    * compact. Used by both the raw-value build (lvl 0) and the
    * sketch-point merge (persisted lvl).
    */
  def insert(buf0: Buf, lvl: Int, v: Double, k: Int): Buf = {
    require(lvl >= 0 && lvl < MaxLevels,
      s"qsketch point level $lvl outside [0, $MaxLevels)")
    var buf = buf0
    while (lvl >= buf.length)
      buf = buf :+ scala.collection.mutable.ArrayBuffer.empty[Double]
    buf(lvl) += v
    if (buf(lvl).size > k) compactFrom(buf, lvl, k) else buf
  }

  def merge(b1: Buf, b2: Buf, k: Int): Buf = {
    var out = b1
    if (b2.length > out.length)
      out = out ++ Array.fill(b2.length - out.length)(
        scala.collection.mutable.ArrayBuffer.empty[Double])
    var l = 0
    while (l < b2.length) { out(l) ++= b2(l); l += 1 }
    compactFrom(out, 0, k)
  }

  /** (lvl, v, w = 2^lvl) struct rows sorted by (lvl, v). */
  def evalRows(buf: Buf): GenericArrayData = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var l = 0
    while (l < buf.length) {
      val w = 1L << l
      for (v <- buf(l).sorted)
        rows += new GenericInternalRow(Array[Any](l, v, w))
      l += 1
    }
    new GenericArrayData(rows.toArray)
  }

  def serialize(buf: Buf): Array[Byte] = {
    val n = buf.map(_.size).sum
    val bb = ByteBuffer.allocate(4 + buf.length * 4 + n * 8)
    bb.putInt(buf.length)
    for (lvl <- buf) {
      bb.putInt(lvl.size)
      lvl.foreach(bb.putDouble)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val levels = bb.getInt()
    Array.fill(levels) {
      val n = bb.getInt()
      val a = new scala.collection.mutable.ArrayBuffer[Double](n)
      var i = 0
      while (i < n) { a += bb.getDouble(); i += 1 }
      a
    }
  }

  val outputType: DataType = ArrayType(StructType(Seq(
    StructField("lvl", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("w", LongType, nullable = false))), containsNull = false)
}

/** The BUILD half of the mergeable quantile sketch as a Catalyst aggregate —
  * the pure-SQL entry to [[graft.ops.Sketch.quantileSketchByGroup]], and the
  * rank/quantile sibling of [[CountMinAgg]] (the CM family has been
  * symmetric — `count_min_agg` builds, `cm_estimate` reads — since round 9;
  * this closes the same loop for quantiles: `qsketch_agg` builds,
  * [[QuantileSketchMergeAgg]] re-aggregates persisted points, and
  * `qsketch_estimate` reads).
  *
  * Same compactor-sketch summary as the relational builder (Karnin, Lang &
  * Liberty FOCS 2016 shape; uniform per-level capacity `k`, deterministic
  * keep-evens halving — see `ops/Sketch.scala` for the design rationale):
  * the state is weighted points (lvl, v, w = 2^lvl), an overfull level is
  * sorted by v, its first cnt%2 points stay, and every second remaining
  * point promotes at doubled weight. Total weight is conserved exactly, so
  * the result always summarizes the input multiset; per-level occupancy is
  * bounded by k, so the aggregation buffer is O(k·log(n/k)) — the map-side-
  * combine contract a 100 TB scan needs.
  *
  * Output: `array<struct<lvl:int, v:double, w:bigint>>` sorted by (lvl, v) —
  * the SAME rows [[graft.ops.Sketch.quantileSketchByGroup]] produces,
  * as an array (explode it for the relational form; `transform(pts,
  * p -> struct(p.v, p.w))` feeds `qsketch_estimate` directly).
  *
  * Determinism contract (narrower than the relational builder's, by
  * construction): the relational compaction acts on the GLOBAL per-group
  * multiset, so its output is partition-invariant even when compaction
  * fires. An aggregate compacts within partial buffers in partition order,
  * so in the COMPACTION regime the exact point set depends on the partition
  * layout (like Spark's own approx aggregates) while weight conservation
  * and the rank-error bound always hold. In the EXACT regime (group count
  * ≤ k) no buffer ever compacts and the output is a pure function of the
  * multiset — bit-identical to the relational builder and DuckDB-replayable
  * (q_qsketch_sql's oracle regime; SqlFunctionsSpec pins the parity).
  * NULL/NaN values are not counted (the relational builder's `isNotNull`
  * convention; NaN would poison the sort order).
  */
case class QuantileSketchAgg(
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QsketchState.Buf]
  with UnaryLike[Expression] {

  require(k >= 2, "qsketch_agg per-level capacity k must be >= 2")
  require(k <= (1 << 20), "qsketch_agg per-level capacity exceeds the buffer budget")

  override def child: Expression = value

  override def checkInputDataTypes(): TypeCheckResult = value.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qsketch_agg value must be a double (CAST it), got ${other.sql}")
  }

  override def createAggregationBuffer(): QsketchState.Buf = QsketchState.empty()

  override def update(buf: QsketchState.Buf, input: InternalRow): QsketchState.Buf = {
    val v = value.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) return QsketchState.insert(buf, 0, d, k)
    }
    buf
  }

  override def merge(b1: QsketchState.Buf, b2: QsketchState.Buf): QsketchState.Buf =
    QsketchState.merge(b1, b2, k)

  override def eval(buf: QsketchState.Buf): Any = QsketchState.evalRows(buf)
  override def serialize(buf: QsketchState.Buf): Array[Byte] =
    QsketchState.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QsketchState.Buf =
    QsketchState.deserialize(bytes)

  override def dataType: DataType = QsketchState.outputType
  override def nullable: Boolean = false
  override def prettyName: String = "qsketch_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(value = newChild)
}

/** The MERGE half of the quantile-sketch SQL surface: re-aggregate
  * PERSISTED sketch points — (lvl, v) rows from [[QuantileSketchAgg]]'s
  * exploded output or [[graft.ops.Sketch.quantileSketchByGroup]]'s
  * relational table — into one combined sketch, without touching the data
  * the inputs summarized. Each point enters the buffer AT ITS LEVEL
  * (weight 2^lvl is the representation's invariant, so no weight argument
  * exists to get wrong), then the same deterministic compaction applies.
  * This is `Sketch.quantileSketchMerge` as a SQL aggregate: batch N's
  * persisted sketch folds into the standing one in pure SQL — the same
  * incremental-stats shape as `count_min_agg` over persisted CM cells.
  * In the exact regime (combined level-0 count ≤ k, no higher levels) the
  * merge is lossless and bit-identical to the relational merge
  * (SqlFunctionsSpec pins it); in the compaction regime weight
  * conservation and the rank-error bound hold with the partition-order
  * caveat documented on [[QuantileSketchAgg]]. NULL lvl/v rows are not
  * counted.
  */
case class QuantileSketchMergeAgg(
    lvl: Expression,
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QsketchState.Buf]
  with BinaryLike[Expression] {

  require(k >= 2, "qsketch_merge_agg per-level capacity k must be >= 2")
  require(k <= (1 << 20),
    "qsketch_merge_agg per-level capacity exceeds the buffer budget")

  override def left: Expression = lvl
  override def right: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    (lvl.dataType, value.dataType) match {
      case (IntegerType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, v) => TypeCheckResult.TypeCheckFailure(
        s"qsketch_merge_agg expects (lvl INT, v DOUBLE), got (${l.sql}, ${v.sql})")
    }

  override def createAggregationBuffer(): QsketchState.Buf = QsketchState.empty()

  override def update(buf: QsketchState.Buf, input: InternalRow): QsketchState.Buf = {
    val l = lvl.eval(input)
    val v = value.eval(input)
    if (l != null && v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN)
        return QsketchState.insert(buf, l.asInstanceOf[Int], d, k)
    }
    buf
  }

  override def merge(b1: QsketchState.Buf, b2: QsketchState.Buf): QsketchState.Buf =
    QsketchState.merge(b1, b2, k)

  override def eval(buf: QsketchState.Buf): Any = QsketchState.evalRows(buf)
  override def serialize(buf: QsketchState.Buf): Array[Byte] =
    QsketchState.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QsketchState.Buf =
    QsketchState.deserialize(bytes)

  override def dataType: DataType = QsketchState.outputType
  override def nullable: Boolean = false
  override def prettyName: String = "qsketch_merge_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchMergeAgg =
    copy(lvl = newLeft, value = newRight)
}
