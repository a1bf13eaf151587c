package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expression: ALL random-hyperplane LSH signatures of an
  * embedding vector in one primitive pass — `array(sig_0 … sig_{T-1})`,
  * where table t's signature packs the sign bits of nPlanes projections
  * drawn from `seed + t`.
  *
  * The composed formulation builds nTables × nPlanes `DotProduct(vec,
  * array(64 literal doubles))` trees. Each of those allocates its literal
  * plane array per evaluation and codegen does not share work across the
  * trees, so the signature step dominated every LSH path (measured: the
  * multi-probe KNN join spent more time hashing than joining). Here the
  * planes live in ONE flat `double[]` reference object and the whole
  * [tables × planes × dims] loop runs behind a single call per row — the
  * same treatment DotProduct/ShingleHash got.
  *
  * The plane draw replicates `Similarity.planes(dim, nPlanes, seed + t)`
  * exactly (sequential Gaussians from a scala.util.Random per table), so
  * signatures are bit-equal with the composed formulation — PipelineSpec
  * pins the equality.
  *
  * NULL semantics: NULL input, any NULL element, or a vector whose length
  * differs from `dim` → NULL (a malformed row must drop out of bucket
  * join candidate generation, not land in the all-zero-sign bucket as the
  * composed `when(...).otherwise(0)` would have it).
  */
case class HyperplaneSigs(child: Expression, dim: Int, nPlanes: Int,
                          nTables: Int, seed: Long) extends UnaryExpression {

  require(nPlanes > 0 && nPlanes <= 63, "signature packs into one long")
  require(nTables > 0 && dim > 0, "need at least one table and dimension")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs expects a numeric array, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_sigs"

  // flat [t][p][d] layout; identical draw sequence to Similarity.planes so
  // the two formulations agree bit-for-bit
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](nTables * nPlanes * dim)
    var t = 0
    while (t < nTables) {
      val rnd = new scala.util.Random(seed + t)
      var i = 0
      while (i < nPlanes * dim) {
        out(t * nPlanes * dim + i) = rnd.nextGaussian()
        i += 1
      }
      t += 1
    }
    out
  }

  @transient private lazy val get: (ArrayData, Int) => Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType  => (a, i) => a.getDouble(i)
      case FloatType   => (a, i) => a.getFloat(i).toDouble
      case LongType    => (a, i) => a.getLong(i).toDouble
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case ShortType   => (a, i) => a.getShort(i).toDouble
      case ByteType    => (a, i) => a.getByte(i).toDouble
      case d: DecimalType => (a, i) => a.getDecimal(i, d.precision, d.scale).toDouble
      case other => throw new IllegalStateException(
        s"hyperplane_sigs: unsupported element type ${other.catalogString}")
    }

  def compute(a: ArrayData): Any = {
    if (a.numElements() != dim) return null
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (a.isNullAt(d)) return null
      v(d) = get(a, d)
      d += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var p = 0
      while (p < nPlanes) {
        val off = (t * nPlanes + p) * dim
        var s = 0.0
        var i = 0
        while (i < dim) { s += planes(off + i) * v(i); i += 1 }
        if (s >= 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSigs", this,
      classOf[HyperplaneSigs].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("sigRes")
      s"""
         |Object $res = $ref.compute($v);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}
