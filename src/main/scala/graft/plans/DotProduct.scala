package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expression: dot product of two numeric array columns in
  * one primitive loop.
  *
  * The composable formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * correct but runs on Spark's interpreted higher-order-function path: two
  * lambda dispatches and a boxed accumulator per element. Embedding math
  * evaluates dims × planes × rows of those — the inner loop of every
  * similarity/ANN operator — so it gets the same treatment as ShingleHash:
  * a tight typed loop behind one codegen'd call per row.
  *
  * Null semantics match the composed form: NULL if either array is NULL,
  * any element is NULL, or lengths differ (zip_with pads with NULL, which
  * poisons the interpreted sum).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"dot_product expects two numeric arrays, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  @transient private lazy val leftGet: (ArrayData, Int) => Double =
    getter(elemType(left))
  @transient private lazy val rightGet: (ArrayData, Int) => Double =
    getter(elemType(right))

  private def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case DoubleType => (a, i) => a.getDouble(i)
    case FloatType  => (a, i) => a.getFloat(i).toDouble
    case LongType   => (a, i) => a.getLong(i).toDouble
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case ShortType  => (a, i) => a.getShort(i).toDouble
    case ByteType   => (a, i) => a.getByte(i).toDouble
    case d: DecimalType => (a, i) => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(
      s"dot_product: unsupported element type ${other.catalogString}")
  }

  def compute(l: ArrayData, r: ArrayData): java.lang.Double = {
    val n = l.numElements()
    if (n != r.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return null
      acc += leftGet(l, i) * rightGet(r, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotProduct", this, classOf[DotProduct].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val boxed = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $boxed = $ref.compute($l, $r);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
