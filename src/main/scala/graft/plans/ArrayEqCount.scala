package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expression: number of positions where two long arrays
  * hold equal values — the MinHash signature-agreement count that estimates
  * Jaccard similarity (agreement / k).
  *
  * The composable formulation `aggregate(zip_with(a, b, (x,y) => (x===y)
  * .cast(int)), 0, _+_)` runs interpreted: two lambda dispatches and boxing
  * per element, k elements per CANDIDATE PAIR — the row count the LSH
  * banding join emits, which is the largest intermediate of the dedup
  * pipeline. Same treatment as ShingleHash/DotProduct: one primitive loop
  * behind a codegen'd call.
  *
  * NULL if either array is NULL or lengths differ; NULL elements compare
  * as unequal (SQL `===` would yield NULL, but signature arrays are
  * containsNull=false by construction — the choice is moot for real
  * callers and total for hostile ones).
  */
case class ArrayEqCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"array_eq_count expects two array<bigint> columns, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "array_eq_count"

  def compute(l: ArrayData, r: ArrayData): java.lang.Integer = {
    val n = l.numElements()
    if (n != r.numElements()) return null
    var c = 0
    var i = 0
    while (i < n) {
      if (!l.isNullAt(i) && !r.isNullAt(i) && l.getLong(i) == r.getLong(i)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("arrayEqCount", this, classOf[ArrayEqCount].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val boxed = ctx.freshName("eqCnt")
      s"""
         |java.lang.Integer $boxed = $ref.compute($l, $r);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayEqCount =
    copy(left = newLeft, right = newRight)
}
