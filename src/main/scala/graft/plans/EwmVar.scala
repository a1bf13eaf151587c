package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Exponentially weighted variance as a custom Catalyst window function —
  * pandas `Series.ewm(alpha, adjust=True).var()` (reference scope: siuba
  * inherits ewm from pandas with no SQL translation, generics.py:241-255;
  * see [[EwmMean]] for why this is a declarative AggregateWindowFunction).
  *
  * State is the four exponentially decayed sums the pandas formula needs:
  *   sw  = Σ w_i          swx  = Σ w_i·x_i
  *   sw2 = Σ w_i²         swx2 = Σ w_i·x_i²
  * with w_i = (1-a)^(steps since observation i). Per non-NULL row:
  *   sw ← 1 + (1-a)·sw        swx  ← x + (1-a)·swx
  *   sw2 ← 1 + (1-a)²·sw2     swx2 ← x² + (1-a)·swx2
  * NULL x carries all state unchanged (pandas `ignore_na=True` decay).
  *
  * Output (`bias = false`, the pandas default) applies the reliability
  * correction sw²/(sw²−sw2):
  *   var = (swx2/sw − (swx/sw)²) · sw²/(sw²−sw2)
  * which is NULL while sw² == sw2 (fewer than two effective observations —
  * covers both the first row and the no-data case). `bias = true` returns
  * the plain weighted second moment swx2/sw − (swx/sw)².
  *
  * Every arithmetic op here is replayed verbatim by the generated DuckDB
  * recursive-CTE oracle (q_ewm_var) — identical IEEE ops in identical
  * order are bit-exact across engines, so the raw doubles hash-match.
  */
case class EwmVar(x: Expression, alpha: Double, bias: Boolean)
    extends AggregateWindowFunction {

  require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")

  override def children: Seq[Expression] = Seq(x)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewm_var"

  private val keep = Literal(1.0 - alpha)
  private val keepSq = Literal((1.0 - alpha) * (1.0 - alpha))

  private lazy val sw = AttributeReference("sw", DoubleType, nullable = false)()
  private lazy val swx = AttributeReference("swx", DoubleType, nullable = false)()
  private lazy val sw2 = AttributeReference("sw2", DoubleType, nullable = false)()
  private lazy val swx2 = AttributeReference("swx2", DoubleType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sw, swx, sw2, swx2)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0.0), Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val xd = x
    Seq(
      If(IsNull(xd), sw, Add(Literal(1.0), Multiply(keep, sw))),
      If(IsNull(xd), swx, Add(xd, Multiply(keep, swx))),
      If(IsNull(xd), sw2, Add(Literal(1.0), Multiply(keepSq, sw2))),
      If(IsNull(xd), swx2, Add(Multiply(xd, xd), Multiply(keep, swx2))))
  }

  override lazy val evaluateExpression: Expression = {
    val m = Divide(swx, sw)
    val vb = Subtract(Divide(swx2, sw), Multiply(m, m))
    val swSq = Multiply(sw, sw)
    // bias=true is defined from one observation on (pandas yields 0.0 for
    // the first row); the corrected form needs sw² > sw2 (≥ 2 effective obs)
    if (bias)
      If(EqualTo(sw, Literal(0.0)), Literal(null, DoubleType), vb)
    else
      If(EqualTo(swSq, sw2), Literal(null, DoubleType),
        Multiply(vb, Divide(swSq, Subtract(swSq, sw2))))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EwmVar = copy(x = newChildren(0))
}
