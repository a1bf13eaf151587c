package graft.plans

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Exponentially weighted mean as a custom Catalyst window function —
  * pandas `Series.ewm(alpha).mean()` (reference scope: siuba inherits ewm
  * from pandas but has no SQL translation; rolling/cumulative verbs are the
  * closest surface, generics.py:241-255).
  *
  * The recursion m_t = (1-a)*m_{t-1} + a*x_t has no closed window-aggregate
  * form that is numerically safe (the factored cumsum needs a^{-i} terms
  * that overflow), so it is expressed the way Spark implements running
  * aggregates natively: a DECLARATIVE AggregateWindowFunction whose state
  * updates once per row over the running frame (UNBOUNDED PRECEDING ..
  * CURRENT ROW). One pass per partition, no extra shuffle beyond the window
  * sort, works on any partition size — the scan is sequential WITHIN a
  * group, exactly like every other ordered window.
  *
  * Semantics (pandas-compatible):
  *   - `adjust = false`: m_0 = x_0; m_t = (1-a)*m_{t-1} + a*x_t.
  *   - `adjust = true`:  m_t = num_t / den_t with num_t = x_t +
  *     (1-a)*num_{t-1}, den_t = 1 + (1-a)*den_{t-1} (the bias-corrected
  *     weighted average pandas defaults to).
  *   - NULL x: state is carried unchanged and NULL rows output the current
  *     mean (pandas `ignore_na=True` decay behavior).
  * Rows before the first non-NULL x evaluate to NULL.
  */
case class EwmMean(x: Expression, alpha: Double, adjust: Boolean)
    extends AggregateWindowFunction {

  require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")

  override def children: Seq[Expression] = Seq(x)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewm_mean"

  private val keep = Literal(1.0 - alpha)
  private val a = Literal(alpha)

  private lazy val num = AttributeReference("num", DoubleType, nullable = true)()
  private lazy val den = AttributeReference("den", DoubleType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(num, den)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType), Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val xd = x
    if (adjust) Seq(
      If(IsNull(xd), num,
        Add(xd, Multiply(keep, Coalesce(Seq(num, Literal(0.0)))))),
      If(IsNull(xd), den, Add(Literal(1.0), Multiply(keep, den))))
    else Seq(
      If(IsNull(xd), num,
        If(IsNull(num), xd, Add(Multiply(keep, num), Multiply(a, xd)))),
      den)
  }

  override lazy val evaluateExpression: Expression =
    if (adjust) If(EqualTo(den, Literal(0.0)), Literal(null, DoubleType),
      Divide(num, den))
    else num

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EwmMean = copy(x = newChildren(0))
}
