package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Canonicalize any time-like column to nanoseconds-since-epoch as a long —
  * the type adapter behind the event-time operators (sessionId, range-frame
  * rollings, range/interval joins), which compute on an integral time axis.
  *
  * The reference's time accessors operate on datetime64 natively
  * (siuba/ops/generics.py:187-236); a user's parquet may carry TIMESTAMP,
  * TIMESTAMP_NTZ, DATE, or an already-integral epoch column. This resolves
  * per input type at ANALYSIS time (no per-row dispatch):
  *   - LongType            → identity (caller's units preserved — a column
  *                           that is already epoch-nanos, -micros, etc.)
  *   - IntegerType         → widened to long, identity otherwise
  *   - Timestamp / NTZ     → internal micros-since-epoch × 1000 (no timezone
  *                           arithmetic: the stored instant converts as-is)
  *   - DateType            → internal days-since-epoch × 86_400e9
  *
  * All arms are a single primitive multiply in generated code, so the
  * expression stays inside whole-stage codegen.
  */
case class TimeToNanos(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | TimestampType | TimestampNTZType | DateType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"time_to_nanos expects an integral or time type, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "time_to_nanos"

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType                        => input.asInstanceOf[Long]
    case IntegerType                     => input.asInstanceOf[Int].toLong
    case TimestampType | TimestampNTZType => input.asInstanceOf[Long] * 1000L
    case DateType                        => input.asInstanceOf[Int] * 86400000000000L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case LongType                        => c
      case IntegerType                     => s"(long)($c)"
      case TimestampType | TimestampNTZType => s"($c) * 1000L"
      case DateType                        => s"((long)($c)) * 86400000000000L"
    })

  override protected def withNewChildInternal(newChild: Expression): TimeToNanos =
    copy(child = newChild)
}
