package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: every character-class count that text quality
  * scoring needs, in ONE pass over the string.
  *
  * The composable formulation computes each ratio as
  * `length(regexp_replace(text, "[^…]", ""))` — a full regex-engine scan
  * PLUS a result-string allocation per metric, so a 5-check quality score
  * rescans (and re-copies) every document five-plus times. Quality filtering
  * is the first pass of a 100 TB corpus pipeline — it touches every byte of
  * the corpus — so it gets the same treatment as ShingleHash/DotProduct: one
  * tight loop behind a codegen'd call.
  *
  * Output struct (all counts over Unicode code points, matching Spark's
  * `length`):
  *   - chars:  total code points
  *   - tokens: `size(split(trim(text), "\\s+"))` replicated exactly — the
  *             0x20-only trim, the `[""]` artifact of an empty/all-space
  *             string (counts 1), and the empty elements Pattern.split(s,-1)
  *             keeps when the trimmed string starts/ends with non-space
  *             whitespace
  *   - nonws:  code points outside Java regex `\s` = [ \t\n\x0B\f\r]
  *   - punct:  of `.,!?;:`
  *   - digits: of 0-9
  *   - upper:  of A-Z
  *
  * Differential-tested against the regexp_replace formulation
  * (TextFns.*Composed) including the whitespace/empty edge cases.
  */
case class CharStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_stats expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("chars", IntegerType, nullable = false),
    StructField("tokens", IntegerType, nullable = false),
    StructField("nonws", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("digits", IntegerType, nullable = false),
    StructField("upper", IntegerType, nullable = false)))

  override def prettyName: String = "char_stats"

  @inline private def isWs(c: Char): Boolean = // Java regex \s, exactly
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val len = s.length
    var chars = 0; var nonws = 0; var punct = 0; var digits = 0; var upper = 0
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      chars += 1
      if (!(cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B
            || cp == '\f' || cp == '\r')) nonws += 1
      if (cp == '.' || cp == ',' || cp == '!' || cp == '?' || cp == ';' || cp == ':')
        punct += 1
      else if (cp >= '0' && cp <= '9') digits += 1
      else if (cp >= 'A' && cp <= 'Z') upper += 1
      i += Character.charCount(cp)
    }
    // tokens: replicate size(split(trim(s), "\s+")) — trim strips 0x20 only
    var lo = 0; var hi = len
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var tokens = 0
    if (lo >= hi) tokens = 1 // split("") = [""]
    else {
      // Spark's split = Pattern.split(s, -1): empties are KEPT, so a
      // leading or trailing \s run each contribute an empty element
      if (isWs(s.charAt(lo))) tokens += 1
      if (isWs(s.charAt(hi - 1))) tokens += 1
      var inRun = false
      var j = lo
      while (j < hi) {
        if (!isWs(s.charAt(j))) { if (!inRun) { tokens += 1; inRun = true } }
        else inRun = false
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](chars, tokens, nonws, punct, digits, upper))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charStats", this, classOf[CharStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}
