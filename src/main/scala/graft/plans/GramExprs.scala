package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass codegen'd forms of the LM module's tokenize / gram-builder
  * expressions. The composed originals (split + two array filters; nested
  * transform/sequence/slice/array_join lambdas) are correct but run on
  * Spark's INTERPRETED higher-order-function path: per-element lambda
  * dispatch, a fresh slice array and join buffer per gram, per-position
  * struct builders. Each expression here produces VALUE-IDENTICAL output
  * (the composed forms stay in Lm as differential oracles, pinned by
  * LmSpec) in one tight loop per row, inside whole-stage codegen. Gram
  * strings and token order are bit-identical by construction — every gram
  * is the ' '-join of the same token slice.
  */
private[graft] object GramBuild {
  val SPACE: UTF8String = UTF8String.fromString(" ")

  /** trim(0x20) + lowercase + split("\\s+", -1), keeping only `^[a-z]+$`
    * words when asciiOnly (Lm.tokens' exact token classes — the empty
    * string fails `+` and drops either way). */
  def tokens(text: UTF8String, asciiOnly: Boolean): Array[UTF8String] = {
    val s = text.trim().toLowerCase.toString
    val raw = s.split("\\s+", -1)
    val out = new Array[UTF8String](raw.length)
    var w = 0
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      var ok = t.length > 0
      if (ok && asciiOnly) {
        var j = 0
        while (ok && j < t.length) {
          val c = t.charAt(j)
          if (c < 'a' || c > 'z') ok = false
          j += 1
        }
      }
      if (ok) { out(w) = UTF8String.fromString(t); w += 1 }
      i += 1
    }
    if (w == raw.length) out else java.util.Arrays.copyOf(out, w)
  }

  /** ' '-join of toks[from..to] (inclusive 0-based) — array_join(slice). */
  def join(toks: ArrayData, from: Int, to: Int): UTF8String = {
    if (from > to) return UTF8String.EMPTY_UTF8
    val parts = new Array[UTF8String](to - from + 1)
    var i = from
    while (i <= to) { parts(i - from) = toks.getUTF8String(i); i += 1 }
    UTF8String.concatWs(SPACE, parts: _*)
  }
}

/** Lm.tokens as one expression: lowercase whitespace-split `^[a-z]+$`
  * words of a text column, in document order. */
case class AsciiWords(child: Expression, asciiOnly: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ascii_words expects a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ascii_words"
  def compute(text: UTF8String): ArrayData =
    new GenericArrayData(
      GramBuild.tokens(text, asciiOnly).asInstanceOf[Array[Any]])
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("asciiWords", this, classOf[AsciiWords].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): AsciiWords = copy(child = newChild)
}

private[graft] trait TokenArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    self.child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.catalogString}")
    }
}

/** Lm.gramExpr as one expression: the (ctx, w) n-grams of a token array —
  * ctx the n−1 preceding words ' '-joined ("" for unigrams), w the word at
  * the gram's end; fewer than n tokens yields an empty array. */
case class NGramPairs(child: Expression, n: Int)
    extends UnaryExpression with TokenArrayInput {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ctx", StringType, nullable = false),
    StructField("w", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "ngram_pairs"
  def compute(toks: ArrayData): ArrayData = {
    val sz = toks.numElements()
    val m = sz - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = new GenericInternalRow(Array[Any](
        GramBuild.join(toks, i, i + n - 2), toks.getUTF8String(i + n - 1)))
      i += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramPairs", this, classOf[NGramPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): NGramPairs = copy(child = newChild)
}

/** Lm.allGramExpr as one expression: every suffix-gram of orders 1..n as
  * (ord, gram), in the same ord-major order as the composed flatten. */
case class AllOrderGrams(child: Expression, n: Int)
    extends UnaryExpression with TokenArrayInput {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "all_order_grams"
  def compute(toks: ArrayData): ArrayData = {
    val sz = toks.numElements()
    var total = 0
    var o = 1
    while (o <= n) { if (sz >= o) total += sz - o + 1; o += 1 }
    val out = new Array[Any](total)
    var w = 0
    o = 1
    while (o <= n) {
      if (sz >= o) {
        var i = o - 1
        while (i < sz) {
          out(w) = new GenericInternalRow(Array[Any](
            o, GramBuild.join(toks, i - o + 1, i)))
          w += 1
          i += 1
        }
      }
      o += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("allOrderGrams", this,
      classOf[AllOrderGrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): AllOrderGrams = copy(child = newChild)
}

/** Lm.lookupExpr as one expression: per full-window position, the
  * numerator gram at every level o in 1..n and the denominator context at
  * every level o in 2..n — (pos, lvl, role, ord, gram) in the composed
  * num-then-den order. */
case class BackoffLookupGrams(child: Expression, n: Int)
    extends UnaryExpression with TokenArrayInput {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("lvl", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("ord", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "backoff_lookup_grams"
  private val roleN = UTF8String.fromString("n")
  private val roleD = UTF8String.fromString("d")
  def compute(toks: ArrayData): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val perPos = n + (n - 1)
    val out = new Array[Any]((sz - n + 1) * perPos)
    var w = 0
    var i = n - 1
    while (i < sz) {
      val pos = i - (n - 1)
      var o = 1
      while (o <= n) {
        out(w) = new GenericInternalRow(Array[Any](
          pos, o, roleN, o, GramBuild.join(toks, i - o + 1, i)))
        w += 1
        o += 1
      }
      o = 2
      while (o <= n) {
        out(w) = new GenericInternalRow(Array[Any](
          pos, o, roleD, o - 1, GramBuild.join(toks, i - o + 1, i - 1)))
        w += 1
        o += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("backoffLookup", this,
      classOf[BackoffLookupGrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BackoffLookupGrams = copy(child = newChild)
}

/** Lm.knLookupExprPivot as one expression: per full-window position the
  * 2n−1 pivoted KN probe rows (pos, role, k, gram) in the composed order —
  * ('a', n, top gram), ('F', n−1, top context), then per mid order o in
  * 2..n−1 ('n&#x6f;', o, gram) and ('G&#x6f;', o−1, context), then
  * ('u', 1, the word itself). */
case class KnLookupGrams(child: Expression, n: Int)
    extends UnaryExpression with TokenArrayInput {
  require(n >= 2, "n must be >= 2")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "kn_lookup_grams"
  private val roleA = UTF8String.fromString("a")
  private val roleF = UTF8String.fromString("F")
  private val roleU = UTF8String.fromString("u")
  private val roleNs = (0 to n).map(o => UTF8String.fromString(s"n$o")).toArray
  private val roleGs = (0 to n).map(o => UTF8String.fromString(s"G$o")).toArray
  def compute(toks: ArrayData): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val perPos = 2 * n - 1
    val out = new Array[Any]((sz - n + 1) * perPos)
    var w = 0
    var i = n - 1
    while (i < sz) {
      val pos = i - (n - 1)
      out(w) = new GenericInternalRow(Array[Any](
        pos, roleA, n, GramBuild.join(toks, i - n + 1, i)))
      w += 1
      out(w) = new GenericInternalRow(Array[Any](
        pos, roleF, n - 1, GramBuild.join(toks, i - n + 1, i - 1)))
      w += 1
      var o = 2
      while (o < n) {
        out(w) = new GenericInternalRow(Array[Any](
          pos, roleNs(o), o, GramBuild.join(toks, i - o + 1, i)))
        w += 1
        out(w) = new GenericInternalRow(Array[Any](
          pos, roleGs(o), o - 1, GramBuild.join(toks, i - o + 1, i - 1)))
        w += 1
        o += 1
      }
      out(w) = new GenericInternalRow(Array[Any](
        pos, roleU, 1, toks.getUTF8String(i)))
      w += 1
      i += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("knLookup", this, classOf[KnLookupGrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): KnLookupGrams = copy(child = newChild)
}
