package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: distinct 64-bit word n-gram shingle hashes of
  * a text column in ONE tight pass — the innermost loop of corpus-scale
  * dedup (Jaccard, MinHash, LSH all consume it).
  *
  * The composable formulation (array_distinct ∘ transform ∘ sequence ∘
  * slice over split tokens) is correct but runs on Spark's interpreted
  * higher-order-function path: per-shingle lambda dispatch, per-slice array
  * allocation, per-shingle string building. This expression tokenizes once,
  * hashes each token once (XXH64 over its UTF-8 bytes), and derives each
  * shingle hash by chaining the n token hashes — zero per-shingle strings,
  * primitive long arrays throughout, and `doGenCode` keeps it inside
  * whole-stage codegen (one method call per row).
  *
  * Semantics match `TextFns.tokens` (trim-spaces + lowercase + split on
  * `\s+`); docs shorter than n yield one hash of the whole token sequence.
  * Only hash equality classes matter to consumers, and they are identical
  * to hashing the shingle strings (modulo 64-bit collisions).
  */
case class ShingleHash(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hash expects a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash"

  def compute(text: UTF8String): ArrayData = {
    // trim(lower(text)) then split("\s+"): replicate Spark's trim (strips
    // 0x20 only) so tokenization classes are identical to TextFns.tokens
    val s = text.toLowerCase.toString
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val toks = s.substring(lo, hi).split("\\s+", -1)
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val b = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      th(i) = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      i += 1
    }
    val m = th.length - n + 1
    val out =
      if (m <= 0) { // short doc: one hash of the whole token-hash sequence
        var h = 42L
        var j = 0
        while (j < th.length) { h = XXH64.hashLong(th(j), h); j += 1 }
        Array(h)
      } else {
        val hs = new Array[Long](m)
        var p = 0
        while (p < m) {
          var h = 42L
          var j = 0
          while (j < n) { h = XXH64.hashLong(th(p + j), h); j += 1 }
          hs(p) = h
          p += 1
        }
        // distinct via sort + squash (order is irrelevant to consumers)
        java.util.Arrays.sort(hs)
        var w = 1
        var r = 1
        while (r < m) {
          if (hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
          r += 1
        }
        if (w == m) hs else java.util.Arrays.copyOf(hs, w)
      }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHash", this, classOf[ShingleHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}
