package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** ONE-PASS winnowed fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003)
  * of a text column: `array<struct<pos: bigint, fp: bigint>>` — the
  * selected gram start positions and their hashes, value-identical to
  * [[graft.ml.Dedup.winnowFingerprints]]'s composed reference form (which
  * stays as this expression's differential oracle):
  *
  *   - tokens = `split(trim(lower(text)), '\\s+')` (the
  *     [[ShingleHashMd5]] parity recipe: 0x20-only trim, UTF8String
  *     toLowerCase, Java split with limit −1);
  *   - gram hashes over `concat_ws(' ', slice(toks, i, n))`: the 60-bit
  *     md5 leaf (`xxLeaf=false`, [[Md5Digest.first60Gram]] — streamed
  *     bytes, same digest) or `xxhash64` seed 42 (`xxLeaf=true`,
  *     [[XXH64]] over the same gram bytes);
  *   - selection = the RIGHTMOST minimal hash of every w-length window,
  *     deduplicated in first-occurrence order (selections are
  *     monotonically non-decreasing, so neighbor-dedup == array_distinct);
  *     docs with n ≤ tokens < n+w−1 grams keep the single degenerate
  *     window (last occurrence of the global min); docs under n tokens
  *     yield an empty array.
  *
  * Why it exists: the composed form runs the gram transform, the
  * w-window slice/min/position transforms and the distinct on the
  * INTERPRETED higher-order-function path — per document, O(m·w) with a
  * hex-string hash stack per gram before round 18 and a per-gram string
  * build after it. This is the whole selection as one tight codegen'd
  * loop: tokens encoded once, digests streamed, O(m) monotonic-deque
  * window minima.
  */
case class WinnowFps(child: Expression, n: Int, w: Int, xxLeaf: Boolean)
    extends UnaryExpression {
  require(n >= 1 && w >= 1, "n and w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "winnow_fps"

  def compute(text: UTF8String): ArrayData = {
    val s = text.trim().toLowerCase.toString
    val toks = s.split("\\s+", -1)
    val T = toks.length
    val m = T - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // token UTF-8 bytes once; gram hashes streamed from them
    val tb = new Array[Array[Byte]](T)
    var t = 0
    while (t < T) {
      tb(t) = toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      t += 1
    }
    val h = new Array[Long](m)
    if (xxLeaf) {
      var buf = new Array[Byte](64)
      var i = 0
      while (i < m) {
        var len = 0
        var j = 0
        while (j < n) {
          val b = tb(i + j)
          val need = len + b.length + 1
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (j > 0) { buf(len) = 0x20.toByte; len += 1 }
          System.arraycopy(b, 0, buf, len, b.length)
          len += b.length
          j += 1
        }
        h(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
        i += 1
      }
    } else {
      var i = 0
      while (i < m) { h(i) = Md5Digest.first60Gram(tb, i, n); i += 1 }
    }
    // winnow selection
    val selIdx = new Array[Int](m)
    var nSel = 0
    if (m < w) {
      // one degenerate window: LAST occurrence of the global min
      var best = 0
      var i = 1
      while (i < m) { if (h(i) <= h(best)) best = i; i += 1 }
      selIdx(0) = best
      nSel = 1
    } else {
      // monotonic deque of candidate indices: popping on `>=` keeps the
      // RIGHTMOST occurrence of each value level, so the front is the
      // window's rightmost minimal hash; selections are non-decreasing,
      // so skip-if-same-as-last IS array_distinct
      val dq = new Array[Int](m)
      var head = 0
      var tail = 0
      var last = -1
      var j = 0
      while (j < m) {
        while (tail > head && h(dq(tail - 1)) >= h(j)) tail -= 1
        dq(tail) = j
        tail += 1
        val start = j - w + 1
        if (start >= 0) {
          while (dq(head) < start) head += 1
          val sel = dq(head)
          if (sel != last) { selIdx(nSel) = sel; nSel += 1; last = sel }
        }
        j += 1
      }
    }
    val out = new Array[Any](nSel)
    var k = 0
    while (k < nSel) {
      val r = new GenericInternalRow(2)
      r.setLong(0, selIdx(k).toLong)
      r.setLong(1, h(selIdx(k)))
      out(k) = r
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFps", this,
      classOf[WinnowFps].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFps = copy(child = newChild)
}
