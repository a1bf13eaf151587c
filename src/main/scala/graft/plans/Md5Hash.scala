package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Direct-from-digest forms of the repo's SQL-portable md5 hashes.
  *
  * The portable hash convention (shared verbatim with the DuckDB oracles)
  * is `conv(substring(md5(x), 1, 15), 16, 10)` — the first 15 hex chars of
  * the md5 digest parsed back to a 60-bit nonnegative long — and its
  * 64-bit sibling built from two 8-hex-char halves. Composed from
  * built-ins, every hash pays for a 32-char hex string materialization, a
  * substring slice and a base-16 string parse ON TOP of the digest; on the
  * shingle path that stack runs once per word n-gram of the corpus. These
  * expressions compute the IDENTICAL values straight from the digest
  * bytes: the first 15 hex chars are the first 60 bits, i.e.
  * (big-endian first 8 bytes) >>> 4, and the first 16 hex chars are the
  * big-endian first 8 bytes as a signed long. Whole-stage-codegen'd
  * (one method call per row), thread-local MessageDigest (no per-row
  * allocation).
  */
private[graft] object Md5Digest {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private def pack64(dig: Array[Byte]): Long =
    ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
      ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
      ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
  /** Big-endian signed long of the first 8 digest bytes of md5(bytes). */
  def first64(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    pack64(d.digest(bytes))
  }
  /** The 60-bit portable hash: first 15 md5 hex chars as a long. */
  def first60(bytes: Array[Byte]): Long = first64(bytes) >>> 4
  /** [[first64]] of the gram string `toks(from) ' ' … toks(from+n-1)` with
    * the token UTF-8 bytes STREAMED through the digest — md5 over the
    * identical byte sequence, without building the gram string (or its
    * byte array) per gram. */
  def first64Gram(toks: Array[Array[Byte]], from: Int, n: Int): Long = {
    val d = md.get()
    d.reset()
    var j = 0
    while (j < n) {
      if (j > 0) d.update(0x20.toByte)
      d.update(toks(from + j))
      j += 1
    }
    pack64(d.digest())
  }
  /** [[first60]] of the same streamed gram bytes. */
  def first60Gram(toks: Array[Array[Byte]], from: Int, n: Int): Long =
    first64Gram(toks, from, n) >>> 4
}

private[graft] trait Md5HashInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    self.child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string or binary column, " +
          s"got ${other.catalogString}")
    }
  protected def inputBytes(input: Any): Array[Byte] = input match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }
}

/** `conv(substring(md5(x), 1, 15), 16, 10) :: long` from the digest bytes:
  * the 60-bit nonnegative SQL-portable hash (graft.ops.Sketch.portableHash,
  * TextFns.shingleHashesPortable's per-gram leaf). */
case class Md5Hash60(child: Expression)
    extends UnaryExpression with Md5HashInput {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"
  override def nullSafeEval(input: Any): Any =
    Md5Digest.first60(inputBytes(input))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5h60", this, classOf[Md5Hash60].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalBytes($c);")
  }
  def evalBytes(input: Any): Long = Md5Digest.first60(inputBytes(input))
  override protected def withNewChildInternal(
      newChild: Expression): Md5Hash60 = copy(child = newChild)
}

/** `(conv(substring(md5(x),1,8),16,10) << 32) | conv(substring(md5(x),9,8),
  * 16,10)` from the digest bytes: the full signed-64-bit portable hash
  * (TextFns.portableHash64 — oracle-reproducible simhash's token leaf). */
case class Md5Hash64(child: Expression)
    extends UnaryExpression with Md5HashInput {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash64"
  override def nullSafeEval(input: Any): Any =
    Md5Digest.first64(inputBytes(input))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5h64", this, classOf[Md5Hash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalBytes($c);")
  }
  def evalBytes(input: Any): Long = Md5Digest.first64(inputBytes(input))
  override protected def withNewChildInternal(
      newChild: Expression): Md5Hash64 = copy(child = newChild)
}

/** One-pass SQL-PORTABLE shingle hashes — the md5 sibling of
  * [[ShingleHash]]: distinct 60-bit md5 word n-gram hashes of a text
  * column, value-identical to the composed
  * `array_distinct(transform(grams, g -> conv(substring(md5(g),1,15),16,10)))`
  * over `transform(sequence(...), i -> concat_ws(' ', element_at(w, i+j)…))`
  * grams of `split(lower(trim(text)), '\s+')` (TextFns.shingleHashesPortable's
  * reference formulation, kept as its differential oracle). The composed
  * form runs on the interpreted higher-order-function path and pays a hex
  * string + substring + base-16 parse per gram; this expression tokenizes
  * once, builds each gram string once, digests it, and takes the 60 bits
  * straight from the digest — inside whole-stage codegen.
  *
  * Exact-parity notes: tokens are `trim(' ')`-then-lowercase split on
  * `\s+` with Java's keep-trailing-empties limit −1 (SQL split semantics —
  * a leading tab yields a leading "" token, exactly like the composed
  * form); docs with fewer than n tokens yield an EMPTY array (the
  * composed form's `otherwise(array())` — unlike the xxhash64
  * [[ShingleHash]], which hashes the whole short sequence); distinct
  * preserves FIRST-OCCURRENCE order (array_distinct semantics).
  */
case class ShingleHashMd5(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_md5 expects a string column, " +
        s"got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_md5"

  def compute(text: UTF8String): ArrayData = {
    // trim (0x20 only) then lower, matching lower(trim(text)); split with
    // limit -1 = SQL split (keeps interior/trailing empties the regex
    // does not consume)
    val s = text.trim().toLowerCase.toString
    val toks = s.split("\\s+", -1)
    val m = toks.length - n + 1
    if (m <= 0)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](Math.min(m, 1024))
    val out = new Array[Long](m)
    var w = 0
    // encode each token's UTF-8 bytes ONCE and stream them through the
    // digest per gram — the old shape rebuilt the gram string AND its
    // byte array for every gram (n token re-encodes per position)
    val tb = new Array[Array[Byte]](toks.length)
    var t = 0
    while (t < toks.length) {
      tb(t) = toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      t += 1
    }
    var i = 0
    while (i < m) {
      val h = Md5Digest.first60Gram(tb, i, n)
      if (seen.add(h)) { out(w) = h; w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) out else java.util.Arrays.copyOf(out, w))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashMd5", this,
      classOf[ShingleHashMd5].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashMd5 = copy(child = newChild)
}
