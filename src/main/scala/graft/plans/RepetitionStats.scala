package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: every repetition statistic the Gopher-style
  * corpus quality filters need (Rae et al. 2021, table A1), in one JVM pass
  * per document.
  *
  * The composable formulation — explode lines / n-grams, groupBy(doc, gram),
  * re-aggregate per doc — shuffles every line and every n-gram of a 100 TB
  * corpus THREE times (lines, paragraphs, each gram size). Repetition
  * filtering is a map-only decision per document, so it gets the same
  * treatment as CharStats/ShingleHash: per-row hash maps behind a codegen'd
  * call, zero shuffle.
  *
  * All outputs are exact INTEGER counts (fractions are left to the caller:
  * integer numerators/denominators survive an engine-to-engine hash compare
  * with no float discipline at all). Semantics, chosen to be exactly
  * mirrorable in portable SQL:
  *
  *   - lines: split on '\n' keeping ALL empty segments (Java
  *     `split("\n", -1)` == DuckDB `string_split`); a duplicate is any
  *     occurrence of a line already seen in the same document
  *     (`dup_lines` = occurrences − distinct), `dup_line_chars` counts the
  *     code points of those repeat occurrences; `line_chars` is the total
  *     over all occurrences (newlines excluded).
  *   - paras: same, splitting on runs of 2+ newlines (Java
  *     `Pattern.split(s, -1)` semantics == DuckDB `regexp_split_to_array`,
  *     both keep leading/trailing empties).
  *   - words: maximal runs of non-whitespace (Java regex `\s` class ==
  *     RE2 `\s`); empties dropped on both engines.
  *   - top-n-gram (per n in `topNs`): the most frequent word n-gram counted
  *     WITH overlap, ties broken by smallest gram in binary order (Java
  *     `compareTo` == DuckDB's binary collation on ASCII); emits its count
  *     and its code-point length (words joined by single spaces).
  *   - dup-n-gram (per n in `dupNs`): total code-point length of ALL
  *     occurrences of n-grams appearing 2+ times (the standard
  *     count*len formulation — positional coverage without double counting
  *     is not SQL-expressible; divergence documented).
  *
  * Reference scope: siuba has no corpus-quality layer; this extends the
  * engine for LLM training-data curation alongside TextFns.qualityScore.
  */
case class RepetitionStats(
    child: Expression,
    topNs: Seq[Int] = Seq(2, 3, 4),
    dupNs: Seq[Int] = Seq(5, 8)) extends UnaryExpression {

  require(topNs.nonEmpty || dupNs.nonEmpty, "at least one n-gram size")
  require((topNs ++ dupNs).forall(n => n >= 2 && n <= 16),
    "n-gram sizes must be in [2, 16]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(
    Seq(
      StructField("lines", LongType, nullable = false),
      StructField("dup_lines", LongType, nullable = false),
      StructField("line_chars", LongType, nullable = false),
      StructField("dup_line_chars", LongType, nullable = false),
      StructField("paras", LongType, nullable = false),
      StructField("dup_paras", LongType, nullable = false),
      StructField("para_chars", LongType, nullable = false),
      StructField("dup_para_chars", LongType, nullable = false),
      StructField("words", LongType, nullable = false),
      StructField("chars", LongType, nullable = false)) ++
    topNs.flatMap(n => Seq(
      StructField(s"top${n}gram_count", LongType, nullable = false),
      StructField(s"top${n}gram_len", LongType, nullable = false))) ++
    dupNs.map(n =>
      StructField(s"dup${n}gram_chars", LongType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  @inline private def isWs(c: Char): Boolean = // Java regex \s, exactly
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** (elements, dupElements, chars, dupChars) under first-seen-is-original
    * semantics; chars are code points of the segment.
    */
  private def dupStats(segs: Array[String]): (Long, Long, Long, Long) = {
    val seen = new java.util.HashMap[String, Integer](segs.length * 2)
    var dups = 0L; var chars = 0L; var dupChars = 0L
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      val cp = s.codePointCount(0, s.length).toLong
      chars += cp
      if (seen.putIfAbsent(s, 1) != null) { dups += 1; dupChars += cp }
      i += 1
    }
    (segs.length.toLong, dups, chars, dupChars)
  }

  /** split on single '\n', keeping all empty segments (split(sep, -1)). */
  private def splitLines(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0; var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\n') { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toArray
  }

  /** split on maximal runs of 2+ '\n', keeping all empty segments
    * (Pattern.split("\n{2,}", -1) semantics; single newlines stay inside
    * their paragraph).
    */
  private def splitParas(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0; var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\n' && i + 1 < s.length && s.charAt(i + 1) == '\n') {
        out += s.substring(start, i)
        i += 1
        while (i < s.length && s.charAt(i) == '\n') i += 1
        start = i
      } else i += 1
    }
    out += s.substring(start)
    out.toArray
  }

  private def splitWords(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      while (i < s.length && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < s.length && !isWs(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val (nl, dl, lc, dlc) = dupStats(splitLines(s))
    val (np, dp, pc, dpc) = dupStats(splitParas(s))
    val words = splitWords(s)
    val chars = s.codePointCount(0, s.length).toLong

    val vals = scala.collection.mutable.ArrayBuffer[Any](
      nl, dl, lc, dlc, np, dp, pc, dpc, words.length.toLong, chars)

    def gramCounts(n: Int): java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      val last = words.length - n
      val sb = new java.lang.StringBuilder()
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        m.merge(sb.toString, 1, (a, b) => a + b)
        i += 1
      }
      m
    }

    topNs.foreach { n =>
      val m = gramCounts(n)
      var bestC = 0; var bestG: String = null
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.intValue()
        if (c > bestC || (c == bestC && bestG != null && e.getKey.compareTo(bestG) < 0)) {
          bestC = c; bestG = e.getKey
        }
      }
      vals += bestC.toLong
      vals += (if (bestG == null) 0L
               else bestG.codePointCount(0, bestG.length).toLong)
    }

    dupNs.foreach { n =>
      val m = gramCounts(n)
      var dupChars = 0L
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.intValue()
        if (c >= 2)
          dupChars += c.toLong * e.getKey.codePointCount(0, e.getKey.length)
      }
      vals += dupChars
    }

    new GenericInternalRow(vals.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStats", this, classOf[RepetitionStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}
