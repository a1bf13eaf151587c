package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fns.Str

/** Differential tests for the string family: every column formulation is
  * compared against a JVM reference implementation of the Python/pandas
  * semantics on an adversarial corpus (unicode, repeats, adjacent
  * separators, boundary widths) — one Spark job for the whole matrix.
  * Example-based specs pin single values; this pins the FUNCTIONS.
  */
class StrPropsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // adversarial corpus: empties, whitespace runs, unicode, repeats,
  // sep-at-boundary, case soup — plus a deterministic pseudo-random tail
  private val corpus: Seq[String] = Seq(
    "", " ", "  ", "a", "ab", "abc", "a b", "a  b", " a b ",
    "aaa", "abab", "ababab", "xyx", "aXbXc", "XaXbX",
    "Hello World", "hELLO wORLD", "déjà vu déjà", "ümlaut Ünïcode",
    "tab\there", "new\nline", "a-b-c-d", "--a--", "-", "--",
    "0123456789", "  leading", "trailing  ", "MiXeD CaSe StRiNg"
  ) ++ (0 until 40).map { i =>
    val rnd = new scala.util.Random(i * 7919)
    (0 until rnd.nextInt(20)).map(_ => "abX -_Z".charAt(rnd.nextInt(7))).mkString
  }

  // Python reference semantics, computed on the JVM
  private def pyCount(s: String, sub: String): Long = {
    var i = 0; var n = 0L
    while ({ val j = s.indexOf(sub, i); if (j >= 0) { n += 1; i = j + sub.length; true } else false }) ()
    n
  }
  private def pyZfill(s: String, w: Int): String =
    if (s.length >= w) s else ("0" * (w - s.length)) + s
  private def pySlice(s: String, a: Int, b: Int): String = {
    val from = math.min(a, s.length); val to = math.min(math.max(b, from), s.length)
    s.substring(from, to)
  }
  private def pySliceReplace(s: String, a: Int, b: Int, r: String): String =
    s.substring(0, math.min(a, s.length)) + r + s.substring(math.min(b, s.length))
  private def pySwapcase(s: String): String =
    s.map(c => if (c.isUpper) c.toLower else if (c.isLower) c.toUpper else c)
  private def pyRsplit(s: String, sep: String, n: Int): Seq[String] = {
    // python str.rsplit with explicit sep: keep empties, at most n splits
    var parts = List.empty[String]
    var end = s.length; var splits = 0
    while (splits < n) {
      val j = s.lastIndexOf(sep, end - sep.length)
      if (j < 0 || end < sep.length) splits = n // stop
      else { parts = s.substring(j + sep.length, end) :: parts; end = j; splits += 1 }
    }
    s.substring(0, end) :: parts
  }
  private def pyLjust(s: String, w: Int, f: Char): String =
    if (s.length >= w) s else s + f.toString * (w - s.length)
  private def pyRjust(s: String, w: Int, f: Char): String =
    if (s.length >= w) s else f.toString * (w - s.length) + s

  test("str family matches Python reference semantics on adversarial corpus") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val subs = Seq("a", "b", "X", " ", "ab", "-", "déjà")
    val countCols = subs.zipWithIndex.map { case (sub, k) =>
      Str.strCount(col("s"), sub).as(s"cnt_$k") }
    val findCols = subs.zipWithIndex.flatMap { case (sub, k) =>
      Seq(Str.find(col("s"), sub).as(s"find_$k"),
          Str.rfind(col("s"), sub).as(s"rfind_$k")) }
    val rows = df.select(Seq(col("id"), col("s")) ++ countCols ++ findCols ++ Seq(
        Str.zfill(col("s"), 6).as("zf"),
        Str.slice(col("s"), 1, 4).as("sl"),
        Str.sliceReplace(col("s"), 1, 3, "QQ").as("sr"),
        Str.swapcase(col("s")).as("sw"),
        Str.ljust(col("s"), 5, ".").as("lj"),
        Str.rjust(col("s"), 5, ".").as("rj"),
        Str.rsplit(col("s"), "-", 1).as("rs")): _*)
      .collect()
    rows.foreach { r =>
      val s = r.getString(1)
      subs.zipWithIndex.foreach { case (sub, k) =>
        assert(r.getLong(r.fieldIndex(s"cnt_$k")) == pyCount(s, sub),
          s"count('$s','$sub')")
        assert(r.getLong(r.fieldIndex(s"find_$k")) == s.indexOf(sub).toLong,
          s"find('$s','$sub')")
        assert(r.getLong(r.fieldIndex(s"rfind_$k")) == s.lastIndexOf(sub).toLong,
          s"rfind('$s','$sub')")
      }
      assert(r.getString(r.fieldIndex("zf")) == pyZfill(s, 6), s"zfill('$s')")
      assert(r.getString(r.fieldIndex("sl")) == pySlice(s, 1, 4), s"slice('$s')")
      assert(r.getString(r.fieldIndex("sr")) == pySliceReplace(s, 1, 3, "QQ"),
        s"slice_replace('$s')")
      assert(r.getString(r.fieldIndex("sw")) == pySwapcase(s), s"swapcase('$s')")
      assert(r.getString(r.fieldIndex("lj")) == pyLjust(s, 5, '.'), s"ljust('$s')")
      assert(r.getString(r.fieldIndex("rj")) == pyRjust(s, 5, '.'), s"rjust('$s')")
      assert(r.getSeq[String](r.fieldIndex("rs")) == pyRsplit(s, "-", 1),
        s"rsplit('$s')")
    }
  }
}
