package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextFns

/** Gopher (Rae et al. 2021 §A1.1) and C4 (Raffel et al. 2020 §2.2)
  * rule-set pins: every field hand-computed on constructed documents, the
  * pass/fail boundary exercised from both sides, and the c4Clean transform
  * pinned against the same line set as the stats.
  */
class QualityRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gopherRow(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextFns.gopherStats(col("text")).as("st"))
      .select("st.*").collect()(0)
  }

  test("gopherStats fields match a hand computation") {
    // 20 words across 5 non-empty lines; two bullet lines, one
    // ellipsis-terminated line, two non-alpha words ("-"), one "..."
    val text = "the be to of and that have with extra words here\n" +
      "- aa bb\n- cc dd\nok line...\nplain"
    val r = gopherRow(text)
    assert(r.getLong(0) == 20L, "word_count")
    assert(r.getDouble(1) == 62.0 / 20, "mean_word_len")
    assert(r.getDouble(2) == 1.0 / 20, "symbol_ratio: one ellipsis")
    assert(r.getDouble(3) == 2.0 / 5, "bullet_frac")
    assert(r.getDouble(4) == 1.0 / 5, "ellipsis_frac")
    assert(r.getDouble(5) == 18.0 / 20, "alpha_frac")
    assert(r.getLong(6) == 8L, "all eight stop words present")
    assert(!r.getBoolean(7), "20 words < minWords -> fail")
  }

  test("gopherStats pass boundary from both sides") {
    val good = Seq.fill(5)(
      "the cat sat on and that have with mat dog").mkString(" ")
    val r = gopherRow(good)
    assert(r.getLong(0) == 50L && r.getDouble(1) == 3.2 &&
      r.getBoolean(7), r.toString)
    // same doc with a '#' tail every few words: symbol ratio over 0.1
    val hashy = good + " " + Seq.fill(6)("#").mkString(" ")
    val r2 = gopherRow(hashy)
    assert(r2.getDouble(2) == 6.0 / 56 && !r2.getBoolean(7),
      "symbol ratio 6/56 > 0.1 must fail: " + r2)
    // a symbol-free doc of only rare words: stop-hit rule fails
    val nostop = Seq.fill(50)("zebra").mkString(" ")
    val r3 = gopherRow(nostop)
    assert(r3.getLong(6) == 0L && !r3.getBoolean(7), r3.toString)
  }

  test("gopherStats empty and near-empty documents") {
    val r = gopherRow("")
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2) &&
      r.isNullAt(3) && r.getLong(6) == 0L && !r.getBoolean(7), r.toString)
  }

  test("c4Stats and c4Clean agree on the surviving line set") {
    import spark.implicits._
    val text = "this is a good long sentence.\nshort.\n" +
      "uses javascript on this line.\nno terminal punctuation here\n" +
      "another proper sentence with words tonight!"
    val r = Seq(text).toDF("text")
      .select(TextFns.c4Stats(col("text")).as("st"),
        TextFns.c4Clean(col("text")).as("clean"))
      .select(col("st.*"), col("clean")).collect()(0)
    assert(r.getLong(0) == 5L, "n_lines")
    assert(r.getLong(1) == 2L, "kept: first + last line only")
    assert(r.getLong(2) == 2L, "two terminal marks in the clean text")
    assert(!r.getBoolean(3) && !r.getBoolean(4))
    assert(!r.getBoolean(5), "2 sentences < 3 -> fail")
    assert(r.getString(6) == "this is a good long sentence.\n" +
      "another proper sentence with words tonight!")
  }

  test("tokenDivergence matches a hand computation and is " +
       "partition-invariant") {
    import spark.implicits._
    // A: "a a b" (p = 2/3, 1/3); B: "a b b b" (p = 1/4, 3/4);
    // corpus: a=3, b=4, V=2, T=7; q(a) = 4/9, q(b) = 5/9 (alpha = 1)
    val df = Seq(("A", "a a b"), ("B", "a b b b")).toDF("g", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextFns.tokenDivergence(d, "g", "text").collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .toMap
    val got = run(df)
    val qa = (3 + 1.0) / (7 + 1.0 * 2)
    val qb = (4 + 1.0) / (7 + 1.0 * 2)
    val pa = 2.0 / 3; val pb = 1.0 / 3
    val ceA = (0.0 + -(pa * math.log(qa))) + -(pb * math.log(qb))
    val klA = (0.0 + pa * math.log(pa / qa)) + pb * math.log(pb / qb)
    assert(got("A") == ((3L, 2L, ceA, klA)), got("A").toString)
    val pa2 = 1.0 / 4; val pb2 = 3.0 / 4
    val ceB = (0.0 + -(pa2 * math.log(qa))) + -(pb2 * math.log(qb))
    val klB = (0.0 + pa2 * math.log(pa2 / qa)) + pb2 * math.log(pb2 / qb)
    assert(got("B") == ((4L, 2L, ceB, klB)), got("B").toString)
    // KL of the corpus against itself-ish: a group matching the corpus
    // mixture has lower KL than one far from it
    assert(run(df.repartition(7)) == got,
      "divergence must be bitwise partition-invariant")
  }

  test("c4Stats page-level flags and the pass case") {
    import spark.implicits._
    def row(t: String) = Seq(t).toDF("text")
      .select(TextFns.c4Stats(col("text")).as("st")).select("st.*")
      .collect()(0)
    val good = "the first full sentence is long enough.\n" +
      "the second full sentence is also fine.\n" +
      "the third full sentence closes it out."
    val g = row(good)
    assert(g.getLong(1) == 3L && g.getLong(2) == 3L && g.getBoolean(5),
      g.toString)
    val lorem = row(good + "\nplus some Lorem Ipsum filler text here.")
    assert(lorem.getBoolean(3) && !lorem.getBoolean(5), lorem.toString)
    val brace = row(good + "\nvar x = { a: 1 } is code noise here.")
    assert(brace.getBoolean(4) && !brace.getBoolean(5), brace.toString)
    // the javascript line rule is case-insensitive
    val js = row(good + "\nthis line mentions JavaScript quite clearly.")
    assert(js.getLong(1) == 3L, "the JavaScript line must be dropped: " + js)
  }
}
