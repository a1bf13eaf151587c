package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextFns

/** Differential tests: the one-pass CharStats formulation must be value-equal
  * to the regexp_replace/split composition it replaces, including the
  * whitespace artifacts of Spark's split() (empty string → [""], leading \t
  * → empty first element, 0x20-only trim).
  */
class CharStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val adversarial = Seq(
    "The quick brown fox. It jumped; high!",
    "",
    " ",
    "   ",
    "\t",
    "\tleading tab",
    "trailing tab\t",
    "a\t\tb",
    "ABC 123 .,!?;: def",
    "  spaces  around  ",
    "one",
    "UPPER lower 42 Mixed-Case, punct: yes; digits 007!",
    "tab\tnewline\nmix \t \n x",
    "Ünïcodé ÀÉÎ text ß ss",
    " nbsp is not regex-ws",
    "emoji 😀 and 𝔘𝔫𝔦 supplementary",
    "a.b,c!d?e;f:g",
    "1234567890",
    "....::::",
    "x " * 50
  )

  test("CharStats fields equal the regex formulations on adversarial inputs") {
    val df = adversarial.toDF("text")
    val both = df.select(
      TextFns.tokenCount(col("text")).as("t1"),
      TextFns.tokenCountComposed(col("text")).as("t2"),
      TextFns.punctRatio(col("text")).as("p1"),
      TextFns.punctRatioComposed(col("text")).as("p2"),
      TextFns.digitRatio(col("text")).as("d1"),
      TextFns.digitRatioComposed(col("text")).as("d2"),
      TextFns.upperRatio(col("text")).as("u1"),
      TextFns.upperRatioComposed(col("text")).as("u2"),
      TextFns.meanTokenLen(col("text")).as("m1"),
      TextFns.meanTokenLenComposed(col("text")).as("m2"),
      TextFns.qualityScore(col("text")).as("q1"),
      TextFns.qualityScoreComposed(col("text")).as("q2"),
      col("text"))
    both.collect().foreach { r =>
      val txt = r.getString(12)
      assert(r.getInt(0) == r.getInt(1), s"tokenCount mismatch on ${txt.take(40)}")
      for (i <- Seq(2, 4, 6, 8, 10))
        assert(r.getDouble(i) == r.getDouble(i + 1),
          s"col $i mismatch on '${txt.take(40)}': ${r.getDouble(i)} vs ${r.getDouble(i + 1)}")
    }
  }

  test("null text yields identical (zero-ratio) results in both formulations") {
    val df = Seq[(Integer, String)]((1, null), (2, "real text here ok")).toDF("id", "text")
    val rows = df.select(
      TextFns.qualityScore(col("text")).as("q1"),
      TextFns.qualityScoreComposed(col("text")).as("q2"),
      TextFns.punctRatio(col("text")).as("p1"),
      TextFns.punctRatioComposed(col("text")).as("p2")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("charStats counts on a known string") {
    val r = Seq("Ab1. x\ty").toDF("text")
      .select(TextFns.charStats(col("text")).as("st"))
      .select("st.chars", "st.tokens", "st.nonws", "st.punct", "st.digits", "st.upper")
      .head()
    // "Ab1. x\ty": 8 chars, tokens = ["ab1.", "x", "y"] = 3,
    // nonws = 6, punct = 1 ('.'), digits = 1, upper = 1
    assert(r.getInt(0) == 8 && r.getInt(1) == 3 && r.getInt(2) == 6
      && r.getInt(3) == 1 && r.getInt(4) == 1 && r.getInt(5) == 1)
  }

  test("qualityScore stays in whole-stage codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(TextFns.qualityScore(col("text")).as("q"))
    // the "*(n)" operator prefix marks membership in a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.filter(col("q") >= 0.0).count() > 0)
  }
}
