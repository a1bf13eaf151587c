package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Lm

class LmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bigram counts, vocab, and add-1 scores match a hand computation") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b a"),
      (2L, "B a"),          // lowercased -> b a
      (3L, "123 !!")        // no ascii words
    ).toDF("doc_id", "text")
    val grams = Lm.ngramCounts(corpus, "text", n = 2)
    val got = grams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "a") -> 2L), got.toString)
    assert(Lm.vocabSize(corpus, "text") == 2L)
    // ctx counts: a -> 1, b -> 2; V = 2, alpha = 1
    def lp(cnt: Long, ctxCnt: Long): Double =
      math.log((cnt + 1.0) / (ctxCnt + 1.0 * 2))
    val scores = Lm.scoreDocs(corpus, "doc_id", "text", grams, n = 2,
        vocab = 2L).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), if (r.isNullAt(3)) None
         else Some(r.getDouble(3)))).toMap
    val d1 = (0.0 + lp(1, 1)) + lp(2, 2) // (a,b) pos0 then (b,a) pos1
    assert(scores(1L) == ((2L, d1, Some(d1 / 2))), scores(1L).toString)
    val d2 = 0.0 + lp(2, 2)
    assert(scores(2L) == ((1L, d2, Some(d2))), scores(2L).toString)
    assert(scores(3L) == ((0L, 0.0, None)), scores(3L).toString)
    // scoring a NEW document against the frozen model: unseen gram under a
    // seen context, and a fully unseen context (scores exactly -ln V)
    val novel = Seq((9L, "a c a")).toDF("doc_id", "text")
    val s9 = Lm.scoreDocs(novel, "doc_id", "text", grams, n = 2, vocab = 2L)
      .collect()(0)
    val expect9 = (0.0 + lp(0, 1)) + math.log((0 + 1.0) / (0 + 1.0 * 2))
    assert(s9.getLong(1) == 2L && s9.getDouble(2) == expect9, s9.toString)
    // guards
    assertThrows[IllegalArgumentException](
      Lm.scoreDocs(corpus, "doc_id", "text", grams, n = 2, vocab = 0L))
    assertThrows[IllegalArgumentException](Lm.ngramCounts(corpus, "text", 0))
  }

  test("sum_lp is position-order deterministic under repartitioning") {
    import spark.implicits._
    // 40 docs of shuffled shared words: the per-doc fold must not depend
    // on partitioning or join output order
    val docs = (1L to 40L).map(i =>
      (i, (0 until 20).map(j => "w" + ('a' + ((i * 7 + j * 3) % 9)).toChar)
        .mkString(" ")))
      .toDF("doc_id", "text")
    val grams = Lm.ngramCounts(docs, "text", n = 2)
    val v = Lm.vocabSize(docs, "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Lm.scoreDocs(d, "doc_id", "text", grams, n = 2, vocab = v)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = run(docs)
    val b = run(docs.repartition(13))
    assert(a == b, "scores must be bitwise partition-invariant")
  }
}
