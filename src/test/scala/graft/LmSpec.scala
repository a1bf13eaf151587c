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

  test("Stupid Backoff: counts, cascade, and OOV floor match hand computation") {
    import spark.implicits._
    val corpus = Seq((1L, "a b a"), (2L, "B a")).toDF("doc_id", "text")
    val grams = Lm.backoffCounts(corpus, "text", n = 2)
    val got = grams.collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map((1, "a") -> 3L, (1, "b") -> 2L,
      (2, "a b") -> 1L, (2, "b a") -> 2L), got.toString)
    val n = Lm.tokenTotal(grams)
    assert(n == 5L)
    val lnB = math.log(0.4)
    // seen bigrams: ratio against the context's ORD-1 count
    val docs = Seq((1L, "a b a"), (9L, "a c a"), (3L, "x")).toDF("doc_id", "text")
    val s = Lm.scoreDocsBackoff(docs, "doc_id", "text", grams, n = 2,
        totalTokens = n).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val d1 = (0.0 + math.log(1.0 / 3)) + math.log(2.0 / 2)
    assert(s(1L) == ((2L, d1, Some(d1 / 2))), s(1L).toString)
    // "a c a": (a,c) — c unseen even as a unigram -> OOV floor
    // ln(1/N) + ln(0.4); (c,a) — bigram unseen, unigram a seen ->
    // ln(3/N) + ln(0.4)
    val d9 = (0.0 + (math.log(1.0 / 5) + 1.0 * lnB)) +
      (math.log(3.0 / 5) + 1.0 * lnB)
    assert(s(9L) == ((2L, d9, Some(d9 / 2))), s(9L).toString)
    assert(s(3L) == ((0L, 0.0, None)), s(3L).toString)
    // n = 1 degenerates to the unigram MLE with the 1/N OOV floor
    val uni = Lm.scoreDocsBackoff(Seq((7L, "a z")).toDF("doc_id", "text"),
      "doc_id", "text", Lm.backoffCounts(corpus, "text", n = 1), n = 1,
      totalTokens = n).collect()(0)
    assert(uni.getLong(1) == 2L &&
      uni.getDouble(2) == (0.0 + math.log(3.0 / 5)) + math.log(1.0 / 5),
      uni.toString)
    // guards
    assertThrows[IllegalArgumentException](
      Lm.scoreDocsBackoff(docs, "doc_id", "text", grams, 2, 0L))
    assertThrows[IllegalArgumentException](Lm.backoffCounts(corpus, "text", 0))
  }

  test("Stupid Backoff ranks a seen-bigram doc above an unseen-bigram doc " +
       "where add-alpha INVERTS the ordering") {
    import spark.implicits._
    // "the" is a high-fan-out context (101 occurrences, 5 distinct
    // continuations); "zap" a singleton. Doc A's bigram IS in the corpus;
    // doc B's is not. Add-1 smoothing hands B the higher score (its
    // context "cat" has the tiny denominator 1 + |V|), penalizing the
    // actually-attested continuation — exactly the failure mode Stupid
    // Backoff's count ratios avoid.
    // fillers must be pure-letter words: the ascii tokenizer drops
    // anything failing ^[a-z]+$ (digits included)
    val sentences = Seq("the cat", "zap") ++
      Seq("xa", "xb", "xc", "xd").flatMap(w => Seq.fill(25)(s"the $w"))
    val corpus = sentences.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val docs = Seq((900L, "the cat"), (901L, "cat zap")).toDF("doc_id", "text")
    val grams = Lm.backoffCounts(corpus, "text", n = 2)
    val bo = Lm.scoreDocsBackoff(docs, "doc_id", "text", grams, n = 2,
        totalTokens = Lm.tokenTotal(grams))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(bo(900L) > bo(901L),
      s"backoff must rank the seen bigram higher: $bo")
    val addA = Lm.scoreDocs(docs, "doc_id", "text",
        Lm.ngramCounts(corpus, "text", n = 2), n = 2,
        vocab = Lm.vocabSize(corpus, "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(addA(900L) < addA(901L),
      s"this corpus is constructed so add-1 inverts the ordering: $addA")
  }

  test("persisted backoff model scores bit-identically and is self-describing") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val dirP = java.nio.file.Files.createTempDirectory("graft-lm")
    val dir = dirP.toString
    try {
      Lm.buildBackoffModel(docs, "text", dir, n = 3)
      val meta = spark.read.parquet(s"$dir/meta").collect()
      assert(meta.length == 1 && meta(0).getAs[Int]("n") == 3)
      val grams = Lm.backoffCounts(docs, "text", n = 3)
      val total = Lm.tokenTotal(grams)
      assert(meta(0).getAs[Long]("total_tokens") == total)
      val inline = Lm.scoreDocsBackoff(docs, "doc_id", "text", grams,
          n = 3, totalTokens = total)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val frozen = Lm.scoreDocsFromModel(spark, dir, docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(inline == frozen && frozen.nonEmpty,
        "frozen-artifact scoring must be bit-identical to inline")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("backoff sum_lp is position-order deterministic under repartitioning") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, (0 until 20).map(j => "w" + ('a' + ((i * 7 + j * 3) % 9)).toChar)
        .mkString(" ")))
      .toDF("doc_id", "text")
    val grams = Lm.backoffCounts(docs.filter(col("doc_id") <= 20), "text", n = 3)
    val total = Lm.tokenTotal(grams)
    def run(d: org.apache.spark.sql.DataFrame) =
      Lm.scoreDocsBackoff(d, "doc_id", "text", grams, n = 3,
          totalTokens = total)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = run(docs)
    val b = run(docs.repartition(13))
    assert(a == b, "backoff scores must be bitwise partition-invariant")
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
