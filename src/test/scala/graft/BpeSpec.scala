package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // in-memory reference BPE (Sennrich et al. algorithm 1) for differentials
  private def greedyMerge(ts: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]; var i = 0
    while (i < ts.size) {
      if (i < ts.size - 1 && ts(i) == l && ts(i + 1) == r) { b += (l + r); i += 2 }
      else { b += ts(i); i += 1 }
    }
    b.result()
  }

  private def refTrain(wordCounts: Map[String, Long],
                       n: Int): Seq[(Long, String, String, Long)] = {
    var words = wordCounts.toVector.map { case (w, c) =>
      (w.map(_.toString).toVector :+ "</w>", c) }
    val out = Vector.newBuilder[(Long, String, String, Long)]
    var rank = 1L
    var stop = false
    while (rank <= n && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((ts, c) <- words; i <- 0 until ts.size - 1)
        counts((ts(i), ts(i + 1))) = counts.getOrElse((ts(i), ts(i + 1)), 0L) + c
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), f) = counts.toSeq
          .sortBy { case ((l, r), f) => (-f, l, r) }.head
        out += ((rank, l, r, f))
        words = words.map { case (ts, c) => (greedyMerge(ts, l, r), c) }
        rank += 1
      }
    }
    out.result()
  }

  test("train matches the reference algorithm on the Sennrich-style corpus") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest widest",
      "widest widest").toDF("text")
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val expect = refTrain(wc, 8)
    val got = Bpe.train(corpus, "text", nMerges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    // the canonical first merges: 'es' (9 = newest 6 + widest 3) then 'est'
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._4 == 9L)
    assert(got(1)._2 == "es" && got(1)._3 == "t")
  }

  test("train differential on real documents; a==b run merges stay greedy") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wc = Bpe.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc.nonEmpty)
    val expect = refTrain(wc, 12)
    val got = Bpe.train(docs, "text", nMerges = 12)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"got $got\nexpect $expect")

    // repeated-token runs: greedy leftmost pairs ('aaaa' -> aa,aa; 'aaa' ->
    // aa,a) — the fold must not re-merge across a just-merged pair
    import spark.implicits._
    val runs = Seq("aaaa aaaa aaa").toDF("text")
    val m1 = Bpe.train(runs, "text", nMerges = 1).collect()(0)
    assert((m1.getString(1), m1.getString(2)) == ("a", "a"))
    val enc = Bpe.encodeWords(Seq("aaaa", "aaa", "aaaaa").toDF("w"), "w",
        Bpe.train(runs, "text", nMerges = 1))
      .collect().map(r => r.getString(0) ->
        r.getSeq[String](1).toList).toMap
    assert(enc("aaaa") == List("aa", "aa", "</w>"), enc)
    assert(enc("aaa") == List("aa", "a", "</w>"), enc)
    assert(enc("aaaaa") == List("aa", "aa", "a", "</w>"), enc)
  }

  test("edge cases: no valid words -> empty merge table; non-ascii filtered") {
    import spark.implicits._
    val junk = Seq("123 456 !!!", "ÜBER ÇA").toDF("text")
    val m = Bpe.train(junk, "text", nMerges = 3)
    assert(m.count() == 0L)
    assert(m.columns.toSeq == Seq("rank", "left", "right", "freq"))
    // asciiOnly=false admits them
    assert(Bpe.wordCounts(junk, "text", asciiOnly = false).count() > 0)
    assertThrows[IllegalArgumentException](Bpe.train(junk, "text", 0))
  }

  test("encodeWords replays the learned merges (reference parity)") {
    import spark.implicits._
    val corpus = Seq("low low low lower newest newest widest").toDF("text")
    val merges = Bpe.train(corpus, "text", nMerges = 6)
    val ms = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val words = Seq("lowest", "newest", "wide").toDF("w")
    val got = Bpe.encodeWords(words, "w", merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    for (w <- Seq("lowest", "newest", "wide")) {
      var ts = w.map(_.toString).toVector :+ "</w>"
      for ((l, r) <- ms) ts = greedyMerge(ts, l, r)
      assert(got(w) == ts.toList, s"$w: ${got(w)} vs $ts")
    }
  }

  test("one-pass encode == per-merge replay; 512 merges stay ONE query") {
    import spark.implicits._
    val corpus = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump",
      "the five boxing wizards jump quickly").toDF("text")
    val merges = Bpe.train(corpus, "text", nMerges = 24)
    val words = Bpe.wordCounts(corpus, "text").select("word")
    val one = Bpe.encodeWords(words, "word", merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val rep = Bpe.encodeWordsReplay(words, "word", merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(one == rep, "one-pass fold must equal the per-merge replay")
    assert(one.nonEmpty)

    // pad the table to 512 merges with pairs that never occur: the encode
    // must remain a single query — no per-merge checkpoints in the plan,
    // and a handful of jobs total (the replay would schedule 64+). The
    // merge table itself is pinned to ONE checkpoint first so any further
    // LogicalRDD in the encode plan would be the encode's own doing.
    val pad = (25 to 512).map(i => (i.toLong, s"<pad$i>", s"<pad$i>", 0L))
      .toDF("rank", "left", "right", "freq")
    val bigMerges = merges.unionByName(pad).localCheckpoint()
    val enc = Bpe.encodeWords(words, "word", bigMerges)
    assert(enc.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l }.length <= 1,
      "one-pass encode must not add checkpoints of its own")
    val sc = spark.sparkContext
    sc.setJobGroup("bpe-one-pass-512", "BpeSpec job-count pin",
      interruptOnCancel = false)
    val got = try {
      enc.collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    } finally sc.clearJobGroup()
    assert(got == one, "no-op pad merges must not change the encoding")
    // the status store is fed asynchronously — poll until the group's job
    // count is stable, then pin it
    var last = -1; var stable = 0; var tries = 0
    while (stable < 4 && tries < 100) {
      val c = sc.statusTracker.getJobIdsForGroup("bpe-one-pass-512").length
      if (c == last) stable += 1 else { stable = 0; last = c }
      Thread.sleep(50); tries += 1
    }
    assert(last >= 1 && last <= 10,
      s"expected a single-query encode (few jobs), saw $last")
  }
}
