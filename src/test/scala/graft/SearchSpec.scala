package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Search

class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")
    ).toDF("doc_id", "text")
  }

  test("invertedIndex: tf and dl per (term, doc)") {
    val idx = Search.invertedIndex(corpus, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(2))).toMap
    assert(idx(("apple", 1L)) == (2L, 3L))   // tf=2, dl=3
    assert(idx(("banana", 1L)) == (1L, 3L))
    assert(idx(("cherry", 3L)) == (3L, 4L))
    assert(idx(("date", 3L)) == (1L, 4L))
    assert(idx.size == 6)
  }

  test("bm25: hand-computed score, rank order, topK cut") {
    val qs = {
      import spark.implicits._
      Seq((7L, "cherry")).toDF("qid", "qt")
    }
    val out = Search.bm25(corpus, "doc_id", "text", qs, "qid", "qt",
        k1 = 1.25, b = 0.75, topK = 2)
      .orderBy("rank").collect()
    // N=3, df(cherry)=2, idf=ln(1+(3-2+0.5)/2.5)=ln(1.6); avgdl=9/3=3
    val idf = math.log(1.6)
    def s(tf: Long, dl: Long): Double = {
      val raw = idf * (tf * 2.25) / (tf + 1.25 * (0.25 + 0.75 * dl / 3.0))
      math.rint(raw * 1e4) / 1e4
    }
    assert(out.length == 2) // doc 3 and doc 2 match; topK=2 keeps both
    assert(out(0).getLong(out(0).fieldIndex("id")) == 3L)
    assert(math.abs(out(0).getDouble(out(0).fieldIndex("score")) - s(3, 4)) < 1e-9)
    assert(out(1).getLong(out(1).fieldIndex("id")) == 2L)
    assert(math.abs(out(1).getDouble(out(1).fieldIndex("score")) - s(1, 2)) < 1e-9)
    assert(out(0).getDouble(out(0).fieldIndex("score")) >
           out(1).getDouble(out(1).fieldIndex("score")))
  }

  test("rrfFuse: hand-computed fusion, partial coverage, tiebreak by id") {
    import spark.implicits._
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "id", "rank")
    val sem = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "id", "rank")
    val out = graft.text.Search.rrfFuse(Seq(lex, sem), k0 = 60, topK = 10)
      .orderBy("rank").collect()
    // doc 20: 1/62 + 1/61 = .02952...; doc 10: 1/61; doc 30: 1/62
    assert(out.map(_.getLong(out(0).fieldIndex("id"))).toSeq == Seq(20L, 10L, 30L))
    assert(math.abs(out(0).getDouble(out(0).fieldIndex("rrf")) -
      math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6) < 1e-12)
    assert(out(0).getLong(out(0).fieldIndex("n_lists")) == 2L)
    assert(out(1).getLong(out(1).fieldIndex("n_lists")) == 1L)
  }

  test("pmiCollocations: exact counts, known collocation tops the list") {
    import spark.implicits._
    // "strong tea" always adjacent; "the the" frequent but independent
    val d = Seq.tabulate(30)(i =>
      (i.toLong, "the cat strong tea the dog strong tea"))
      .toDF("doc_id", "text")
    val out = graft.text.Search
      .pmiCollocations(d, "doc_id", "text", minCount = 5, topK = 5)
      .collect()
    val top = out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3)))
    // T=240, B=210. "strong tea": c_xy=60, c_strong=60, c_tea=60
    // pmi = ln(60*240*240 / (210*60*60)) = ln(160/35)
    val expect = math.rint(math.log(60.0 * 240 * 240 / (210.0 * 60 * 60)) * 1e4) / 1e4
    assert(top.exists(t => t._1 == "strong" && t._2 == "tea" &&
      t._3 == 60L && math.abs(t._4 - expect) < 1e-9), top.mkString(";"))
    // every returned pmi is >= the dropped ones (top-k really is top)
    assert(top.map(_._4).sorted.reverse.toSeq == top.map(_._4).toSeq ||
      top.map(_._4).toSet.size < top.length)
  }

  test("pmiCollocations window=2: brute-force pair/total parity") {
    import spark.implicits._
    val d = Seq((1L, "a b c a b"), (2L, "b c d"), (3L, "x")).toDF("doc_id", "text")
    val out = graft.text.Search
      .pmiCollocations(d, "doc_id", "text", minCount = 1, topK = 100, window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // brute force
    val docs = Seq(Seq("a","b","c","a","b"), Seq("b","c","d"), Seq("x"))
    val t = docs.map(_.size).sum
    val bTot = docs.map(ws => math.max(ws.size-1,0) + math.max(ws.size-2,0)).sum
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val pairs = docs.flatMap(ws =>
      (1 to 2).flatMap(dd => ws.dropRight(dd).zip(ws.drop(dd))))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(out.keySet == pairs.keySet)
    out.foreach { case ((w1, w2), (cxy, pmi)) =>
      assert(cxy == pairs((w1, w2)).toLong)
      val expect = math.log(cxy.toDouble * t * t / (bTot.toDouble * uni(w1) * uni(w2)))
      assert(math.abs(pmi - math.rint(expect * 1e4) / 1e4) < 1e-9,
        s"($w1,$w2) $pmi vs $expect")
    }
  }

  test("bm25TopicStats/TagAgainst: frozen stats, unseen term max idf, best topic") {
    import spark.implicits._
    val topics = Seq((1L, "apple"), (2L, "cherry zzz")).toDF("tid", "tt")
    val stats = graft.text.Search.bm25TopicStats(corpus, "doc_id", "text",
      topics, "tid", "tt")
    val st = stats.collect().map(r => r.getString(r.fieldIndex("term")) ->
      r.getLong(r.fieldIndex("df"))).toMap
    assert(st == Map("apple" -> 1L, "cherry" -> 2L, "zzz" -> 0L))
    val tags = graft.text.Search.bm25TagAgainst(corpus, "doc_id", "text",
        stats, k1 = 1.25, b = 0.75)
      .where(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tags(1L) == 1L) // "apple banana apple" -> topic apple
    assert(tags(3L) == 2L) // "cherry cherry cherry date" -> topic cherry
    assert(tags(2L) == 2L) // "banana cherry" -> only cherry matches
  }

  test("bm25StatsMerge: merged slice stats == from-scratch, bit-exact") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val topics = Seq((1L, "apple banana"), (2L, "the quick brown"))
      .toDF("tid", "tt")
    def stats(d: org.apache.spark.sql.DataFrame) =
      graft.text.Search.bm25TopicStats(d, "doc_id", "text", topics, "tid", "tt")
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 =!= 0)
    val merged = graft.text.Search.bm25StatsMerge(stats(a), stats(b))
    // every field is an additive exact integer: bit-exact equality, not
    // approximate — the whole point of the incremental path
    TestSpark.assertSameRows(merged, stats(docs), "merged vs from-scratch")
    // empty-slice identity: merging an empty batch changes nothing
    val none = docs.where(lit(false))
    TestSpark.assertSameRows(
      graft.text.Search.bm25StatsMerge(stats(docs), stats(none)),
      stats(docs), "empty-slice identity")
  }

  test("vocabStats: exact single-row corpus stats") {
    import spark.implicits._
    val d = Seq((1L, "a a b c"), (2L, "a d")).toDF("doc_id", "text")
    val r = graft.text.Search.vocabStats(d, "text").collect()(0)
    assert(r.getLong(r.fieldIndex("t_tok")) == 6L)
    assert(r.getLong(r.fieldIndex("vocab")) == 4L)
    assert(r.getLong(r.fieldIndex("hapax")) == 3L) // b, c, d
    assert(r.getLong(r.fieldIndex("top_c")) == 3L) // a
    assert(r.getLong(r.fieldIndex("top_bp")) == 5000L)
  }

  test("tfidf: idf-0 terms score 0, distinctive terms rank first") {
    import spark.implicits._
    val d = Seq(
      (1L, "common alpha alpha"),
      (2L, "common beta"),
      (3L, "common gamma gamma gamma")
    ).toDF("doc_id", "text")
    val out = Search.tfidfTerms(d, "doc_id", "text", topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)) ->
        (r.getString(1), r.getDouble(2))).toMap
    assert(out((1L, 1L))._1 == "alpha")
    assert(math.abs(out((1L, 1L))._2 - math.rint(2 * math.log(3.0) * 1e4) / 1e4) < 1e-9)
    assert(out((3L, 1L))._1 == "gamma")
    // "common" appears in every doc -> score exactly 0, ranks after
    assert(out((2L, 2L)) == ("common", 0.0))
  }
}
