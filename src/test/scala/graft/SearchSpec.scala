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
