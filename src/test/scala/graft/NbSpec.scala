package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Classify

class NbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("NB counts, priors, smoothing, and argmax match a hand computation") {
    import spark.implicits._
    val train = Seq(
      ("spam", "buy pills now"),
      ("spam", "buy now"),
      ("ham",  "meeting notes attached")
    ).toDF("cls", "text")
    val wc = Classify.nbWordCounts(train, "cls", "text")
    val gotW = wc.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gotW == Map(("spam", "buy") -> 2L, ("spam", "pills") -> 1L,
      ("spam", "now") -> 2L, ("ham", "meeting") -> 1L,
      ("ham", "notes") -> 1L, ("ham", "attached") -> 1L), gotW.toString)
    val stats = Classify.nbClassStats(train, "cls", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stats.toSet == Set(("spam", 2L, 5L), ("ham", 1L, 3L)),
      stats.toString)
    val v = Classify.nbVocab(wc)
    assert(v == 6L)
    val docs = Seq((1L, "buy pills"), (2L, "meeting notes"), (3L, "???"))
      .toDF("doc_id", "text")
    val out = Classify.nbClassify(docs, "doc_id", "text", wc, stats,
        vocab = v, totalDocs = 3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getDouble(3)))).toMap
    def lnp(c: Long, nt: Long): Double = math.log((c + 1.0) / (nt + v))
    // doc 1 "buy pills": spam = ln(2/3) + [buy: (2+1)/11] + [pills: (1+1)/11]
    val s1spam = math.log(2.0 / 3) + ((0.0 + lnp(2, 5)) + lnp(1, 5))
    val s1ham = math.log(1.0 / 3) + ((0.0 + lnp(0, 3)) + lnp(0, 3))
    assert(out(1L) == ((2L, "spam", s1spam)) && s1spam > s1ham,
      out(1L).toString)
    val s2ham = math.log(1.0 / 3) + ((0.0 + lnp(1, 3)) + lnp(1, 3))
    assert(out(2L) == ((2L, "ham", s2ham)), out(2L).toString)
    // token-less doc scores the bare prior; spam (2/3) outranks ham (1/3)
    assert(out(3L) == ((0L, "spam", math.log(2.0 / 3) + 0.0)),
      out(3L).toString)
    // the full posterior surface carries one row per class
    val all = Classify.nbScoresAll(docs, "doc_id", "text", wc, stats,
      vocab = v, totalDocs = 3L)
    assert(all.count() == docs.count() * 2)
    // guards
    assertThrows[IllegalArgumentException](
      Classify.nbClassify(docs, "doc_id", "text", wc, Seq.empty, v, 3L))
    assertThrows[IllegalArgumentException](
      Classify.nbClassify(docs, "doc_id", "text", wc, stats, 0L, 3L))
    assertThrows[IllegalArgumentException](
      Classify.nbClassify(docs, "doc_id", "text", wc, stats, v, 0L))
  }

  test("nbTopFeatures ranks class-indicative words by smoothed log-odds") {
    import spark.implicits._
    val train = Seq(
      ("spam", "buy pills now"),
      ("spam", "buy now"),
      ("ham",  "meeting notes attached")
    ).toDF("cls", "text")
    val wc = Classify.nbWordCounts(train, "cls", "text")
    val stats = Classify.nbClassStats(train, "cls", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val feats = Classify.nbTopFeatures(wc, stats, vocab = 6L, k = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getString(1), r.getDouble(3)))).toMap
    // spam 'buy': cnt 2 of 5 spam tokens, 0 of 3 rest ->
    // ln((3/11) / (1/9)); 'now' ties exactly -> word-asc puts buy first
    val spamBuy = math.log(((2 + 1.0) / (5 + 6)) / ((2 - 2 + 1.0) / ((8 - 5) + 6)))
    assert(feats(("spam", 1L)) == (("buy", spamBuy)), feats.toString)
    assert(feats(("spam", 2L))._1 == "now" && feats(("spam", 3L))._1 == "pills")
    // all ham words tie (cnt 1, rest 0) -> alphabetical
    assert(feats(("ham", 1L))._1 == "attached" &&
      feats(("ham", 2L))._1 == "meeting" && feats(("ham", 3L))._1 == "notes")
    assertThrows[IllegalArgumentException](
      Classify.nbTopFeatures(wc, stats, vocab = 6L, k = 0))
  }

  test("exact score ties break on the class name ascending") {
    import spark.implicits._
    // perfectly symmetric classes: every per-class quantity is equal, so
    // every doc's scores tie exactly and the argmax must fall to the
    // lexicographically first class — a total function of the counts
    val train = Seq(("zcls", "x y"), ("acls", "x y")).toDF("cls", "text")
    val wc = Classify.nbWordCounts(train, "cls", "text")
    val stats = Classify.nbClassStats(train, "cls", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = Seq((1L, "x"), (2L, "")).toDF("doc_id", "text")
    val out = Classify.nbClassify(docs, "doc_id", "text", wc, stats,
        vocab = Classify.nbVocab(wc), totalDocs = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "acls", 2L -> "acls"), out.toString)
  }

  test("recovers planted classes on held-out docs (disjoint vocab)") {
    import spark.implicits._
    // two classes with disjoint characteristic vocabularies plus shared
    // filler — the regime where multinomial NB is Bayes-optimal, so
    // anything under 100% held-out accuracy is an implementation bug
    val vocabA = Vector("red", "green", "blue", "cyan")
    val vocabB = Vector("dog", "cat", "cow", "hen")
    val shared = Vector("the", "of")
    def doc(cls: String, vocab: Vector[String], i: Int): (String, String) = {
      val ws = (0 until 8).map(j =>
        if (j % 3 == 2) shared((i + j) % shared.size)
        else vocab((i * 7 + j * 3) % vocab.size))
      (cls, ws.mkString(" "))
    }
    val train = ((0 until 20).map(doc("colors", vocabA, _)) ++
      (0 until 20).map(doc("animals", vocabB, _))).toDF("cls", "text")
    val heldOut = ((100 until 110).map(doc("colors", vocabA, _)) ++
      (100 until 110).map(doc("animals", vocabB, _)))
      .zipWithIndex.map { case ((c, t), i) => (i.toLong, c, t) }
      .toDF("doc_id", "truth", "text")
    val wc = Classify.nbWordCounts(train, "cls", "text")
    val stats = Classify.nbClassStats(train, "cls", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val pred = Classify.nbClassify(heldOut, "doc_id", "text", wc, stats,
      vocab = Classify.nbVocab(wc), totalDocs = 40L)
    val acc = pred.join(heldOut.select("doc_id", "truth"), "doc_id")
      .agg(avg(when(col("pred") === col("truth"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc == 1.0, s"held-out accuracy $acc")
  }

  test("appendToNbModel == retrain from scratch, incl. a batch-only class") {
    import spark.implicits._
    val first = Seq(
      ("spam", "buy pills now"),
      ("ham",  "meeting notes attached")).toDF("cls", "text")
    // the appended batch grows an existing class AND introduces a new one
    val batch = Seq(
      ("spam", "buy now now"),
      ("news", "markets closed higher today")).toDF("cls", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-nb-inc").toString
    Classify.buildNbModel(first, "cls", "text", path)
    Classify.appendToNbModel(spark, path, batch, "cls", "text")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-nb-scratch").toString
    Classify.buildNbModel(first.unionByName(batch), "cls", "text", scratch)
    def words(p: String) = spark.read.parquet(s"$p/words").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def classes(p: String) = spark.read.parquet(s"$p/classes").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def meta(p: String) = spark.read.parquet(s"$p/meta").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(words(path) == words(scratch), "merged word counts differ")
    assert(classes(path) == classes(scratch), "merged class stats differ")
    assert(meta(path) == meta(scratch), "merged meta differs")
    val docs = Seq((1L, "buy now"), (2L, "markets today"), (3L, "notes"))
      .toDF("doc_id", "text")
    def classify(p: String) =
      Classify.classifyFromModel(spark, p, docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap
    assert(classify(path) == classify(scratch),
      "incremental model must classify bit-identically")
  }

  test("persisted model classification == inline, bit-identical") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val wc = Classify.nbWordCounts(train, "lang", "text")
    val stats = Classify.nbClassStats(train, "lang", "text").collect()
      .map(r => (r.getAs[String]("cls"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).toSeq
    val inline = Classify.nbClassify(docs, "doc_id", "text", wc, stats,
        vocab = Classify.nbVocab(wc), totalDocs = stats.map(_._2).sum)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getDouble(3)))).toMap
    val path = java.nio.file.Files
      .createTempDirectory("graft-nb-model").toString
    Classify.buildNbModel(train, "lang", "text", path)
    val persisted = Classify.classifyFromModel(spark, path, docs,
        "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getDouble(3)))).toMap
    assert(inline.size == docs.count() && persisted == inline,
      s"inline ${inline.size} rows, persisted ${persisted.size}")
  }

  test("scoreBinaryFromModel == the inline binary log-odds pivot, " +
      "bit-identical") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("cls",
        when(col("lang") === "en", lit("pos")).otherwise(lit("neg")))
    val train = docs.filter(col("doc_id") % 2 === 0)
    val eval = docs.filter(col("doc_id") % 2 === 1)
    val wc = Classify.nbWordCounts(train, "cls", "text")
    val stats = Classify.nbClassStats(train, "cls", "text").collect()
      .map(r => (r.getAs[String]("cls"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).toSeq
    val inline = Classify.nbScoresAll(eval, "doc_id", "text", wc, stats,
        vocab = Classify.nbVocab(wc), totalDocs = stats.map(_._2).sum)
      .groupBy("doc_id")
      .agg(max(when(col("cls") === "pos", col("score"))).as("sp"),
        max(when(col("cls") === "neg", col("score"))).as("sn"))
      .select(col("doc_id"), round(col("sp") - col("sn"), 6).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val path = java.nio.file.Files
      .createTempDirectory("graft-nb-gate").toString
    Classify.buildNbModel(train, "cls", "text", path)
    val served = Classify.scoreBinaryFromModel(spark, path, eval,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(inline.nonEmpty && served == inline,
      s"inline ${inline.size} vs served ${served.size}")
    // a model without the requested classes must fail fast, not score 0
    intercept[IllegalArgumentException] {
      Classify.scoreBinaryFromModel(spark, path, eval, "doc_id", "text",
        posCls = "nope")
    }
  }
}
