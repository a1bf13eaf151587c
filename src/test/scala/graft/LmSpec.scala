package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Lm

class LmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("codegen'd tokenize/gram expressions equal the composed HOF " +
      "formulations VALUE-FOR-VALUE (corpus + adversarial texts)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edges = Seq(
      "", " ", "\t", "\t x", "a", "a b", "a b c d e f", "a  b   c",
      "x x x x", "ümlaut Ünïcode İstanbul", "tab\tsep mixed \n newline",
      "UPPER lower MiXeD 123 mix3d", "  leading and trailing  ",
      "punct, punct. punct!", "one"
    ).zipWithIndex.map { case (t, i) => (100000L + i, t) }
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(edges.toDF("doc_id", "text"))
    def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.graftshim.Shim.columnOf(e)
    def exprOf(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftshim.Shim.exprOf(c)
    // tokens (both asciiOnly modes)
    for (ascii <- Seq(true, false)) {
      val diff = df.select(
          colOf(graft.plans.AsciiWords(exprOf(col("text")), ascii)).as("f"),
          graft.text.Lm.tokensComposed(col("text"), ascii).as("s"))
        .filter(!(col("f") <=> col("s"))).count()
      assert(diff == 0, s"AsciiWords(ascii=$ascii) diverges from composed")
    }
    // gram builders over the ascii token array, several orders
    val ts = df.select(graft.text.Lm.tokensComposed(col("text"), true)
      .as("__ts"))
    def check(name: String, fast: org.apache.spark.sql.Column,
              slowSql: String): Unit = {
      val diff = ts.select(fast.as("f"), expr(slowSql).as("s"))
        .filter(!(col("f") <=> col("s"))).count()
      assert(diff == 0, s"$name diverges from the composed form")
    }
    for (n <- Seq(1, 2, 3)) {
      check(s"NGramPairs($n)",
        colOf(graft.plans.NGramPairs(exprOf(col("__ts")), n)),
        graft.text.Lm.gramExpr(n))
      check(s"AllOrderGrams($n)",
        colOf(graft.plans.AllOrderGrams(exprOf(col("__ts")), n)),
        graft.text.Lm.allGramExpr(n))
      check(s"BackoffLookupGrams($n)",
        colOf(graft.plans.BackoffLookupGrams(exprOf(col("__ts")), n)),
        graft.text.Lm.lookupExpr(n))
    }
    for (n <- Seq(2, 3, 4))
      check(s"KnLookupGrams($n)",
        colOf(graft.plans.KnLookupGrams(exprOf(col("__ts")), n)),
        graft.text.Lm.knLookupExprPivot(n))
    // NULL text: AsciiWords is NULL like the composed chain
    val r = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(colOf(graft.plans.AsciiWords(exprOf(col("text")), true))).head()
    assert(r.isNullAt(0))
  }

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

  test("interpolated KN: model counts and bigram cascade match hand computation") {
    import spark.implicits._
    // corpus: "a b", "c b", "a d" — V=4, bigram types BT=3,
    // continuation counts N1+(.b)=2, N1+(.d)=1 (U1=2),
    // follower types N1+(a.)=2, N1+(c.)=1
    val corpus = Seq((1L, "a b"), (2L, "c b"), (3L, "a d"))
      .toDF("doc_id", "text")
    val model = Lm.kneserNeyCounts(corpus, "text", n = 2)
    val got = model.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(got == Map(
      ("r", 1, "a") -> 2L, ("r", 1, "b") -> 2L, ("r", 1, "c") -> 1L,
      ("r", 1, "d") -> 1L, ("r", 2, "a b") -> 1L, ("r", 2, "c b") -> 1L,
      ("r", 2, "a d") -> 1L,
      ("c", 1, "b") -> 2L, ("c", 1, "d") -> 1L,
      ("f", 1, "a") -> 2L, ("f", 1, "c") -> 1L), got.toString)
    val (v, bt, u1) = Lm.knStats(model)
    assert((v, bt, u1) == ((4L, 3L, 2L)))
    // doc "a b": P1(b) = max(2-D,0)/3 + D*2/3/4; P2 = max(1-D,0)/2 +
    // D*2/2*P1 — association mirrors the implementation exactly
    val p1b = math.max(2 - 0.75, 0.0) / 3.0 + 0.75 * 2.0 / 3.0 / 4.0
    val p2 = math.max(1 - 0.75, 0.0) / 2.0 + 0.75 * 2.0 / 2.0 * p1b
    val s = Lm.scoreDocsKN(
        Seq((1L, "a b"), (9L, "z b"), (3L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", model, n = 2, vocab = v, bigramTypes = bt, u1 = u1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(s(1L) == ((1L, math.log(p2), Some(math.log(p2)))), s(1L).toString)
    // unseen context "z": pure backoff to the continuation unigram
    assert(s(9L) == ((1L, math.log(p1b), Some(math.log(p1b)))), s(9L).toString)
    assert(s(3L) == ((0L, 0.0, None)), s(3L).toString)
    // guards
    assertThrows[IllegalArgumentException](
      Lm.kneserNeyCounts(corpus, "text", 1))
    assertThrows[IllegalArgumentException](
      Lm.scoreDocsKN(corpus, "doc_id", "text", model, 2, v, bt, u1,
        discount = 1.0))
  }

  test("interpolated KN at n=3 exercises the mid-level continuation counts") {
    import spark.implicits._
    // "a b c", "d b c", "a b e": mid-level for ctx b: N1+(.b.)=3 types,
    // g(b)=2 distinct finals {c,e}; continuation bigrams N1+(.b c)=2,
    // N1+(.b e)=1; followers N1+(a b .)=2, N1+(d b .)=1
    val corpus = Seq((1L, "a b c"), (2L, "d b c"), (3L, "a b e"))
      .toDF("doc_id", "text")
    val model = Lm.kneserNeyCounts(corpus, "text", n = 3)
    val got = model.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(got(("c", 2, "b c")) == 2L && got(("c", 2, "b e")) == 1L &&
      got(("m", 1, "b")) == 3L && got(("g", 1, "b")) == 2L &&
      got(("f", 2, "a b")) == 2L && got(("f", 2, "d b")) == 1L, got.toString)
    val (v, bt, u1) = Lm.knStats(model)
    assert((v, bt, u1) == ((5L, 4L, 3L)))
    // doc "a b c": P1(c) = max(1-D,0)/4 + D*3/4/5;
    // P2 = max(2-D,0)/3 + D*2/3*P1 (mid level: continuation counts);
    // P3 = max(1-D,0)/2 + D*2/2*P2 (top level: raw counts)
    val p1 = math.max(1 - 0.75, 0.0) / 4.0 + 0.75 * 3.0 / 4.0 / 5.0
    val p2 = math.max(2 - 0.75, 0.0) / 3.0 + 0.75 * 2.0 / 3.0 * p1
    val p3 = math.max(1 - 0.75, 0.0) / 2.0 + 0.75 * 2.0 / 2.0 * p2
    val s = Lm.scoreDocsKN(Seq((1L, "a b c")).toDF("doc_id", "text"),
        "doc_id", "text", model, n = 3, vocab = v, bigramTypes = bt, u1 = u1)
      .collect()(0)
    assert(s.getLong(1) == 1L && s.getDouble(2) == math.log(p3), s.toString)
  }

  test("neyDiscount estimates D = n1/(n1 + 2*n2) from top-order " +
       "count-of-counts") {
    import spark.implicits._
    // bigram types: "a b" seen twice, "c b" and "a d" once -> n1=2, n2=1,
    // D = 2/4 = 0.5
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "c b"), (4L, "a d"))
      .toDF("doc_id", "text")
    val model = Lm.kneserNeyCounts(corpus, "text", n = 2)
    assert(Lm.neyDiscount(model, n = 2) == 0.5)
    // scoring with the estimated D is the same cascade at D = 0.5
    val (v, bt, u1) = Lm.knStats(model)
    val s = Lm.scoreDocsKN(Seq((9L, "z b")).toDF("doc_id", "text"),
        "doc_id", "text", model, n = 2, vocab = v, bigramTypes = bt,
        u1 = u1, discount = Lm.neyDiscount(model, n = 2))
      .collect()(0)
    // unseen ctx -> continuation unigram: N1+(.b)=2 of BT=3, U1=2, V=4
    val p1 = math.max(2 - 0.5, 0.0) / 3.0 + 0.5 * 2.0 / 3.0 / 4.0
    assert(s.getDouble(2) == math.log(p1), s.toString)
    // all-singleton corpus: D would be 1.0, which the scorer rejects
    val flat = Lm.kneserNeyCounts(
      Seq((1L, "p q"), (2L, "r s")).toDF("doc_id", "text"), "text", n = 2)
    assert(Lm.neyDiscount(flat, n = 2) == 1.0)
    assertThrows[IllegalArgumentException](
      Lm.scoreDocsKN(corpus, "doc_id", "text", flat, 2, 4, 2, 2,
        discount = Lm.neyDiscount(flat, n = 2)))
  }

  test("KN ranks by continuation count where Stupid Backoff ranks by raw " +
       "frequency — the 'francisco' inversion") {
    import spark.implicits._
    // "francisco" is frequent (4) but only ever follows "san";
    // "pie" is rarer (3) but follows three distinct words. Behind an
    // unseen context, backoff falls to the RAW unigram MLE (francisco
    // wins); KN falls to the CONTINUATION unigram (pie wins).
    val corpus = (Seq.fill(4)("san francisco") ++
      Seq("apple pie", "cherry pie", "peach pie")).zipWithIndex
      .map { case (t0, i) => (i.toLong, t0) }.toDF("doc_id", "text")
    val docs = Seq((900L, "zz francisco"), (901L, "zz pie"))
      .toDF("doc_id", "text")
    val grams = Lm.backoffCounts(corpus, "text", n = 2)
    val bo = Lm.scoreDocsBackoff(docs, "doc_id", "text", grams, n = 2,
        totalTokens = Lm.tokenTotal(grams))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(bo(900L) > bo(901L),
      s"backoff must rank the frequent word higher: $bo")
    val model = Lm.kneserNeyCounts(corpus, "text", n = 2)
    val (v, bt, u1) = Lm.knStats(model)
    val kn = Lm.scoreDocsKN(docs, "doc_id", "text", model, n = 2,
        vocab = v, bigramTypes = bt, u1 = u1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(kn(901L) > kn(900L),
      s"KN must rank the promiscuous word higher: $kn")
  }

  test("KN backs off cleanly from a context seen only document-finally") {
    import spark.implicits._
    // "y" has a raw count but NO follower types: the top level's discount
    // mass is undefined, so the scorer must fall through to the
    // continuation unigram instead of emitting ln(0)
    val corpus = Seq((1L, "x y")).toDF("doc_id", "text")
    val model = Lm.kneserNeyCounts(corpus, "text", n = 2)
    val (v, bt, u1) = Lm.knStats(model)
    assert((v, bt, u1) == ((2L, 1L, 1L)))
    val s = Lm.scoreDocsKN(Seq((1L, "y q")).toDF("doc_id", "text"),
        "doc_id", "text", model, n = 2, vocab = v, bigramTypes = bt,
        u1 = u1)
      .collect()(0)
    val p1q = math.max(0 - 0.75, 0.0) / 1.0 + 0.75 * 1.0 / 1.0 / 2.0
    assert(s.getDouble(2) == math.log(p1q) && !s.getDouble(2).isNaN,
      s.toString)
  }

  test("persisted KN model scores bit-identically and is self-describing") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val dirP = java.nio.file.Files.createTempDirectory("graft-kn")
    val dir = dirP.toString
    try {
      Lm.buildKnModel(docs, "text", dir, n = 3)
      val meta = spark.read.parquet(s"$dir/meta").collect()
      assert(meta.length == 1 && meta(0).getAs[Int]("n") == 3)
      val model = Lm.kneserNeyCounts(docs, "text", n = 3)
      val (v, bt, u1) = Lm.knStats(model)
      assert(meta(0).getAs[Long]("vocab") == v &&
        meta(0).getAs[Long]("bigram_types") == bt &&
        meta(0).getAs[Long]("u1") == u1)
      val inline = Lm.scoreDocsKN(docs, "doc_id", "text", model, n = 3,
          vocab = v, bigramTypes = bt, u1 = u1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val frozen = Lm.scoreDocsKNFromModel(spark, dir, docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(inline == frozen && frozen.nonEmpty,
        "frozen-artifact KN scoring must be bit-identical to inline")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("KN sum_lp is position-order deterministic under repartitioning") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, (0 until 20).map(j => "w" + ('a' + ((i * 7 + j * 3) % 9)).toChar)
        .mkString(" ")))
      .toDF("doc_id", "text")
    val model = Lm.kneserNeyCounts(docs.filter(col("doc_id") <= 20), "text",
      n = 3)
    val (v, bt, u1) = Lm.knStats(model)
    def run(d: org.apache.spark.sql.DataFrame) =
      Lm.scoreDocsKN(d, "doc_id", "text", model, n = 3, vocab = v,
          bigramTypes = bt, u1 = u1)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = run(docs)
    val b = run(docs.repartition(13))
    assert(a == b, "KN scores must be bitwise partition-invariant")
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

  test("one-pass contrast == composing scoreDocsBackoff twice, bitwise") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    import org.apache.spark.sql.functions.col
    val even = docs.filter(col("doc_id") % 2 === 0)
    val inG = Lm.backoffCounts(even.filter(col("lang") === "en"), "text", 3)
    val genG = Lm.backoffCounts(even, "text", 3)
    val (ti, tg) = (Lm.tokenTotal(inG), Lm.tokenTotal(genG))
    val onePass = Lm.scoreDocsContrast(docs, "doc_id", "text", inG, genG,
        n = 3, totalIn = ti, totalGen = tg)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val si = Lm.scoreDocsBackoff(docs, "doc_id", "text", inG, 3, ti)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val sg = Lm.scoreDocsBackoff(docs, "doc_id", "text", genG, 3, tg)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val twoPass = si.map { case (id, (ng, ai)) => id -> ((ng, ai, sg(id))) }
    assert(onePass == twoPass && onePass.size == docs.count(),
      "fused contrast must be bit-identical to the two-pass composition")
  }

  test("Moore-Lewis contrast separates in-domain from out-of-domain docs") {
    import spark.implicits._
    // in-domain model: color text only; general model: colors + animals.
    // The domains SHARE the function word "the" — essential: Stupid
    // Backoff scores seen n-grams by pure count RATIOS, which disjoint
    // extra text cannot change (cnt(red the)/cnt(red) is identical in
    // both models), so a contrast only appears at contexts whose counts
    // the general corpus inflates: P(green|the) dilutes in the general
    // model because animals also follow "the" -> color docs get
    // ml_score > 0. Animal words are OOV in the in-domain model (the
    // 0.4^(n-1)/N floor) -> animal docs get ml_score < 0.
    val colors = Seq(
      (1L, "red the green the blue"),
      (2L, "blue the red the green"),
      (3L, "green the blue the red")).toDF("doc_id", "text")
    val animals = Seq(
      (4L, "dog the cat the cow"),
      (5L, "cat the cow the dog")).toDF("doc_id", "text")
    val inG = Lm.backoffCounts(colors, "text", n = 2)
    val genG = Lm.backoffCounts(colors.union(animals), "text", n = 2)
    val got = Lm.scoreDocsContrast(
        colors.union(animals), "doc_id", "text", inG, genG, n = 2,
        totalIn = Lm.tokenTotal(inG), totalGen = Lm.tokenTotal(genG))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(2) - r.getDouble(3))).toMap
    assert(got.size == 5)
    Seq(1L, 2L, 3L).foreach(id =>
      assert(got(id) > 0, s"in-domain doc $id ml=${got(id)}"))
    Seq(4L, 5L).foreach(id =>
      assert(got(id) < 0, s"out-of-domain doc $id ml=${got(id)}"))
  }

  test("modified KN: uniform-D triples degenerate to single-D KN; " +
      "estimated triples differ exactly where count-class >= 2 grams exist") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100)
    val n = 3
    val train = docs.filter(col("doc_id") % 2 === 0)
    val model = graft.ml.Dedup.trackCache(
      Lm.kneserNeyCountsCG(train, "text", n))
    val (v, bt, u1) = Lm.knStats(model)
    val uc = Lm.knUnigramClassStats(model)
    def scoresCG(ds: Map[Int, (Double, Double, Double)]) =
      Lm.scoreDocsKNCG(docs, "doc_id", "text", model, n, v, bt, uc, ds)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(r.fieldIndex("sum_lp")))).toMap
    // 1) degenerate check: D1=D2=D3=D collapses the class machinery to
    // the single-discount scorer (same counts, γ = D·N1+ both ways);
    // association order differs (ΣD·kᵢ vs D·Σkᵢ), so compare to 1e-9,
    // not bitwise
    val d = 0.75
    val uni = scoresCG((1 to n).map(_ -> ((d, d, d))).toMap)
    val single = Lm.scoreDocsKN(docs, "doc_id", "text", model, n, v, bt,
        u1, discount = d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(r.fieldIndex("sum_lp")))).toMap
    assert(uni.keySet == single.keySet)
    uni.foreach { case (id, (ng, s)) =>
      assert(ng == single(id)._1, s"doc $id n_grams")
      assert(math.abs(s - single(id)._2) < 1e-9,
        s"doc $id: uniform-CG $s vs single-D ${single(id)._2}")
    }
    // 2) the estimated triples are non-uniform here (the corpus has
    // count-class >= 2 grams at every level or the level fell back),
    // so scored docs must actually differ from single-D somewhere
    val est = Lm.cgDiscounts(model, n)
    assert(est.values.exists { case (d1, d2, d3) => d1 != d2 || d2 != d3 },
      s"estimated discounts unexpectedly uniform: $est")
    val cg = scoresCG(est)
    assert(cg.exists { case (id, (ng, s)) =>
      ng > 0 && math.abs(s - single(id)._2) > 1e-6 },
      "modified KN never diverged from single-D on a scored doc")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("persisted modified-KN model scores bit-identically and freezes " +
      "its discounts") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100)
    val n = 3
    val train = docs.filter(col("doc_id") % 2 === 0)
    val model = graft.ml.Dedup.trackCache(
      Lm.kneserNeyCountsCG(train, "text", n))
    val (v, bt, _) = Lm.knStats(model)
    val inline = Lm.scoreDocsKNCG(docs, "doc_id", "text", model, n, v, bt,
        Lm.knUnigramClassStats(model), Lm.cgDiscounts(model, n))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(r.fieldIndex("sum_lp")))).toMap
    val path = java.nio.file.Files
      .createTempDirectory("graft-kncg-model").toString
    Lm.buildKnModelCG(train, "text", path, n)
    val persisted = Lm.scoreDocsKNCGFromModel(spark, path, docs,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(r.fieldIndex("sum_lp")))).toMap
    assert(inline.nonEmpty && persisted == inline,
      s"inline ${inline.size} vs persisted ${persisted.size}")
    // the artifact is self-describing: n levels of frozen discounts
    val ds = spark.read.parquet(s"$path/discounts").collect()
    assert(ds.map(_.getAs[Int]("lev")).sorted.toSeq == (1 to n))
    graft.ml.Dedup.unpersistIntermediates()
  }
}
