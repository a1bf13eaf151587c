package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{Eval, Similarity, Sq}
import graft.ops.Scale

/** SQ8 scalar quantization + the evaluation verbs + token-budget mixing. */
class SqEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("embedding", col("embedding").cast("array<double>"))

  test("SQ8 codes are 8-bit; bounds cover every dimension") {
    val e = emb.cache()
    val (mns, mxs) = Sq.boundsArrays(Sq.sqBounds(e, "embedding"))
    assert(mns.size == 64 && mxs.size == 64)
    assert(mns.zip(mxs).forall { case (a, b) => a <= b })
    val codes = Sq.sqEncode(e, "vec_id", "embedding", mns, mxs)
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0L, "every code must be in [0, 255]")
    // extremes land on the extreme codes: some dimension hits 0 and 255
    val r = codes.select(
      min(expr("array_min(codes)")).as("lo"),
      max(expr("array_max(codes)")).as("hi")).head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 255)
  }

  test("SQ8 top-k recall vs brute force is high (255-level reconstruction)") {
    val e = emb.cache()
    val queries = e.filter(col("vec_id") < 10)
    val (mns, mxs) = Sq.boundsArrays(Sq.sqBounds(e, "embedding"))
    val codes = Sq.sqEncode(e, "vec_id", "embedding", mns, mxs)
    val approx = Sq.sqTopK(codes, queries, 10, mns, mxs)
    val truth = Similarity.bruteForceTopK(e, queries, 10)
    val rep = Sq.recallReport(truth, approx)
    val micro = rep.filter(col("query_id").isNull).head()
    // half-level-per-dim distortion: the quantized ranker keeps nearly
    // all of the exact top-10 even on isotropic noise vectors
    assert(micro.getAs[Double]("recall") >= 0.9,
      s"micro recall ${micro.getAs[Double]("recall")}")
    // per-query rows cover every query, hits <= n_truth
    assert(rep.filter(col("query_id").isNotNull).count() == 10)
    assert(rep.filter(col("hits") > col("n_truth")).count() == 0)
  }

  test("persisted SQ index == inline pipeline bit-for-bit; append is O(batch)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sq").toString
    val e = emb.cache()
    val queries = e.filter(col("vec_id") < 10)
    val base = e.filter(col("vec_id") % 2 === 0)
    Sq.buildSqIndex(base, dir)
    val (mns, mxs) = Sq.boundsArrays(Sq.sqBounds(base, "embedding"))
    val inline = Sq.sqTopK(Sq.sqEncode(base, "vec_id", "embedding", mns, mxs),
      queries, 5, mns, mxs)
    TestSpark.assertSameRows(Sq.sqTopKFromIndex(spark, dir, queries, 5),
      inline, "persisted vs inline")
    // append the odd half against the FROZEN bounds: the probe now sees
    // both halves, and equals a one-shot encode of everything under the
    // same bounds (frozen-quantizer append semantics, the IVF-PQ pin)
    Sq.appendToSqIndex(spark, dir, e.filter(col("vec_id") % 2 === 1))
    val all = Sq.sqTopK(Sq.sqEncode(e, "vec_id", "embedding", mns, mxs),
      queries, 5, mns, mxs)
    TestSpark.assertSameRows(Sq.sqTopKFromIndex(spark, dir, queries, 5),
      all, "appended index vs one-shot encode under frozen bounds")
  }

  test("saturation stats: in-distribution batch ~0, shifted batch trips") {
    val e = emb.cache()
    val (mns, mxs) = Sq.boundsArrays(Sq.sqBounds(e, "embedding"))
    val in = Sq.saturationStats(e.limit(50), "embedding", mns, mxs).head()
    assert(in.getAs[Double]("sat_frac") == 0.0) // bounds came from e itself
    val shifted = e.limit(50).withColumn("embedding",
      transform(col("embedding"), x => x + lit(10.0)))
    val out = Sq.saturationStats(shifted, "embedding", mns, mxs).head()
    assert(out.getAs[Double]("sat_frac") > 0.9,
      s"shifted batch should saturate, got ${out.getAs[Double]("sat_frac")}")
    // the persisted ledger makes the re-train policy operational: fresh
    // index -> no signal; in-distribution append -> no signal;
    // out-of-distribution append -> rebuildAdvised trips
    val dir = java.nio.file.Files.createTempDirectory("graft-sqsat").toString
    val base = e.filter(col("vec_id") % 2 === 0)
    Sq.buildSqIndex(base, dir)
    assert(!Sq.rebuildAdvised(spark, dir), "nothing appended yet")
    Sq.appendToSqIndex(spark, dir,
      e.filter(col("vec_id") % 2 === 1 && col("vec_id") < 200))
    assert(!Sq.rebuildAdvised(spark, dir),
      "in-distribution append must not trip the signal")
    Sq.appendToSqIndex(spark, dir,
      shifted.withColumn("vec_id", col("vec_id") + lit(1000000L)))
    assert(Sq.rebuildAdvised(spark, dir),
      "out-of-distribution append must trip the signal")
  }

  test("aucBinary: hand-checked values, ties, and degenerate guards") {
    // scores: pos {3, 2}, neg {1, 2} -> pairs: (3>1)=1, (3=2)... enumerate
    // U = sum over pos of (#neg below + 0.5 * #neg equal):
    //   pos=3: 2 below -> 1.0 + 1.0 ; pos=2: 1 below + 1 tie -> 1 + 0.5
    // AUC = 3.5 / 4 = 0.875
    val df = Seq((true, 3.0), (true, 2.0), (false, 1.0), (false, 2.0))
      .toDF("y", "s")
    val r = Eval.aucBinary(df, "y", "s").head()
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
    assert(r.getAs[Double]("auc") == 0.875)
    // perfect separation -> 1.0; total inversion -> 0.0
    val sep = Seq((true, 5.0), (true, 4.0), (false, 1.0)).toDF("y", "s")
    assert(Eval.aucBinary(sep, "y", "s").head().getAs[Double]("auc") == 1.0)
    val inv = Seq((true, 0.0), (false, 9.0)).toDF("y", "s")
    assert(Eval.aucBinary(inv, "y", "s").head().getAs[Double]("auc") == 0.0)
    // all ties -> 0.5; single-class -> NULL (undefined, never 0.5)
    val tie = Seq((true, 1.0), (false, 1.0)).toDF("y", "s")
    assert(Eval.aucBinary(tie, "y", "s").head().getAs[Double]("auc") == 0.5)
    val one = Seq((true, 1.0), (true, 2.0)).toDF("y", "s")
    assert(Eval.aucBinary(one, "y", "s").head().isNullAt(2))
  }

  test("IVF-SQ8: probes prune partitions; recall tracks the flat SQ scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfsq").toString
    val e = emb.cache()
    val queries = e.filter(col("vec_id") < 10)
    Sq.buildIvfSqIndex(e, dir, nCentroids = 8)
    val probed = Sq.ivfSqTopKFromIndex(spark, dir, queries, k = 3,
      nProbe = 8) // probe EVERYTHING -> must equal the flat SQ8 scan
    val (mns, mxs) = Sq.boundsArrays(Sq.sqBounds(e, "embedding"))
    val flat = Sq.sqTopK(Sq.sqEncode(e, "vec_id", "embedding", mns, mxs),
      queries, 3, mns, mxs)
    TestSpark.assertSameRows(
      probed.select("query_id", "item_id", "rk"),
      flat.select("query_id", "item_id", "rk"),
      "all-probe IVF-SQ vs flat SQ scan")
    // narrow probe: the codes scan must carry dynamic partition pruning
    val narrow = Sq.ivfSqTopKFromIndex(spark, dir, queries, k = 3,
      nProbe = 2)
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "probe scan should be DPP-filtered on centroid_id")
  }

  test("prCurve: hand-checked sweep; endpoints; ties collapse") {
    val df = Seq((true, 3.0), (true, 2.0), (false, 2.0), (false, 1.0))
      .toDF("y", "s")
    val r = Eval.prCurve(df, "y", "s").collect()
      .map(x => x.getAs[Double]("s") ->
        (x.getAs[Long]("tp"), x.getAs[Long]("fp"),
          x.getAs[Double]("precision"), x.getAs[Double]("recall"))).toMap
    // t=3: tp=1 fp=0; t=2: tp=2 fp=1; t=1: tp=2 fp=2
    assert(r(3.0) == ((1L, 0L, 1.0, 0.5)))
    assert(r(2.0) == ((2L, 1L, 0.666667, 1.0)))
    assert(r(1.0) == ((2L, 2L, 0.5, 1.0)))
    assert(r.size == 3) // distinct scores only — the tie at 2.0 collapsed
    // no positives anywhere -> recall NULL on every row, precision 0
    val neg = Seq((false, 1.0), (false, 2.0)).toDF("y", "s")
    val rows = Eval.prCurve(neg, "y", "s").collect()
    assert(rows.forall(_.isNullAt(4)) &&
      rows.forall(_.getAs[Double]("precision") == 0.0))
  }

  test("prfReport: hand-checked confusion, absent-class NULLs") {
    // truth a: 3 (2 right, 1 -> b); truth b: 1 (pred a); class c never
    // occurs as truth but once as pred?? keep it simple: add (c, c) = 0 no.
    val conf = Seq(("a", "a", 2L), ("a", "b", 1L), ("b", "a", 1L))
      .toDF("truth", "pred", "n")
    val r = Eval.prfReport(conf).collect().map(x =>
      (x.getAs[String]("cls"), x.getAs[Long]("tp"),
        x.getAs[Long]("n_truth"), x.getAs[Long]("n_pred"),
        Option(x.getAs[java.lang.Double]("precision")),
        Option(x.getAs[java.lang.Double]("recall")),
        Option(x.getAs[java.lang.Double]("f1")))).sortBy(_._1)
    // a: tp=2, n_truth=3, n_pred=3 -> p=2/3, r=2/3, f1=4/6
    assert(r(0) == (("a", 2L, 3L, 3L, Some(0.666667), Some(0.666667),
      Some(0.666667))))
    // b: tp=0, n_truth=1, n_pred=1 -> p=0, r=0, f1=0
    assert(r(1) == (("b", 0L, 1L, 1L, Some(0.0), Some(0.0), Some(0.0))))
    // never-predicted class: precision NULL, recall defined
    val conf2 = Seq(("a", "b", 2L)).toDF("truth", "pred", "n")
    val m = Eval.prfReport(conf2).collect()
      .map(x => x.getAs[String]("cls") -> x).toMap
    assert(m("a").isNullAt(4) && m("a").getAs[Double]("recall") == 0.0)
    assert(m("b").isNullAt(5) && m("b").getAs[Double]("precision") == 0.0)
  }

  test("SQ8 codes parquet is a fraction of the float corpus on disk") {
    val e = emb.cache()
    val (mns, mxs) = Sq.boundsArrays(Sq.sqBounds(e, "embedding"))
    val base = java.nio.file.Files.createTempDirectory("graft-sqsz")
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    e.select("vec_id", "embedding").repartition(1)
      .write.parquet(s"$base/floats")
    Sq.sqEncode(e, "vec_id", "embedding", mns, mxs).repartition(1)
      .write.parquet(s"$base/codes")
    val (fb, cb) = (dirBytes(java.nio.file.Paths.get(s"$base/floats")),
      dirBytes(java.nio.file.Paths.get(s"$base/codes")))
    // doubles are ~incompressible noise; 8-bit codes bit-pack — the
    // on-disk artifact must keep a clear fraction of the width (the
    // honest form of SQ8's 4x claim under parquet encodings)
    assert(cb.toDouble / fb < 0.5, s"codes $cb vs floats $fb")
  }

  test("calibrated gate: admits a downward-closed score set with recall >= target") {
    val dir = "/root/testdata/sf0.001"
    val admitted = SparkEntry.queries("q_gate_calibrated")(spark, dir)
      .collect()
    assert(admitted.nonEmpty)
    val thr = admitted.map(_.getAs[Double]("s")).min
    // the gate is a pure threshold: everything admitted scores >= thr
    assert(admitted.forall(_.getAs[Double]("s") >= thr))
    // and it keeps >= 80% of all positives in the scored (odd-id) half
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val totalPos = docs.filter(col("doc_id") % 2 =!= 0)
      .filter(col("lang") === "en").count()
    val admittedPos = admitted.count(_.getAs[Boolean]("truth"))
    assert(admittedPos.toDouble / totalPos >= 0.8,
      s"$admittedPos of $totalPos positives admitted")
  }

  test("hardNegatives: non-prefix positives are anti-joined out, rest re-ranked") {
    // candidates for one query: a..e by descending cosine; positives are
    // b and d (NOT a rank prefix) -> negatives must be a, c, e at 1, 2, 3
    val cand = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7),
      (1L, 13L, 0.6), (1L, 14L, 0.5))
      .toDF("query_id", "item_id", "cosine")
    val pos = Seq((1L, 11L), (1L, 13L)).toDF("query_id", "item_id")
    val got = Similarity.hardNegatives(cand, pos, k = 3).collect()
      .map(r => (r.getAs[Long]("item_id"), r.getAs[Int]("rk"))).sorted
    assert(got.toSeq == Seq((10L, 1), (12L, 2), (14L, 3)))
    // k smaller than the remainder truncates
    assert(Similarity.hardNegatives(cand, pos, k = 2).count() == 2)
  }

  test("contentOverlapMatrix: hand-checked matrix; disjoint pairs absent") {
    val df = Seq(("A", "t1"), ("A", "t2"), ("B", "t1"), ("B", "t3"),
      ("B", "t3"), ("C", "t4")).toDF("src", "text")
    val m = graft.ops.Checks.contentOverlapMatrix(df, "src", "text")
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_shared"), r.getAs[Double]("jaccard"))).toMap
    // A{t1,t2} vs B{t1,t3}: shared 1 of 3 distinct -> jaccard 1/3
    assert(m(("A", "B")) == ((2L, 2L, 1L, 0.333333)))
    // duplicate rows within a source collapse (B had t3 twice: n_b = 2)
    // disjoint pairs emit NO row — the matrix is sparse by design
    assert(m.size == 1)
  }

  test("contextWindows: exact cut, boundary-crossing docs, empty docs") {
    val docs = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq.empty[Long]),
      (3L, Seq(4L, 5L)), (4L, Seq(6L, 7L, 8L, 9L)))
      .toDF("doc_id", "ids")
    val w = Scale.contextWindows(docs, "doc_id", "ids", windowLen = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](r.fieldIndex("ids")).toList,
          r.getAs[Long]("n_filled"), r.getAs[Long]("n_docs"))).toMap
    // stream = 1..9 in doc order; doc 3 crosses the w0/w1 boundary
    assert(w(0L) == ((List(1L, 2L, 3L, 4L), 4L, 2L)))
    assert(w(1L) == ((List(5L, 6L, 7L, 8L), 4L, 2L)))
    // the final partial window is kept, short
    assert(w(2L) == ((List(9L), 1L, 1L)))
    assert(w.size == 3) // the empty doc shifts nothing and emits nothing
  }

  test("calibrationReport: hand-checked bins, ECE, extreme-score clamping") {
    // sigmoid: s=100 -> pm=10^6 (bin 9), s=-100 -> pm=0 (bin 0),
    // s=0 -> pm=500000 (bin 5)
    val d = Seq((1L, true, 100.0), (2L, true, 100.0), (3L, false, -100.0),
      (4L, true, 0.0)).toDF("id", "y", "s")
    val got = Eval.calibrationReport(d, "y", "s", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // perfectly calibrated extremes contribute 0; bin 5 holds one
    // positive at conf 0.5 -> |1.0 - 0.5| * (1/4) = 0.125 ECE total
    assert(got == Map(
      9L -> ((2L, 2L, 1.0, 1.0, 0.125)),
      0L -> ((1L, 0L, 0.0, 0.0, 0.125)),
      5L -> ((1L, 1L, 0.5, 1.0, 0.125))), got.toString)
  }

  test("prfSummary: hand-checked accuracy, macro-F1 and weighted F1") {
    val conf = Seq(("a", "a", 3L), ("a", "b", 1L), ("b", "b", 1L),
      ("b", "a", 1L)).toDF("truth", "pred", "n")
    // cls a: tp=3, n_truth=4, n_pred=4 -> f1 = 0.75
    // cls b: tp=1, n_truth=2, n_pred=2 -> f1 = 0.5
    val r = Eval.prfSummary(Eval.prfReport(conf)).head()
    assert(r.getLong(r.fieldIndex("n_classes")) == 2L)
    assert(r.getDouble(r.fieldIndex("accuracy")) == 0.666667) // 4/6
    assert(r.getDouble(r.fieldIndex("macro_f1")) == 0.625)
    assert(r.getDouble(r.fieldIndex("weighted_f1")) == 0.666667) // 4/6
  }

  test("token-budget temperature mix: greedy prefix fits quota per domain") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(col("doc_id"), col("lang"),
      size(filter(split(trim(lower(col("text"))), "\\s+"),
        w => w.rlike("^[a-z]+$"))).cast("long").as("n_tok"))
    val quotas = Scale.temperatureQuotasByWeight(toks, "lang",
        col("n_tok"), totalBudget = 20000L, temperature = 2.0)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_weight"), r.getAs[Long]("quota"))).toMap
    // sqrt-weighting: the smallest domain's share of the budget must
    // exceed its natural share of the corpus (that is the POINT of T>1)
    val totW = quotas.values.map(_._1).sum
    val (minLang, (minW, minQ)) = quotas.minBy(_._2._1)
    assert(minQ.toDouble / 20000L > minW.toDouble / totW,
      s"$minLang not upweighted: quota share ${minQ / 20000.0} vs " +
        s"natural ${minW.toDouble / totW}")
    val drawn = Scale.temperatureMixByWeight(toks, "lang", "doc_id",
      col("n_tok"), totalBudget = 20000L, temperature = 2.0)
    assert(drawn.columns.toSeq == Seq("doc_id", "lang", "n_tok"))
    // per-domain drawn token mass never exceeds the quota, and adding the
    // smallest-hash unadmitted row would overflow it (maximal prefix)
    val sums = drawn.groupBy("lang").agg(sum("n_tok").as("got"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("got"))
      .toMap
    for ((lang, got) <- sums) assert(got <= quotas(lang)._2,
      s"$lang drew $got > quota ${quotas(lang)._2}")
    // non-trivial: something was drawn and something was left behind
    assert(drawn.count() > 0 && drawn.count() < toks.count())
  }
}
