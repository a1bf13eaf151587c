package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{Dedup, Eval}
import graft.ops.Scale

/** Stage-by-stage profile of q_lifecycle_e2e — skipped unless GRAFT_PROF.
  * Mirrors SparkEntry4's chain (the helpers there are private) so the
  * flagship's cost can be attributed to stages before optimizing any.
  * Stages are timed SEQUENTIALLY here on purpose — the production query
  * overlaps the index build + tokenizer train with the gate chain
  * (futures; same-minute A/B 24.0 -> 20.7s), so this profile shows the
  * per-stage costs that overlap hides.
  */
class ProfLifecycleSpec extends AnyFunSuite {
  test("profile lifecycle e2e stages at sf0.1") {
    assume(sys.env.contains("GRAFT_PROF"), "set GRAFT_PROF=1 to run profiling")
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-prof-lifecycle").toString
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    docs.count()

    val scored = time("nb train + score (cache)") {
      val lab = docs.withColumn("cls",
        when(col("lang") === "en", lit("pos")).otherwise(lit("neg")))
      val train = lab.filter(col("doc_id") % 2 === 0)
      val wc = graft.text.Classify.nbWordCounts(train, "cls", "text")
      val stats = graft.text.Classify.nbClassStats(train, "cls", "text")
        .collect().map(r => (r.getAs[String]("cls"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toSeq
      val s0 = graft.text.Classify.nbScoresAll(
        lab.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", wc, stats,
        vocab = graft.text.Classify.nbVocab(wc),
        totalDocs = stats.map(_._2).sum)
      val r = s0.groupBy("doc_id")
        .agg(max(when(col("cls") === "pos", col("score"))).as("sp"),
          max(when(col("cls") === "neg", col("score"))).as("sn"))
        .select(col("doc_id"), round(col("sp") - col("sn"), 6).as("s"))
        .join(docs.select(col("doc_id"),
          (col("lang") === "en").as("truth")), "doc_id").cache()
      r.count(); r
    }
    val thr = time("prCurve + threshold head") {
      Eval.prCurve(scored, "truth", "s")
        .filter(col("recall") >= 0.8).agg(max("s")).head()
    }
    val gated = docs.join(
      scored.filter(col("s") >= thr.getDouble(0)).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val dec = time("decontaminateBloom (count)") {
      val d = Dedup.decontaminateBloom(gated, "doc_id", "text",
        docs.filter(col("doc_id") % 10 === 0), "text", n = 3,
        maxContaminatedFrac = 0.5)
      d.count(); d
    }
    time("buildMinhashIndex") {
      Dedup.buildMinhashIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", s"$scratch/idx", n = 3, bands = 16, rows = 2,
        seed = 42L, portable = true)
    }
    val admitted = time("ingestDedup (cache)") {
      val a = Dedup.ingestDedup(spark, s"$scratch/idx", dec, "doc_id",
        "text", threshold = 0.3).cache()
      a.count(); a
    }
    time("buildTokenizer (sep)") {
      graft.text.Bpe.buildTokenizer(docs, "text", s"$scratch/tok",
        nMerges = 8, sepToken = true)
    }
    val ids = time("encodeDocsFromTokenizer (cache)") {
      val i = graft.text.Bpe.encodeDocsFromTokenizer(
        spark, s"$scratch/tok", admitted, "doc_id", "text").cache()
      i.count(); i
    }
    val (sep, _, _) = graft.text.Bpe.tokenizerMeta(spark, s"$scratch/tok")
    val w = time("contextWindows (count)") {
      val w0 = Scale.contextWindows(ids, "doc_id", "ids", windowLen = 64,
        insertSep = sep).cache()
      w0.count(); w0
    }
    val batches = time("lengthGroupedBatches (count)") {
      val b = Scale.lengthGroupedBatches(ids, "doc_id", col("n_tokens"),
        nBuckets = 4, batchBudget = 2048L).cache()
      b.count(); b
    }
    time("data card joins (collect)") {
      val srcOf = admitted.select(col("doc_id"), col("source"))
      val dCard = srcOf.join(ids.select("doc_id", "n_tokens"), Seq("doc_id"))
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          expr("bit_xor(CAST(conv(substring(md5(CAST(doc_id AS STRING)), " +
            "1, 15), 16, 10) AS LONG))").as("fingerprint"))
      val wSrc = w.select(col("window_id"), explode(col("spans")).as("sp"))
        .select(col("window_id"), col("sp.doc_id").as("doc_id"))
        .join(srcOf, Seq("doc_id"))
        .groupBy("source").agg(count_distinct(col("window_id"))
          .as("n_windows"))
      val bSrc = batches.join(srcOf, Seq("doc_id"))
        .groupBy("source")
        .agg(count_distinct(col("bucket") * 1000000L + col("batch"))
          .as("n_batches"))
      dCard.join(wSrc, Seq("source")).join(bSrc, Seq("source")).collect()
    }
  }
}
