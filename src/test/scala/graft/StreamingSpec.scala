package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamVerbs
import graft.functions.Fns
import java.nio.file.Files

/** Streaming verbs driven through a real file source with AvailableNow —
  * deterministic, public API only. The streaming result must equal the same
  * pipeline run in batch (verbs are DataFrame => DataFrame by construction).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkEvents() = {
    import spark.implicits._
    Seq(
      ("2024-01-01 00:00:10", "click", 1.0, 1L),
      ("2024-01-01 00:00:40", "click", 2.0, 2L),
      ("2024-01-01 00:01:10", "view", 3.0, 3L),
      ("2024-01-01 00:01:30", "click", 4.0, 4L),
      ("2024-01-01 00:02:05", "view", 5.0, 5L),
      ("2024-01-01 00:02:05", "view", 5.0, 5L) // duplicate event
    ).toDF("ts_s", "etype", "value", "event_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
  }

  test("windowed aggregation over a stream equals batch") {
    val dir = Files.createTempDirectory("graft-stream").toFile
    val out = Files.createTempDirectory("graft-stream-ckpt").toFile
    try {
      val events = mkEvents()
      events.write.mode("overwrite").parquet(dir.getAbsolutePath)

      val stream = spark.readStream.schema(events.schema).parquet(dir.getAbsolutePath)
      val agged = StreamVerbs.windowedSummarize(
        StreamVerbs.withWatermark(Tbl(stream).groupBy("etype"), "ts", "10 minutes"),
        "ts", "1 minute")(
        "n" -> Fns.Agg.n(), "sum_v" -> sum(col("value")))

      // complete mode: append would hold back windows not yet past the
      // watermark, and AvailableNow terminates before they close
      val q = agged.df.writeStream
        .format("memory").queryName("win_agg")
        .option("checkpointLocation", out.getAbsolutePath)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)

      val streamed = spark.sql(
        "SELECT window.start AS ws, etype, n, sum_v FROM win_agg")
      val batch = StreamVerbs.windowedSummarize(
        Tbl(events).groupBy("etype"), "ts", "1 minute")(
        "n" -> Fns.Agg.n(), "sum_v" -> sum(col("value")))
        .df.select(col("window.start").as("ws"), col("etype"), col("n"), col("sum_v"))
      TestSpark.assertSameRows(streamed, batch)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("streaming dedup drops duplicate events") {
    val dir = Files.createTempDirectory("graft-stream2").toFile
    val ckpt = Files.createTempDirectory("graft-stream2-ckpt").toFile
    val events = mkEvents()
    events.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(events.schema).parquet(dir.getAbsolutePath)
    val q = StreamVerbs.dedup(Tbl(stream), Seq("event_id")).df
      .writeStream.format("memory").queryName("dedup_out")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT DISTINCT event_id FROM dedup_out").count() == 5)
    assert(spark.table("dedup_out").count() == 5)
  }

  test("mapGroupsWithState running totals accumulate across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream3").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream3-ckpt").toFile
    val events = mkEvents()
    events.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(events.schema).parquet(dir.getAbsolutePath)
    val q = StreamVerbs.runningTotals(Tbl(stream), "etype", "value")
      .writeStream.format("memory").queryName("running_out")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql(
      "SELECT key, max(running_n) n, max(running_sum) s FROM running_out GROUP BY 1")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows("click") == (3L, 7.0))
    assert(rows("view") == (3L, 13.0))
  }

  test("stream-stream join within an event-time band equals batch") {
    val dirL = java.nio.file.Files.createTempDirectory("graft-ssl").toFile
    val dirR = java.nio.file.Files.createTempDirectory("graft-ssr").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ss-ckpt").toFile
    val events = mkEvents()
    val impressions = events.select(col("event_id"), col("ts").as("ts_l"),
      col("etype"))
    val clicks = events.select(col("event_id"), col("ts").as("ts_r"),
      col("value"))
    impressions.write.mode("overwrite").parquet(dirL.getAbsolutePath)
    clicks.write.mode("overwrite").parquet(dirR.getAbsolutePath)
    val sl = spark.readStream.schema(impressions.schema).parquet(dirL.getAbsolutePath)
    val sr = spark.readStream.schema(clicks.schema).parquet(dirR.getAbsolutePath)
    val joined = StreamVerbs.streamJoin(Tbl(sl), Tbl(sr), Seq("event_id"),
      "ts_l", "ts_r", delay = "10 minutes", band = "1 MINUTE")
    val q = joined.df.writeStream.format("memory").queryName("ss_join")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // every event joins with itself (same id, zero time delta); the
    // duplicated event_id=5 joins 2x2
    assert(spark.table("ss_join").count() == 5 + 3)
  }

  test("streaming near-dup candidates match the batch LSH pair condition") {
    import spark.implicits._
    val mk = (tokens: Seq[String]) => tokens.mkString(" ")
    val base = (0 until 30).map(i => s"tok$i")
    // 1&2 near-identical, 3 unrelated, 4 a copy of 1 arriving in batch 2
    val batch1 = Seq(
      (1L, mk(base)),
      (2L, mk(base.updated(5, "changed"))),
      (3L, mk((0 until 30).map(i => s"other$i"))))
    val batch2 = Seq((4L, mk(base)))
    val dir = Files.createTempDirectory("graft-nd").toFile
    val ckpt = Files.createTempDirectory("graft-nd-ckpt").toFile
    batch1.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    batch2.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = batch1.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val q = StreamVerbs.streamingNearDupCandidates(Tbl(stream), "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
      .writeStream.format("memory").queryName("nd_out")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT DISTINCT id_a, id_b FROM nd_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch reference: same signatures, same banding, same threshold
    val docs = (batch1 ++ batch2).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
        graft.ml.Dedup.minhashSignatureRow(col("text"), 3, 16, 42L).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def bkeys(s: Seq[Long]) = (0 until 8).map(b => (b, s.slice(b * 2, b * 2 + 2)))
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      shares = bkeys(sigs(a)).zip(bkeys(sigs(b))).exists { case (x, y) => x == y }
      agree = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 16.0
      if shares && agree >= 0.5
    } yield (a, b)).toSet
    assert(expected.contains((1L, 4L)), "exact copy must be a candidate")
    assert(got == expected, s"streaming $got vs batch $expected")
  }

  test("streaming decontamination equals the batch scrub across micro-batches") {
    import spark.implicits._
    val mk = (tokens: Seq[String]) => tokens.mkString(" ")
    val benchDoc = (0 until 20).map(i => s"bench$i")
    // 1 contains a benchmark 5-gram, 2 is clean, 3 (batch 2) is a full copy
    // of a benchmark doc, 4 (batch 2) is clean
    val batch1 = Seq(
      (1L, mk(Seq("intro") ++ benchDoc.slice(3, 8) ++ Seq("outro"))),
      (2L, mk((0 until 12).map(i => s"clean$i"))))
    val batch2 = Seq(
      (3L, mk(benchDoc)),
      (4L, mk((0 until 12).map(i => s"fresh$i"))))
    val bench = Seq(Tuple1(mk(benchDoc))).toDF("text")
    val dir = Files.createTempDirectory("graft-dc").toFile
    val ckpt = Files.createTempDirectory("graft-dc-ckpt").toFile
    batch1.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    batch2.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = batch1.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val q = StreamVerbs.streamingDecontaminate(Tbl(stream), "doc_id", "text",
        bench, "text", n = 5) { clean =>
        kept ++= clean.select("doc_id").collect().map(_.getLong(0))
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batchRef = graft.ml.Dedup.decontaminate(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text",
        bench, "text", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchRef == Set(2L, 4L), s"batch scrub kept $batchRef")
    assert(kept.toSet == batchRef,
      s"streaming kept ${kept.toSet} vs batch $batchRef")
  }

  test("streaming frequent-line scrub equals the batch dropFrequentLines") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "alpha one\nSUBSCRIBE NOW\nbeta two"),
      (101L, "SUBSCRIBE NOW\ngamma three"),
      (102L, "delta four\nSUBSCRIBE NOW"),
      (103L, "epsilon five")).toDF("doc_id", "text")
    val offenders = graft.ml.Dedup.lineDocFrequencies(corpus, "doc_id", "text", minLen = 3)
      .where(col("doc_freq") > 2)
    val arrivals = Seq(
      (1L, "fresh line here\nSUBSCRIBE NOW\nmore fresh"),
      (2L, "SUBSCRIBE NOW"),
      (3L, "untouched doc"))
    val dir = Files.createTempDirectory("graft-sdfl").toFile
    val ckpt = Files.createTempDirectory("graft-sdfl-ckpt").toFile
    arrivals.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map[Long, String]()
    val q = StreamVerbs.streamingDropFrequentLines(
        Tbl(stream), "doc_id", "text", offenders) { clean =>
        clean.collect().foreach(r => got(r.getLong(0)) = r.getString(1))
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(got.toMap == Map(
      1L -> "fresh line here\nmore fresh",
      2L -> "",
      3L -> "untouched doc"))
  }

  test("streaming quota sample converges to the batch per-stratum top-k") {
    import spark.implicits._
    // two micro-batches; the batch-2 high scorer must evict a batch-1 row
    val batch1 = Seq(("a", 1L, 5.0), ("a", 2L, 3.0), ("a", 3L, 1.0),
                     ("b", 4L, 9.0))
    val batch2 = Seq(("a", 5L, 4.0), ("b", 6L, 2.0))
    val dir = Files.createTempDirectory("graft-qs").toFile
    val ckpt = Files.createTempDirectory("graft-qs-ckpt").toFile
    batch1.toDF("g", "id", "score").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    batch2.toDF("g", "id", "score").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = batch1.toDF("g", "id", "score").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    // track the LATEST emission per group (Update-mode semantics)
    val latest = scala.collection.mutable.Map[String, Seq[(Long, Double, Long)]]()
    val q = StreamVerbs.streamingQuotaSample(Tbl(stream), "g", "id", "score", k = 2)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().groupBy(_.getString(0)).foreach { case (g, rows) =>
          latest(g) = rows.map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
        }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batchRef = Tbl((batch1 ++ batch2).toDF("g", "id", "score"))
      .sampleQuota(Seq("g"), Seq(col("score").desc, col("id")), k = 2)
      .df.collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    val got = latest.toSeq
      .flatMap { case (g, rows) => rows.map(r => g -> r._1) }.toSet
    assert(got == batchRef, s"streaming $got vs batch $batchRef")
    // a's quota: 5.0 (id 1) and 4.0 (id 5) — the 3.0 row was evicted
    assert(latest("a").map(_._1).toSet == Set(1L, 5L))
  }

  test("streaming quantile sample equals the batch sampled quantiles") {
    import spark.implicits._
    // integer x + dyadic probs -> interpolation is exact on both paths
    val rows = (1L to 400L).map(i => (if (i % 3 == 0) "a" else "b", i,
      (i * 37 % 1000).toDouble))
    val (b1, b2) = rows.splitAt(250)
    val dir = Files.createTempDirectory("graft-sq").toFile
    val ckpt = Files.createTempDirectory("graft-sq-ckpt").toFile
    b1.toDF("g", "id", "x").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    b2.toDF("g", "id", "x").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = b1.toDF("g", "id", "x").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val latest = scala.collection.mutable.Map[String, Seq[Double]]()
    val q = StreamVerbs.streamingQuantileSample(Tbl(stream), "g", "id", "x",
        probs = Seq(0.25, 0.5), k = 60)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => latest(r.getString(0)) = r.getSeq[Double](1))
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batchRef = Tbl(rows.toDF("g", "id", "x")).groupBy("g")
      .quantilesBySample(col("x"), Seq(0.25, 0.5), k = 60,
        sampleKey = Seq(col("id")))
      .df.collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(latest.toMap == batchRef, s"stream $latest vs batch $batchRef")
  }

  test("streaming kmeans assignment equals the batch assign on fixed centroids") {
    import spark.implicits._
    val pts = (0 until 60).map { i =>
      val c = i % 3
      val base = Seq(Seq(1000.0, 0.0), Seq(0.0, 1000.0), Seq(700.0, 700.0))(c)
      (i.toLong, base.map(_ + (i % 7 - 3).toDouble))
    }
    val df = pts.toDF("vec_id", "embedding")
    val (_, cents) = graft.ml.Clustering.kmeansFit(df, k = 3, iters = 2,
      initHash = Some(col("vec_id")))
    val centsFixed = cents.cache()
    val dir = Files.createTempDirectory("graft-ska").toFile
    val ckpt = Files.createTempDirectory("graft-ska-ckpt").toFile
    df.repartition(2).write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(df.schema).parquet(dir.getAbsolutePath)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = StreamVerbs.streamingKmeansAssign(Tbl(stream), centsFixed) { b =>
      out ++= b.collect().map(r => (r.getLong(0), r.getLong(1)))
    }.option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = graft.ml.Clustering.assign(df, centsFixed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.toSet == batch)
  }

  test("heavy_hitters sketch aggregates over a stream and equals batch") {
    // the Misra-Gries buffer is serialized into the state store between
    // micro-batches and merged on the next one — the mergeable-summary
    // property is exactly what incremental streaming aggregation needs
    val dir = Files.createTempDirectory("graft-hh-stream").toFile
    val out = Files.createTempDirectory("graft-hh-ckpt").toFile
    try {
      val events = mkEvents()
      events.write.mode("overwrite").parquet(dir.getAbsolutePath)
      val stream = spark.readStream.schema(events.schema).parquet(dir.getAbsolutePath)
      def agg(df: org.apache.spark.sql.DataFrame) =
        StreamVerbs.windowedHeavyHitters(Tbl(df), "ts", "2 minutes",
          col("etype"), 8).df
      val q = agg(stream).writeStream
        .format("memory").queryName("hh_stream")
        .option("checkpointLocation", out.getAbsolutePath)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      def tidy(df: org.apache.spark.sql.DataFrame) = df
        .select(col("window.start").as("ws"), explode(col("hh")).as("e"))
        .select(col("ws"), col("e.item").as("item"), col("e.est_count").as("n"))
      val streamed = tidy(spark.table("hh_stream"))
      val batch = tidy(agg(events))
      TestSpark.assertSameRows(streamed, batch)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("streaming KNN retrieval equals the batch knnJoin against the same corpus") {
    val dir = Files.createTempDirectory("graft-knn-stream").toFile
    val ckpt = Files.createTempDirectory("graft-knn-ckpt").toFile
    try {
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val corpus = emb.filter(col("vec_id") % 2 === 0)
      val queries = emb.filter(col("vec_id") % 2 === 1).limit(20)
      queries.write.mode("overwrite").parquet(dir.getAbsolutePath)
      val stream = spark.readStream.schema(queries.schema)
        .parquet(dir.getAbsolutePath)
      val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      val q = StreamVerbs.streamingKnnJoin(Tbl(stream), corpus,
          k = 2, dim = 64, nPlanes = 6, nTables = 8) { out =>
          got ++= out.select("query_id", "item_id", "rk").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
        }
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val batch = graft.ml.Similarity.knnJoin(queries, corpus,
          k = 2, dim = 64, nPlanes = 6, nTables = 8)
        .select("query_id", "item_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
      assert(got.toSet == batch, s"stream ${got.size} vs batch ${batch.size}")
      assert(batch.nonEmpty)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("map-only curation ops (cleanText/redactPii/tokenCount) run unchanged on a stream") {
    import spark.implicits._
    val rows = Seq(
      (1L, "<p>hi</p> mail a@b.io see https://x.y/z"),
      (2L, "two  spaced   words"))
    val dir = Files.createTempDirectory("graft-mapops").toFile
    rows.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = rows.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
    // the exact batch verb chain, applied to the streaming frame
    def chain(df: org.apache.spark.sql.DataFrame) =
      Tbl(df).mutate(
          "clean" -> graft.text.TextFns.cleanText(col("text")),
          "red"   -> graft.text.TextFns.redactPii(col("text")),
          "n_tok" -> graft.text.TextFns.tokenCount(col("text")).cast("long"),
          // repetition filter + URL normalize are map-only too: the whole
          // ingest-quality gate runs per-micro-batch with zero state
          "keep"  -> graft.text.TextFns.repetitionKeep(col("text")),
          "norm"  -> graft.text.UrlFns.normalizeUrl(
                       concat(lit("HTTP://H.io:80/d/"), col("doc_id"), lit("?b=2&a=1#f"))))
        .select(Seq("doc_id", "clean", "red", "n_tok", "keep", "norm"): _*).df
    val q = chain(stream)
      .writeStream.format("memory").queryName("mapops_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT * FROM mapops_out").collect()
      .map(_.toSeq).toSet
    val want = chain(rows.toDF("doc_id", "text")).collect()
      .map(_.toSeq).toSet
    assert(got == want)
    assert(want.forall(r => r(5) ==
      s"http://h.io/d/${r(0)}?a=1&b=2"))
  }

  test("streaming resample: closed buckets equal batch resample; ticker emits gap rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-rs").toFile
    val ckpt = Files.createTempDirectory("graft-rs-ckpt").toFile
    try {
      val data = Seq(
        ("a", "2024-01-01 00:00:10", 1.0),
        ("a", "2024-01-01 00:00:40", 2.0),
        ("b", "2024-01-01 00:01:05", 3.0),
        ("a", "2024-01-01 00:03:20", 5.0)
      ).toDF("k", "ts_s", "v").withColumn("ts", col("ts_s").cast("timestamp"))
        .drop("ts_s")
      // file 1: the data; file 2: a flush sentinel far in the future, so the
      // watermark passes every real bucket. maxFilesPerTrigger=1 forces them
      // into separate micro-batches (watermarks only advance between batches)
      data.coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
      Thread.sleep(1000) // distinct mtimes: the source must see data first
      Seq(("zz", "2024-01-01 00:10:00", 0.0)).toDF("k", "ts_s", "v")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)

      val stream = spark.readStream.schema(data.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
      val q = StreamVerbs.streamingResample(Tbl(stream), "k", "ts", "v",
          "minute", "0 seconds")
        .writeStream.format("memory").queryName("rs_out")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)

      val streamed = spark.sql("SELECT * FROM rs_out").where(col("k") =!= "zz")
      // each key emits exactly once per bucket from its first bucket to the
      // last one the watermark closed (00:09), INCLUDING trailing ticker rows
      val counts = streamed.groupBy("k").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("a" -> 10L, "b" -> 9L), s"ticker rows: $counts")
      // the buckets inside each key's own data span must equal the batch verb
      val batch = graft.ops.Resample.resample(data, col("ts"), "minute",
          Seq("k"), Seq("n" -> count(lit(1)), "sum" -> sum(col("v")),
                        "min" -> min(col("v")), "max" -> max(col("v"))),
          fill = Map("n" -> lit(0L)))
      val spans = data.groupBy("k").agg(
        date_trunc("minute", min(col("ts"))).as("lo"),
        date_trunc("minute", max(col("ts"))).as("hi"))
      TestSpark.assertSameRows(
        streamed.join(spans, "k")
          .where(col("bucket").between(col("lo"), col("hi")))
          .drop("lo", "hi"),
        batch, "stream-vs-batch resample")
      // gap rows carry n=0 and NULL aggregates
      val gap = streamed.where(col("k") === "a" &&
        col("bucket") === lit("2024-01-01 00:01:00").cast("timestamp")).head()
      assert(gap.getLong(2) == 0L && gap.isNullAt(3) && gap.isNullAt(4))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("transformWithState running totals (Spark 4 stateful API)") {
    // transformWithState needs a multi-column-family store: RocksDB
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = java.nio.file.Files.createTempDirectory("graft-tws").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-ckpt").toFile
    val events = mkEvents()
    events.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(events.schema).parquet(dir.getAbsolutePath)
    val q = StreamVerbs.runningTotalsTws(Tbl(stream), "etype", "value")
      .writeStream.format("memory").queryName("tws_out")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql(
      "SELECT key, max(running_n) n, max(running_sum) s FROM tws_out GROUP BY 1")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows("click") == (3L, 7.0))
    assert(rows("view") == (3L, 13.0))
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming winnow candidates INDEXED: identical to the flat form, " +
      "probe prunes to its batch's fp_part partitions") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "aa bb cc dd ee ff gg hh xx yy zz qq ww rr tt uu"),
      (101L, "totally different words here nothing shared at all everywhere"),
      (102L, "aa bb cc dd ee ff gg hh completely reworded second half body")
    ).toDF("doc_id", "text")
    val idxDir = Files.createTempDirectory("graft-swci-idx").toFile
    graft.ml.Dedup.buildWinnowIndex(spark, corpus, "doc_id", "text",
      idxDir.getAbsolutePath, n = 5, w = 4, parts = 8)
    val arrivals = Seq(
      (1L, "intro aa bb cc dd ee ff gg hh outro closing words"),
      (2L, "unrelated text with zero overlap against anything stored"))
    val dir = Files.createTempDirectory("graft-swci").toFile
    val ckpt = Files.createTempDirectory("graft-swci-ckpt").toFile
    arrivals.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = StreamVerbs.streamingWinnowCandidatesIndexed(
        Tbl(stream), "doc_id", "text", idxDir.getAbsolutePath,
        minShared = 1) { c =>
        c.collect().foreach(r =>
          got += ((r.getLong(0), r.getLong(1), r.getLong(2))))
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // flat twin over the same corpus/arrivals
    val fps = graft.ml.Dedup.winnowFingerprints(corpus, "doc_id", "text",
        n = 5, w = 4).select(col("doc_id").as("id_corpus"), col("fp"))
      .distinct()
    val nf = graft.ml.Dedup.winnowFingerprints(
        arrivals.toDF("doc_id", "text"), "doc_id", "text", n = 5, w = 4)
      .select(col("doc_id").as("id_new"), col("fp")).distinct()
    val flat = nf.join(fps, "fp").groupBy("id_new", "id_corpus")
      .agg(count(lit(1)).as("n_shared")).where(col("n_shared") >= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.toSet == flat && flat.nonEmpty, s"${got.toSet} vs $flat")
    assert(got.exists(t => t._1 == 1L && t._2 == 100L))
    assert(!got.exists(t => t._1 == 2L))
  }

  test("streaming winnow candidates: arriving near-dup found against persisted fps") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "aa bb cc dd ee ff gg hh xx yy zz qq ww rr tt uu"),
      (101L, "totally different words here nothing shared at all everywhere")
    ).toDF("doc_id", "text")
    val fps = graft.ml.Dedup.winnowFingerprints(corpus, "doc_id", "text",
      n = 5, w = 4).select(col("doc_id"), col("fp"))
    val arrivals = Seq(
      (1L, "intro aa bb cc dd ee ff gg hh outro closing words"),
      (2L, "unrelated text with zero overlap against anything stored"))
    val dir = Files.createTempDirectory("graft-swc").toFile
    val ckpt = Files.createTempDirectory("graft-swc-ckpt").toFile
    arrivals.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = StreamVerbs.streamingWinnowCandidates(
        Tbl(stream), "doc_id", "text", fps, n = 5, w = 4, minShared = 1) { c =>
        c.collect().foreach(r =>
          got += ((r.getLong(0), r.getLong(1), r.getLong(2))))
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(got.exists(t => t._1 == 1L && t._2 == 100L && t._3 >= 1L), got)
    assert(!got.exists(t => t._1 == 2L), got)
  }

  test("streaming bm25 tag: parity with batch against the same frozen stats") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "join hash merge table"),
      (101L, "stream window batch state"),
      (102L, "scan filter table column")).toDF("doc_id", "text")
    val topics = Seq((1L, "join hash"), (2L, "stream window"))
      .toDF("topic_id", "ttext")
    val stats = graft.text.Search.bm25TopicStats(corpus, "doc_id", "text",
      topics, "topic_id", "ttext")
    val arrivals = Seq((1L, "big join hash pipeline"), (2L, "window stream"))
    val dir = Files.createTempDirectory("graft-sbt25").toFile
    val ckpt = Files.createTempDirectory("graft-sbt25-ckpt").toFile
    arrivals.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Long)]()
    val q = StreamVerbs.streamingBm25Tag(
        Tbl(stream), "doc_id", "text", stats, k1 = 1.25, b = 0.75) { tagged =>
        tagged.collect().foreach(r =>
          got += ((r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))))
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = graft.text.Search.bm25TagAgainst(
        arrivals.toDF("doc_id", "text"), "doc_id", "text", stats,
        k1 = 1.25, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got.toSet == batch && batch.nonEmpty)
  }

  test("streaming bm25 stats: cumulative merge across batches == from-scratch") {
    import spark.implicits._
    val topics = Seq((1L, "join hash"), (2L, "stream window"))
      .toDF("topic_id", "ttext")
    val batch1 = Seq((100L, "join hash merge table"),
      (101L, "stream window batch state"))
    val batch2 = Seq((102L, "scan filter table column join"),
      (103L, "hash hash window"))
    val dir = Files.createTempDirectory("graft-sbst").toFile
    val ckpt = Files.createTempDirectory("graft-sbst-ckpt").toFile
    // two parquet files + maxFilesPerTrigger=1 → two microbatches
    batch1.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    batch2.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = batch1.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    var last: Seq[(Long, String, Long, Long, Long)] = Nil
    var nBatches = 0
    val q = StreamVerbs.streamingBm25Stats(
        Tbl(stream), "doc_id", "text", topics, "topic_id", "ttext") { st =>
        nBatches += 1
        last = st.collect().map(r => (r.getLong(r.fieldIndex("topic_id")),
          r.getString(r.fieldIndex("term")), r.getLong(r.fieldIndex("df")),
          r.getLong(r.fieldIndex("n_docs")),
          r.getLong(r.fieldIndex("sum_dl")))).toSeq
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(nBatches == 2, s"expected two microbatches, got $nBatches")
    val scratch = graft.text.Search.bm25TopicStats(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text",
        topics, "topic_id", "ttext")
      .collect().map(r => (r.getLong(r.fieldIndex("topic_id")),
        r.getString(r.fieldIndex("term")), r.getLong(r.fieldIndex("df")),
        r.getLong(r.fieldIndex("n_docs")),
        r.getLong(r.fieldIndex("sum_dl")))).toSet
    assert(last.toSet == scratch && scratch.nonEmpty,
      s"cumulative ${last.toSet} vs scratch $scratch")
  }

  test("streaming semantic dedup: perturbed copies dropped, novel vectors pass; batch == stream") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("qv", transform(col("embedding").cast("array<double>"),
        x => floor(x * 1000000.0).cast("double")))
      .select("vec_id", "qv")
    val (assigned, centroids) = graft.ml.Clustering.kmeansFit(
      emb, k = 4, iters = 1, idCol = "vec_id", vecCol = "qv")
    val corpus = emb.join(assigned, "vec_id").localCheckpoint()
    // arrivals: near-copies of two corpus vectors (must drop) + the same
    // two with alternating sign flips (near-orthogonal -> must survive)
    val base = emb.filter(col("vec_id") < 2)
    val dups = base.withColumn("vec_id", col("vec_id") + 5000000)
    val novel = base.withColumn("vec_id", col("vec_id") + 6000000)
      .withColumn("qv", expr(
        "transform(qv, (x, i) -> CAST(IF(i % 2 = 0, x, -x) AS DOUBLE))"))
    val arrivals = dups.unionByName(novel).localCheckpoint()
    val dir = Files.createTempDirectory("graft-ssd").toFile
    val ckpt = Files.createTempDirectory("graft-ssd-ckpt").toFile
    arrivals.repartition(1).write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(arrivals.schema)
      .parquet(dir.getAbsolutePath)
    var got: Set[Long] = Set.empty
    val q = StreamVerbs.streamingSemanticDedup(
        Tbl(stream), "vec_id", "qv", centroids, corpus, threshold = 0.999) {
        out => got = out.collect().map(_.getLong(0)).toSet
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(got == Set(6000000L, 6000001L), s"survivors: $got")
    val batch = graft.ml.Dedup.semanticDedupAgainstCorpus(arrivals,
        "vec_id", "qv", centroids, corpus, threshold = 0.999)
      .collect().map(_.getLong(0)).toSet
    assert(batch == got, s"batch $batch vs stream $got")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("streaming count-min: cumulative merge across batches == from-scratch build") {
    import spark.implicits._
    val batch1 = Seq(1L, 2L, 2L, 3L, 3L, 3L)
    val batch2 = Seq(2L, 3L, 4L, 4L, 4L, 4L)
    val dir = Files.createTempDirectory("graft-scm").toFile
    val ckpt = Files.createTempDirectory("graft-scm-ckpt").toFile
    batch1.toDF("k").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    batch2.toDF("k").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batch1.toDF("k").schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    var last: Set[(Int, Long, Long)] = Set.empty
    var nBatches = 0
    val q = StreamVerbs.streamingCountMin(
        Tbl(stream), col("k"), width = 32, depth = 3) { sk =>
        nBatches += 1
        last = sk.collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(nBatches == 2, s"expected two microbatches, got $nBatches")
    val scratch = graft.ops.Sketch.countMin(
        (batch1 ++ batch2).toDF("k"), col("k"), 32, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(last == scratch && scratch.nonEmpty, s"$last vs $scratch")
  }

  test("streaming quantile sketch: cumulative merge across batches == from-scratch (exact regime)") {
    import spark.implicits._
    val batch1 = Seq(("g", 5.0), ("g", 1.0), ("g", 9.0), ("h", 2.0))
    val batch2 = Seq(("g", 3.0), ("g", 7.0), ("h", 4.0), ("h", 6.0))
    val dir = Files.createTempDirectory("graft-sqs").toFile
    val ckpt = Files.createTempDirectory("graft-sqs-ckpt").toFile
    batch1.toDF("grp", "x").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    batch2.toDF("grp", "x").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batch1.toDF("grp", "x").schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    var last: Set[(String, Int, Double, Long)] = Set.empty
    var nBatches = 0
    val q = StreamVerbs.streamingQuantileSketch(
        Tbl(stream), Seq("grp"), col("x"), k = 64) { sk =>
        nBatches += 1
        last = sk.collect().map(r =>
          (r.getString(0), r.getInt(r.fieldIndex("lvl")),
           r.getDouble(r.fieldIndex("v")), r.getLong(r.fieldIndex("w")))).toSet
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(nBatches == 2, s"expected two microbatches, got $nBatches")
    // exact regime (k above the stream size): merged sketch == one-pass
    // build, and its estimates are exact order statistics
    val scratch = graft.ops.Sketch.quantileSketchByGroup(
        (batch1 ++ batch2).toDF("grp", "x"), Seq("grp"), col("x"), 64)
      .collect().map(r =>
        (r.getString(0), r.getInt(r.fieldIndex("lvl")),
         r.getDouble(r.fieldIndex("v")), r.getLong(r.fieldIndex("w")))).toSet
    assert(last == scratch && scratch.nonEmpty, s"$last vs $scratch")
  }

  test("streaming corpus card: per-batch fold equals the batch corpusReport") {
    import spark.implicits._
    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the den"),
      (2L, "der hund und die katze und das haus ist hier und der baum alt"))
    val batch2 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog and runs to the den"), // dup of 1
      (4L, "the cat and the dog and the bird sing to the moon all night is"))
    val dir = Files.createTempDirectory("graft-scard").toFile
    val ckpt = Files.createTempDirectory("graft-scard-ckpt").toFile
    batch1.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    batch2.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batch1.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    var last: Seq[org.apache.spark.sql.Row] = Nil
    var nBatches = 0
    val q = StreamVerbs.streamingCorpusReport(
        Tbl(stream), "doc_id", "text") { card =>
        nBatches += 1
        last = card.collect().toSeq
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(nBatches == 2)
    val batchCard = graft.ops.Checks.corpusReport(
      (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text").collect().toSeq
    assert(last.map(_.toSeq) === batchCard.map(_.toSeq),
      s"stream $last vs batch $batchCard")
    val r = last.head
    assert(r.getLong(r.fieldIndex("dup_docs")) === 1L)
    assert(r.getString(r.fieldIndex("top_lang")) === "en")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("streaming PQ encode equals the batch encode against frozen codebooks") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val cb = graft.ml.Dedup.trackCache(
      graft.ml.Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 1))
    val dir = Files.createTempDirectory("graft-spq").toFile
    val ckpt = Files.createTempDirectory("graft-spq-ckpt").toFile
    emb.filter(col("vec_id") < 20).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    emb.filter(col("vec_id") >= 20 && col("vec_id") < 40).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map.empty[Long, Seq[Int]]
    val q = StreamVerbs.streamingPqEncode(
        Tbl(stream), cb, "vec_id", "embedding", 4) { codes =>
        codes.collect().foreach(r =>
          got(r.getLong(0)) = r.getSeq[Int](1))
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batchCodes = graft.ml.Pq.encode(emb.filter(col("vec_id") < 40), cb,
        "vec_id", "embedding", 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got.toMap === batchCodes && batchCodes.size === 40)
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("streaming LM score == batch score against the frozen gram table") {
    import spark.implicits._
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "cats and dogs and cats")).toDF("doc_id", "text")
    val grams = graft.text.Lm.ngramCounts(ref, "text", n = 2)
    val v = graft.text.Lm.vocabSize(ref, "text")
    val arrivals = Seq(
      (10L, "the cat sat"), (11L, "dogs and cats"),
      (12L, "unseen words entirely"), (13L, "x"))
    val dir = Files.createTempDirectory("graft-slm").toFile
    val ckpt = Files.createTempDirectory("graft-slm-ckpt").toFile
    arrivals.take(2).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    arrivals.drop(2).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    val q = StreamVerbs.streamingLmScore(Tbl(stream), "doc_id", "text",
        grams, n = 2, vocab = v) { out =>
        got.synchronized { out.collect().foreach(r =>
          got(r.getLong(0)) = (r.getLong(1), r.getDouble(2))) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = graft.text.Lm.scoreDocs(arrivals.toDF("doc_id", "text"),
        "doc_id", "text", grams, n = 2, vocab = v)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.toMap == batch && batch.size == 4,
      s"stream $got vs batch $batch")
  }

  test("streaming Stupid Backoff score against the persisted model == batch") {
    import spark.implicits._
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "cats and dogs and cats")).toDF("doc_id", "text")
    val model = Files.createTempDirectory("graft-slmb-model").toString
    graft.text.Lm.buildBackoffModel(ref, "text", model, n = 3)
    val arrivals = Seq(
      (10L, "the cat sat on a rug"), (11L, "dogs and cats"),
      (12L, "entirely unseen words here"), (13L, "x"))
    val dir = Files.createTempDirectory("graft-slmb").toFile
    val ckpt = Files.createTempDirectory("graft-slmb-ckpt").toFile
    arrivals.take(2).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    arrivals.drop(2).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    val q = StreamVerbs.streamingLmScoreBackoff(Tbl(stream), "doc_id",
        "text", model) { out =>
        got.synchronized { out.collect().foreach(r =>
          got(r.getLong(0)) = (r.getLong(1), r.getDouble(2))) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = graft.text.Lm.scoreDocsFromModel(spark, model,
        arrivals.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.toMap == batch && batch.size == 4,
      s"stream $got vs batch $batch")
  }

  test("streaming admission chain == batch-by-batch " +
       "(quality -> decontaminate -> ingest dedup)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val standing = docs.filter(col("doc_id") % 2 === 0)
    val bench = standing.filter(col("doc_id") % 5 === 0)
    val pred = col("n_chars") >= 150
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val b1 = odd.filter(col("doc_id") % 4 === 1)
    val b2 = odd.filter(col("doc_id") % 4 === 3)
    // streaming run: two micro-batches through the chain, shared index
    val idxS = Files.createTempDirectory("graft-sadm-idx").toString
    graft.ml.Dedup.buildMinhashIndex(standing, "doc_id", "text", idxS,
      n = 3, bands = 16, rows = 2, seed = 42L, portable = true)
    val dir = Files.createTempDirectory("graft-sadm").toFile
    val ckpt = Files.createTempDirectory("graft-sadm-ckpt").toFile
    b1.repartition(1).write.mode("append").parquet(dir.getAbsolutePath)
    b2.repartition(1).write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Set.empty[Long]
    val q = StreamVerbs.streamingAdmission(Tbl(stream), "doc_id", "text",
        pred, bench, "text", idxS, contamN = 3,
        maxContaminatedFrac = 0.5, threshold = 0.3) { out =>
        got.synchronized {
          out.select("doc_id").collect().foreach(r => got += r.getLong(0))
        }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    // batch replay: the same chain run batch-by-batch on a fresh index
    val idxB = Files.createTempDirectory("graft-badm-idx").toString
    graft.ml.Dedup.buildMinhashIndex(standing, "doc_id", "text", idxB,
      n = 3, bands = 16, rows = 2, seed = 42L, portable = true)
    def admit(b: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.ml.Dedup.ingestDedup(spark, idxB,
          graft.ml.Dedup.decontaminateBloom(b.filter(pred), "doc_id",
            "text", bench, "text", n = 3, maxContaminatedFrac = 0.5),
          "doc_id", "text", threshold = 0.3)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = admit(b1) ++ admit(b2)
    assert(got.toSet == expect && expect.nonEmpty,
      s"stream ${got.size} admitted vs batch ${expect.size}")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("streaming snapshot diff against the frozen old version == batch") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "t")
    val oldPath = Files.createTempDirectory("graft-sdiff-old").toString
    old.write.mode("overwrite").parquet(oldPath)
    // arrivals: 1 unchanged, 2 changed, 5/6 added (3/4 never arrive —
    // 'removed' is undefined per batch and must not be emitted)
    val arrivals = Seq((1L, "a"), (2L, "B"), (5L, "e"), (6L, "f"))
    val dir = Files.createTempDirectory("graft-sdiff").toFile
    val ckpt = Files.createTempDirectory("graft-sdiff-ckpt").toFile
    arrivals.take(2).toDF("id", "t").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    arrivals.drop(2).toDF("id", "t").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(arrivals.toDF("id", "t").schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map.empty[Long, String]
    val q = StreamVerbs.streamingSnapshotDiff(Tbl(stream), "id", Seq("t"),
        oldPath) { out =>
        got.synchronized { out.collect().foreach(r =>
          got(r.getLong(0)) = r.getString(1)) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batchDf = arrivals.toDF("id", "t")
    val batch = graft.ops.Scale.snapshotDiff(old, batchDf, "id", Seq("t"))
      .join(batchDf.select("id"), Seq("id"), "left_semi")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.toMap == batch &&
      batch == Map(1L -> "unchanged", 2L -> "changed", 5L -> "added",
        6L -> "added"),
      s"stream $got vs batch $batch")
  }

  test("streaming linear-probe scoring against the persisted model == batch") {
    import spark.implicits._
    val ref = (1L to 60L).map(i => (i, (i * 7) % 19, (i * 3) % 11,
      (i * 13) % 23)).toDF("id", "x1", "x2", "y")
    val model = Files.createTempDirectory("graft-sprobe-model").toString
    graft.ml.Regress.saveModel(
      graft.ml.Regress.fitOls(ref, "y", Seq("x1", "x2")), model)
    val arrivals = Seq((100L, 3L, 4L, 9L), (101L, 8L, 1L, 2L),
      (102L, 0L, 0L, 0L), (103L, 18L, 10L, 22L))
    val dir = Files.createTempDirectory("graft-sprobe").toFile
    val ckpt = Files.createTempDirectory("graft-sprobe-ckpt").toFile
    arrivals.take(2).toDF("id", "x1", "x2", "y").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    arrivals.drop(2).toDF("id", "x1", "x2", "y").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("id", "x1", "x2", "y").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map.empty[Long, (Double, Double)]
    val q = StreamVerbs.streamingProbeScore(Tbl(stream), model,
        Seq("x1", "x2"), Some("y")) { out =>
        got.synchronized { out.collect().foreach(r =>
          got(r.getLong(0)) = (r.getDouble(4), r.getDouble(5))) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = graft.ml.Regress.predictFromModel(spark, model,
        arrivals.toDF("id", "x1", "x2", "y"), Seq("x1", "x2"), Some("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.toMap == batch && batch.size == 4,
      s"stream $got vs batch $batch")
  }

  test("streaming NB classification against the persisted model == batch") {
    import spark.implicits._
    val ref = Seq(
      ("news", "the election results are in today"),
      ("news", "the markets closed higher today"),
      ("sport", "the team won the cup final"),
      ("sport", "a late goal won the match")).toDF("cls", "text")
    val model = Files.createTempDirectory("graft-snb-model").toString
    graft.text.Classify.buildNbModel(ref, "cls", "text", model)
    val arrivals = Seq(
      (10L, "the election results today"), (11L, "the team won the match"),
      (12L, "entirely unseen words here"), (13L, "42"))
    val dir = Files.createTempDirectory("graft-snb").toFile
    val ckpt = Files.createTempDirectory("graft-snb-ckpt").toFile
    arrivals.take(2).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    arrivals.drop(2).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map.empty[Long, (Long, String, Double)]
    val q = StreamVerbs.streamingNbClassify(Tbl(stream), "doc_id",
        "text", model) { out =>
        got.synchronized { out.collect().foreach(r =>
          got(r.getLong(0)) = (r.getLong(1), r.getString(2),
            r.getDouble(3))) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = graft.text.Classify.classifyFromModel(spark, model,
        arrivals.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getDouble(3)))).toMap
    assert(got.toMap == batch && batch.size == 4,
      s"stream $got vs batch $batch")
  }

  test("streaming IVF-PQ probe == batch index probe (persisted index, " +
       "per-micro-batch routing)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>")).cache()
    val idx = Files.createTempDirectory("graft-sivfpq-idx").toString
    graft.ml.Pq.buildIvfPqIndex(emb, idx, "vec_id", "embedding",
      m = 4, k = 8, iters = 1, nCentroids = 8)
    // queries arrive in two micro-batches; per-query top-k depends only on
    // that query and the static index, so the streamed union must equal
    // the one-shot batch probe over all arrivals
    val dir = Files.createTempDirectory("graft-sivfpq").toFile
    val ckpt = Files.createTempDirectory("graft-sivfpq-ckpt").toFile
    emb.filter(col("vec_id") < 5).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    emb.filter(col("vec_id") >= 5 && col("vec_id") < 10).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var batches = 0
    val q = StreamVerbs.streamingIvfPqProbe(Tbl(stream), idx, k = 3,
        nProbe = 4) { out =>
        batches += 1
        got.synchronized { got ++= out.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(batches == 2)
    val batchProbe = graft.ml.Pq.adcTopKFromIndex(spark, idx,
        emb.filter(col("vec_id") < 10), k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq == batchProbe.sorted.toSeq,
      s"stream ${got.size} rows vs batch ${batchProbe.length}")
    emb.unpersist()
  }

  test("streaming two-stage retrieval (probe + exact refine) == batch " +
       "probe + refine on the same index and vector store") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>")).cache()
    val idx = Files.createTempDirectory("graft-s2s-idx").toString
    graft.ml.Pq.buildIvfPqIndex(emb, idx, "vec_id", "embedding",
      m = 4, k = 8, iters = 1, nCentroids = 8)
    val dir = Files.createTempDirectory("graft-s2s").toFile
    val ckpt = Files.createTempDirectory("graft-s2s-ckpt").toFile
    emb.filter(col("vec_id") < 5).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    emb.filter(col("vec_id") >= 5 && col("vec_id") < 10).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Long)]
    val q = StreamVerbs.streamingIvfPqRefine(Tbl(stream), idx, emb,
        k = 3, kCand = 6, nProbe = 4) { out =>
        got.synchronized { got ++= out.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // per-query answers depend only on that query and the static
    // index/vector store, so the streamed union over micro-batches must
    // equal the one-shot two-stage batch pipeline — cosines included
    val queries = emb.filter(col("vec_id") < 10)
    val cand = graft.ml.Pq.adcTopKFromIndex(spark, idx, queries,
      k = 6, nProbe = 4)
    val batch = graft.ml.Similarity.refineTopK(cand, queries, emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.sorted.toSeq == batch.sorted.toSeq && batch.length == 30,
      s"stream ${got.size} rows vs batch ${batch.length}")
    // the refined top-3 is ranked by EXACT cosine: within each query the
    // scores are nonincreasing in rk
    val byQ = batch.groupBy(_._1).values
    assert(byQ.forall(rs => rs.sortBy(_._4).map(_._3).toSeq ==
      rs.map(_._3).sorted(Ordering[Double].reverse).toSeq))
    emb.unpersist()
  }

  test("IVF-PQ append lands mid-stream: later micro-batches probe the " +
       "appended vectors without restart") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>")).cache()
    val base = emb.filter(col("vec_id") < 80)
    val extra = emb.filter(col("vec_id") >= 80 && col("vec_id") < 120)
    val idh = Some(col("vec_id"))
    // live index (appended mid-stream) + a pristine base-only replica used
    // to compute what the FIRST batch should have seen
    val idx = Files.createTempDirectory("graft-sivfpq-app").toString
    val rep = Files.createTempDirectory("graft-sivfpq-rep").toString
    for (p <- Seq(idx, rep))
      graft.ml.Pq.buildIvfPqIndex(base, p, "vec_id", "embedding",
        m = 4, k = 8, iters = 0, nCentroids = 8,
        initHash = idh, centroidHash = idh)
    val dir = Files.createTempDirectory("graft-sivfpq-app-q").toFile
    val ckpt = Files.createTempDirectory("graft-sivfpq-app-ck").toFile
    emb.filter(col("vec_id") < 5).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    emb.filter(col("vec_id") >= 5 && col("vec_id") < 10).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val perBatch =
      scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long)]]
    val q = StreamVerbs.streamingIvfPqProbe(Tbl(stream), idx, k = 3,
        nProbe = 4) { out =>
        perBatch.synchronized {
          perBatch += out.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
          // after the first batch answers, the ingest pipeline appends a
          // vector batch into the SAME index the stream is probing
          if (perBatch.size == 1)
            graft.ml.Pq.appendToIvfPqIndex(spark, idx, extra,
              "vec_id", "embedding")
        }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(perBatch.size == 2)
    def probe(path: String, lo: Long, hi: Long) =
      graft.ml.Pq.adcTopKFromIndex(spark, path,
          emb.filter(col("vec_id") >= lo && col("vec_id") < hi),
          k = 3, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch 0 answered from the base-only index; batch 1 from base+extra
    assert(perBatch(0) == probe(rep, 0L, 5L),
      "first micro-batch must see the pre-append index")
    assert(perBatch(1) == probe(idx, 5L, 10L),
      "second micro-batch must see the appended vectors")
    // and the append genuinely changed some answer for the second batch
    assert(perBatch(1) != probe(rep, 5L, 10L),
      "appended vectors never surfaced in any top-k — the pin is vacuous")
    emb.unpersist()
  }

  test("streaming span mask scrubs known duplicated grams; parity with batch Against") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "a b c d e f p q r s"),
      (101L, "a b c d e f x y z w"),
      (102L, "one two three four five six")).toDF("doc_id", "text")
    val dupGrams = graft.ml.Dedup.corpusDupGrams(corpus, "doc_id", "text", n = 4)
    val arrivals = Seq(
      (1L, "hello a b c d e f world"), // corpus-dup span inside
      (2L, "nothing shared here at all"))
    val dir = Files.createTempDirectory("graft-sms").toFile
    val ckpt = Files.createTempDirectory("graft-sms-ckpt").toFile
    arrivals.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map[Long, String]()
    val q = StreamVerbs.streamingMaskDuplicateSpans(
        Tbl(stream), "doc_id", "text", dupGrams, n = 4) { clean =>
        clean.collect().foreach(r =>
          got(r.getLong(r.fieldIndex("doc_id"))) =
            r.getString(r.fieldIndex("text")))
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(got.toMap == Map(
      1L -> "hello world",
      2L -> "nothing shared here at all"))
    // exact parity with the batch Against form on the same arrivals
    val batch = graft.ml.Dedup.maskDuplicateSpansAgainst(
        arrivals.toDF("doc_id", "text"), "doc_id", "text", dupGrams, n = 4)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text"))).toMap
    assert(batch == got.toMap)
  }

  test("streaming bucket assignment against frozen boundaries == batch") {
    import spark.implicits._
    val train = (1L to 6L).map(i => (i, "a", i * 10.0)).toDF("id", "g", "x")
    val bndPath = Files.createTempDirectory("graft-sba-bnd").toString
    graft.ops.Scale.quantileBoundaries(train, Seq("g"),
        Seq(col("x"), col("id")), col("x"), nBuckets = 3)
      .write.mode("overwrite").parquet(bndPath)
    val arrivals = Seq((10L, "a", 5.0), (11L, "a", 30.0),
      (12L, "a", 55.0), (13L, "zzz", 1.0))
    val dir = Files.createTempDirectory("graft-sba").toFile
    val ckpt = Files.createTempDirectory("graft-sba-ckpt").toFile
    arrivals.take(2).toDF("id", "g", "x").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    arrivals.drop(2).toDF("id", "g", "x").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("id", "g", "x").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map.empty[Long, Long]
    val q = StreamVerbs.streamingBucketAssign(Tbl(stream), Seq("g"),
        col("x"), bndPath) { out =>
        got.synchronized { out.collect().foreach(r =>
          got(r.getLong(0)) = r.getLong(3)) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = graft.ops.Scale.assignByBoundaries(
        arrivals.toDF("id", "g", "x"), Seq("g"), col("x"),
        spark.read.parquet(bndPath))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.toMap == batch &&
      batch == Map(10L -> 0L, 11L -> 1L, 12L -> 2L, 13L -> 0L),
      s"stream $got vs batch $batch")
  }

  test("streaming KN score against the persisted model == batch") {
    import spark.implicits._
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "cats and dogs and cats")).toDF("doc_id", "text")
    val model = Files.createTempDirectory("graft-skn-model").toString
    graft.text.Lm.buildKnModel(ref, "text", model, n = 2)
    val arrivals = Seq(
      (10L, "the cat sat on a rug"), (11L, "dogs and cats"),
      (12L, "entirely unseen words here"), (13L, "x"))
    val dir = Files.createTempDirectory("graft-skn").toFile
    val ckpt = Files.createTempDirectory("graft-skn-ckpt").toFile
    arrivals.take(2).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    arrivals.drop(2).toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = arrivals.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    val q = StreamVerbs.streamingLmScoreKN(Tbl(stream), "doc_id", "text",
        model) { out =>
        got.synchronized { out.collect().foreach(r =>
          got(r.getLong(0)) = (r.getLong(1), r.getDouble(2))) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = graft.text.Lm.scoreDocsKNFromModel(spark, model,
        arrivals.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.toMap == batch && batch.size == 4,
      s"stream $got vs batch $batch")
  }

  test("streaming ingest dedup == sequential batch ingest; the index " +
       "grows mid-stream") {
    import spark.implicits._
    val ref = Seq(
      (1L, "the cat sat on the mat today"),
      (2L, "a completely different reference document")).toDF("doc_id", "text")
    // micro-batch 2 carries a copy of a micro-batch-1 SURVIVOR: only an
    // index that grew between batches can drop it
    val a1 = Seq(
      (10L, "the cat sat on the mat today"),
      (11L, "novel first batch content about turbines"))
    val a2 = Seq(
      (20L, "novel first batch content about turbines"),
      (21L, "second batch fresh material entirely its own"))
    val streamIdx = Files.createTempDirectory("graft-smhidx-s").toString
    val batchIdx = Files.createTempDirectory("graft-smhidx-b").toString
    graft.ml.Dedup.buildMinhashIndex(ref, "doc_id", "text", streamIdx)
    graft.ml.Dedup.buildMinhashIndex(ref, "doc_id", "text", batchIdx)
    val dir = Files.createTempDirectory("graft-smhidx").toFile
    val ckpt = Files.createTempDirectory("graft-smhidx-ckpt").toFile
    a1.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    // distinct mtimes pin the file-source batch ORDER (ingest is
    // order-sensitive by design: earlier admissions shadow later copies)
    Thread.sleep(1100)
    a2.toDF("doc_id", "text").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = a1.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Set.empty[Long]
    val q = StreamVerbs.streamingIngestDedup(Tbl(stream), "doc_id", "text",
        streamIdx, threshold = 0.9) { out =>
        got.synchronized {
          out.select("doc_id").collect().foreach(r => got += r.getLong(0))
        }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val k1 = graft.ml.Dedup.ingestDedup(spark, batchIdx,
        a1.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val k2 = graft.ml.Dedup.ingestDedup(spark, batchIdx,
        a2.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.toSet == (k1 ++ k2) && got.toSet == Set(11L, 21L),
      s"stream $got vs batch ${k1 ++ k2}")
    // the two indexes ended in the same state: same admitted signatures
    // in the same batch_seq partitions
    // batch_seq is a partition directory column: discovery infers int
    def sigState(p: String) = spark.read.parquet(s"$p/sigs")
      .select(col("id"), col("batch_seq").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sigState(streamIdx) == sigState(batchIdx))
  }

  test("streaming ingest dedup with auto-compaction: admissions identical " +
      "to the uncompacted stream; the partition count stays bounded") {
    import spark.implicits._
    val ref = Seq(
      (1L, "the cat sat on the mat today"),
      (2L, "a completely different reference document")).toDF("doc_id", "text")
    // four micro-batches; batch k+1 carries a copy of a batch-k survivor,
    // so admissions depend on index growth ACROSS every compaction
    val arrivals = Seq(
      Seq((10L, "the cat sat on the mat today"),
          (11L, "novel first batch content about turbines")),
      Seq((20L, "novel first batch content about turbines"),
          (21L, "second batch fresh material entirely its own")),
      Seq((30L, "second batch fresh material entirely its own"),
          (31L, "third batch subject matter unlike the others")),
      Seq((40L, "third batch subject matter unlike the others"),
          (41L, "fourth batch closing content all new words")))
    val cIdx = Files.createTempDirectory("graft-smhc-c").toString
    val pIdx = Files.createTempDirectory("graft-smhc-p").toString
    graft.ml.Dedup.buildMinhashIndex(ref, "doc_id", "text", cIdx)
    graft.ml.Dedup.buildMinhashIndex(ref, "doc_id", "text", pIdx)
    def runStream(idx: String, every: Int): Set[Long] = {
      val dir = Files.createTempDirectory("graft-smhc-in").toFile
      val ckpt = Files.createTempDirectory("graft-smhc-ck").toFile
      arrivals.foreach { a =>
        a.toDF("doc_id", "text").repartition(1)
          .write.mode("append").parquet(dir.getAbsolutePath)
        Thread.sleep(1100) // distinct mtimes pin batch order
      }
      val stream = spark.readStream
        .schema(arrivals.head.toDF("doc_id", "text").schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
      val got = scala.collection.mutable.Set.empty[Long]
      val q = StreamVerbs.streamingIngestDedup(Tbl(stream), "doc_id",
          "text", idx, threshold = 0.9, compactEvery = every) { out =>
          got.synchronized {
            out.select("doc_id").collect().foreach(r => got += r.getLong(0))
          }
        }
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
      got.toSet
    }
    val compacted = runStream(cIdx, every = 2)
    val plain = runStream(pIdx, every = 0)
    assert(compacted == plain && compacted == Set(11L, 21L, 31L, 41L),
      s"compacted $compacted vs plain $plain")
    def nParts(p: String) = spark.read.parquet(s"$p/sigs")
      .select(col("batch_seq").cast("long")).distinct().count()
    // plain: base + 4 ingest partitions; compacted: bounded at base+last
    // plus at most compactEvery-1 fresh partitions since the last sweep
    assert(nParts(pIdx) == 5L, s"plain grew ${nParts(pIdx)}")
    assert(nParts(cIdx) <= 3L, s"compaction must bound: ${nParts(cIdx)}")
    // same standing ids either way
    def ids(p: String) = spark.read.parquet(s"$p/sigs")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(cIdx) == ids(pIdx))
  }

  test("streaming winnow ingest == sequential batch winnowIngest with " +
      "mid-stream growth; the compaction rider bounds partitions with " +
      "identical admissions") {
    import spark.implicits._
    val ref = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    // batch k+1 copies a batch-k survivor: only index GROWTH drops it
    val arrivals = Seq(
      Seq((10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
          (11L, "turbine blades hum across the northern valley ridge line")),
      Seq((20L, "turbine blades hum across the northern valley ridge line"),
          (21L, "granite slabs weather slowly under coastal winter rain")),
      Seq((30L, "granite slabs weather slowly under coastal winter rain"),
          (31L, "ledger entries reconcile nightly before the audit window")))
    def buildIdx(): String = {
      val p = Files.createTempDirectory("graft-swing-idx").toString
      graft.ml.Dedup.buildWinnowIndex(spark, ref, "doc_id", "text", p,
        n = 5, w = 4, parts = 8)
      p
    }
    def runStream(idx: String, every: Int): Set[Long] = {
      val dir = Files.createTempDirectory("graft-swing-in").toFile
      val ckpt = Files.createTempDirectory("graft-swing-ck").toFile
      arrivals.foreach { a =>
        a.toDF("doc_id", "text").repartition(1)
          .write.mode("append").parquet(dir.getAbsolutePath)
        Thread.sleep(1100) // distinct mtimes pin batch order
      }
      val stream = spark.readStream
        .schema(arrivals.head.toDF("doc_id", "text").schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
      val got = scala.collection.mutable.Set.empty[Long]
      val q = StreamVerbs.streamingWinnowIngest(Tbl(stream), "doc_id",
          "text", idx, minShared = 1, compactEvery = every) { out =>
          got.synchronized {
            out.select("doc_id").collect().foreach(r => got += r.getLong(0))
          }
        }
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
      got.toSet
    }
    val pIdx = buildIdx()
    val cIdx = buildIdx()
    val streamed = runStream(pIdx, every = 0)
    val compacted = runStream(cIdx, every = 1)
    // sequential batch twin
    val bIdx = buildIdx()
    val batchGot = arrivals.flatMap { a =>
      graft.ml.Dedup.winnowIngest(spark, bIdx, a.toDF("doc_id", "text"),
          "doc_id", "text", minShared = 1)
        .select("doc_id").collect().map(_.getLong(0))
    }.toSet
    assert(streamed == batchGot && streamed == Set(11L, 21L, 31L),
      s"stream $streamed vs batch $batchGot")
    assert(compacted == streamed,
      s"compaction rider must not change admissions: $compacted")
    // the rider bounds the fp partition count (every batch folds to the
    // base) while the plain stream accumulates one per ingested batch
    def nParts(p: String) = spark.read.parquet(s"$p/fps")
      .select(col("batch_seq").cast("long")).distinct().count()
    assert(nParts(cIdx) == 1L, s"rider must fold: ${nParts(cIdx)}")
    assert(nParts(pIdx) == 4L, s"plain grew ${nParts(pIdx)}")
    // identical standing (id, fp) rows either way
    def fpRows(p: String) = spark.read.parquet(s"$p/fps")
      .select("id", "fp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fpRows(cIdx) == fpRows(pIdx))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("streaming SQ8 probe == batch probe against the persisted index") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val idx = Files.createTempDirectory("graft-sq-stream").toString
    graft.ml.Sq.buildSqIndex(emb, idx)
    val queries = emb.filter(col("vec_id") < 6)
      .select("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft-sqq").toFile
    val ckpt = Files.createTempDirectory("graft-sqq-ckpt").toFile
    // two micro-batches of query vectors
    queries.filter(col("vec_id") < 3).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    queries.filter(col("vec_id") >= 3).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val q = StreamVerbs.streamingSqProbe(Tbl(stream), idx, k = 3) { out =>
        got.synchronized {
          out.collect().foreach(r => got += ((r.getLong(0), r.getLong(1),
            r.getInt(3).toLong)))
        }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = graft.ml.Sq.sqTopKFromIndex(spark, idx, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3).toLong))
      .toSet
    assert(got.toSet == batch && batch.size == 18,
      s"stream ${got.size} vs batch ${batch.size}")
  }

  test("streaming tokenize == batch encode against the persisted tokenizer") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val tok = Files.createTempDirectory("graft-stok").toString
    // train on the even half; the stream serves odd docs (unseen words
    // fall back to characters — the artifact still encodes them)
    graft.text.Bpe.buildTokenizer(docs.filter(col("doc_id") % 2 === 0),
      "text", tok, nMerges = 4)
    val odd = docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 40)
    val dir = Files.createTempDirectory("graft-stok-in").toFile
    val ckpt = Files.createTempDirectory("graft-stok-ckpt").toFile
    odd.filter(col("doc_id") < 20).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    odd.filter(col("doc_id") >= 20).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(odd.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map.empty[Long, String]
    val q = StreamVerbs.streamingTokenize(Tbl(stream), tok,
        "doc_id", "text") { out =>
        got.synchronized {
          out.select(col("doc_id"), concat_ws(" ", col("ids")).as("i"))
            .collect().foreach(r => got(r.getLong(0)) = r.getString(1))
        }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batch = graft.text.Bpe
      .encodeDocsFromTokenizer(spark, tok, odd, "doc_id", "text")
      .select(col("doc_id"), concat_ws(" ", col("ids")).as("i"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.toMap == batch && batch.nonEmpty, s"stream ${got.size}")
  }

  test("streaming span corruption == batch (stateless hash noise)") {
    val ids = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        expr("transform(filter(split(trim(lower(text)), '\\\\s+')," +
          " w -> w rlike '^[a-z]+$'), w -> CAST(length(w) AS LONG))")
          .as("ids"))
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))
    val batch = graft.ops.Scale.spanCorruptionPairs(ids, "doc_id", "ids")
      .collect().map(key).toMap
    assert(batch.nonEmpty && batch.exists(_._2._1 > 0))
    val dir = Files.createTempDirectory("graft-spc-in").toFile
    val ckpt = Files.createTempDirectory("graft-spc-ckpt").toFile
    ids.filter(col("doc_id") < 250).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    ids.filter(col("doc_id") >= 250).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(ids.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map
      .empty[Long, (Long, Long, String, String)]
    val q = StreamVerbs.streamingSpanCorruption(Tbl(stream), "doc_id",
        "ids") { out =>
        got.synchronized { out.collect().foreach(r => got += key(r)) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(got.toMap == batch, s"stream ${got.size} vs batch ${batch.size}")
  }

  test("streaming MLM pairs == batch (stateless hash noise)") {
    val ids = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        expr("transform(filter(split(trim(lower(text)), '\\\\s+')," +
          " w -> w rlike '^[a-z]+$'), w -> CAST(length(w) AS LONG))")
          .as("ids"))
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      (r.getLong(1), r.getString(2), r.getString(3))
    val batch = graft.ops.Scale.mlmPairs(ids, "doc_id", "ids",
        maskId = 99L, vocabSize = 30L)
      .collect().map(key).toMap
    assert(batch.nonEmpty && batch.exists(_._2._1 > 0))
    val dir = Files.createTempDirectory("graft-mlm-in").toFile
    val ckpt = Files.createTempDirectory("graft-mlm-ckpt").toFile
    ids.filter(col("doc_id") < 100).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    ids.filter(col("doc_id") >= 100).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(ids.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map
      .empty[Long, (Long, String, String)]
    val q = StreamVerbs.streamingMlmPairs(Tbl(stream), "doc_id", "ids",
        maskId = 99L, vocabSize = 30L) { out =>
        got.synchronized { out.collect().foreach(r => got += key(r)) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(got.toMap == batch, s"stream ${got.size} vs batch ${batch.size}")
  }

  test("streaming context windows: full-window prefix == one-shot batch " +
      "cut, remainder == its final partial") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        expr("transform(filter(split(trim(lower(text)), '\\\\s+')," +
          " w -> w rlike '^[a-z]+$'), w -> CAST(length(w) AS LONG))")
          .as("ids"))
    val L = 64
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      (r.getLong(1), r.getLong(2),
        r.getSeq[Long](r.fieldIndex("ids")).toList)
    // one-shot truth over the whole corpus
    val whole = graft.ops.Scale.contextWindows(docs, "doc_id", "ids", L)
      .collect().map(key).toMap
    val fullTruth = whole.filter(_._2._1 == L)
    val partialTruth = whole.filter(_._2._1 < L)
    assert(fullTruth.nonEmpty && partialTruth.size == 1)
    // stream the same docs in three id-ordered files
    val dir = Files.createTempDirectory("graft-cwing-in").toFile
    val ckpt = Files.createTempDirectory("graft-cwing-ckpt").toFile
    val state = Files.createTempDirectory("graft-cwing-state").toString
    for ((lo, hi) <- Seq((0L, 150L), (150L, 300L), (300L, 10000L)))
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .repartition(1).write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map
      .empty[Long, (Long, Long, List[Long])]
    val q = StreamVerbs.streamingContextWindows(Tbl(stream), "doc_id",
        "ids", L, state) { out =>
        got.synchronized { out.collect().foreach(r => got += key(r)) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(got.toMap == fullTruth,
      s"stream emitted ${got.size} full windows vs batch ${fullTruth.size}")
    // carried remainder == the batch cut's final partial window ids
    val rem = spark.read.parquet(s"$state/carry/remainder")
      .orderBy("doc_id").collect()
      .flatMap(r => r.getSeq[Long](1)).toList
    assert(rem == partialTruth.head._2._3, "remainder diverged")
    val nextId = spark.read.parquet(s"$state/carry/meta").head().getLong(0)
    assert(nextId == fullTruth.size.toLong, "window-id counter diverged")
  }

  test("streaming length-grouped batches: frozen boundaries + carry == " +
      "the one-shot boundary batcher") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextFns.tokenCount(col("text")).cast("long").as("len"))
    val trained = graft.ops.Scale.lengthGroupedBatches(docs, "doc_id",
      col("len"), nBuckets = 4, batchBudget = 2048L)
    val boundaries = trained.filter(col("bucket") >= 1)
      .groupBy("bucket").agg(min("len").as("boundary"))
      .localCheckpoint() // frozen: the stream must not re-derive it
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))
    val oneShot = graft.ops.Scale.lengthBatchesByBoundaries(docs,
      "doc_id", col("len"), boundaries, 2048L).collect().map(key).toMap
    val dir = Files.createTempDirectory("graft-lbing-in").toFile
    val ckpt = Files.createTempDirectory("graft-lbing-ckpt").toFile
    val state = Files.createTempDirectory("graft-lbing-state").toString
    for ((lo, hi) <- Seq((0L, 150L), (150L, 300L), (300L, 10000L)))
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .repartition(1).write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long)]
    val q = StreamVerbs.streamingLengthBatches(Tbl(stream), "doc_id",
        col("len"), boundaries, 2048L, state) { out =>
        got.synchronized { out.collect().foreach(r => got += key(r)) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(got.toMap == oneShot,
      s"stream emitted ${got.size} rows vs one-shot ${oneShot.size}")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("streaming calibrated gate: admitted set == the batch gate " +
      "(q_gate_calibrated parity)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    // q_gate_calibrated's construction: binary label en/rest, train on
    // the even half, calibrate ON the odd eval half at recall 0.8
    val lab = docs.withColumn("cls",
      when(col("lang") === "en", lit("pos")).otherwise(lit("neg")))
    val path = Files.createTempDirectory("graft-gate").toString
    graft.text.Classify.buildNbModel(
      lab.filter(col("doc_id") % 2 === 0), "cls", "text", path)
    val odd = lab.filter(col("doc_id") % 2 === 1)
    val scored = graft.text.Classify.scoreBinaryFromModel(
        spark, path, odd, "doc_id", "text")
      .join(odd.select(col("doc_id"), (col("lang") === "en").as("truth")),
        "doc_id")
    graft.text.Classify.saveGateThreshold(spark, path, scored, "truth",
      recallTarget = 0.8)
    val (thr, target) = graft.text.Classify.gateThreshold(spark, path)
    assert(target == 0.8)
    val expected = scored.filter(col("s") >= thr)
      .collect().map(r => r.getLong(0) ->
        r.getDouble(r.fieldIndex("s"))).toMap
    assert(expected.nonEmpty && expected.size < odd.count(),
      "gate must admit a strict non-empty subset")
    // stream the SAME odd docs in two files
    val dir = Files.createTempDirectory("graft-gate-in").toFile
    val ckpt = Files.createTempDirectory("graft-gate-ckpt").toFile
    odd.filter(col("doc_id") < 250).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    odd.filter(col("doc_id") >= 250).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(odd.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Map.empty[Long, Double]
    val q = StreamVerbs.streamingCalibratedGate(Tbl(stream), "doc_id",
        "text", path) { out =>
        got.synchronized { out.select("doc_id", "s").collect()
          .foreach(r => got(r.getLong(0)) = r.getDouble(1)) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(got.toMap == expected,
      s"stream admitted ${got.size} vs batch ${expected.size}")
  }

  test("streaming shard manifest: standing manifest after the last " +
      "micro-batch == one-shot shardManifest; replay re-emits") {
    val packed = graft.ops.Scale.packByBudget(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"),
          graft.text.TextFns.tokenCount(col("text")).cast("long")
            .as("n_tok"),
          col("text")),
      Seq(col("doc_id")), col("n_tok"), budget = 2000)
      .localCheckpoint() // freeze: the stream re-reads slices of THIS
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
    val truth = graft.ops.Scale.shardManifest(packed, "shard", "doc_id",
        col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      .collect().map(key).toMap
    val dir = Files.createTempDirectory("graft-smi-in").toFile
    val ckpt = Files.createTempDirectory("graft-smi-ckpt").toFile
    val state = Files.createTempDirectory("graft-smi-state").toString
    // batch boundaries deliberately SPLIT shards (ranges not aligned to
    // the 2000-token budget), so partial shards must keep filling
    for ((lo, hi) <- Seq((0L, 111L), (111L, 287L), (287L, 10000L)))
      packed.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .repartition(1).write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(packed.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    @volatile var last: Map[Long, (Long, Long, Long, Long, Long)] =
      Map.empty
    val q = StreamVerbs.streamingShardManifest(Tbl(stream), "shard",
        "doc_id", col("n_tok"),
        graft.ops.Sketch.portableHash(col("text")), state) { out =>
        val rows = out.collect().map(key).toMap
        synchronized { last = rows }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(last == truth, s"streamed manifest diverged (${last.size} vs " +
      s"${truth.size} shards)")
    // the persisted snapshot IS the manifest
    val snap = spark.read.parquet(s"$state/carry/manifest")
      .collect().map(key).toMap
    assert(snap == truth, "persisted snapshot diverged")
    // replay of the last batch re-emits the standing manifest unchanged
    val lastId = spark.read.parquet(s"$state/carry/meta").head()
      .getAs[Long]("last_batch_id")
    val re = graft.ops.Scale.shardManifestIngest(spark, state,
        packed.filter(col("doc_id") >= 287L), "shard", "doc_id",
        col("n_tok"), graft.ops.Sketch.portableHash(col("text")),
        batchId = lastId)
      .collect().map(key).toMap
    assert(re == truth, "replay did not re-emit the standing manifest")
    // the dataloader's one-call path: an epoch plan derived straight
    // off the standing state == the plan over the one-shot manifest
    def planRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(planRows(graft.ops.Scale.epochPlanFromState(spark, state,
        "shard", "42", nWorkers = 4)) ==
      planRows(graft.ops.Scale.epochPlan(
        graft.ops.Scale.shardManifest(packed, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text"))),
        "shard", "42", nWorkers = 4)),
      "state-derived epoch plan diverged from the one-shot plan")
  }

  test("streaming ECE monitor: accumulated bins == the one-shot batch " +
      "calibrationReport; replay re-emits without double-counting") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), (col("lang") === "en").as("y"),
        // a deterministic synthetic log-odds score with real spread
        ((col("doc_id") % 17).cast("double") / 4.0 - 2.0 +
          when(col("lang") === "en", 1.5).otherwise(-0.5)).as("s"))
    val truth = graft.ml.Eval.calibrationReport(docs, "y", "s", bins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val dir = Files.createTempDirectory("graft-ecemon-in").toFile
    val ckpt = Files.createTempDirectory("graft-ecemon-ckpt").toFile
    val state = Files.createTempDirectory("graft-ecemon-state").toString
    for ((lo, hi) <- Seq((0L, 150L), (150L, 300L), (300L, 10000L)))
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .repartition(1).write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    // keep only the LAST emission: the cumulative report after the
    // final micro-batch must equal the batch report over everything
    @volatile var last: Set[(Long, Long, Long, Double, Double, Double)] =
      Set.empty
    val q = StreamVerbs.streamingEceMonitor(Tbl(stream), "y", "s",
        bins = 10, state) { out =>
        val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
          .toSet
        synchronized { last = rows }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(last == truth, s"streamed final bins diverged:\n$last\nvs\n$truth")
    // a replayed final micro-batch (same batchId) re-emits the SAME
    // cumulative report and leaves the standing bins untouched
    val bins0 = spark.read.parquet(s"$state/carry/bins").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val lastMeta = spark.read.parquet(s"$state/carry/meta").head()
    val re = graft.ml.Eval.eceMonitorIngest(spark, state,
        docs.filter(col("doc_id") >= 300L), "y", "s", bins = 10,
        batchId = lastMeta.getAs[Long]("last_batch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(re == truth, "replay did not re-emit the cumulative report")
    val bins1 = spark.read.parquet(s"$state/carry/bins").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(bins1 == bins0, "replay advanced the standing bins")
    // a bins-width mismatch against the state fails loudly
    val ex = intercept[IllegalArgumentException] {
      graft.ml.Eval.eceMonitorIngest(spark, state, docs, "y", "s",
        bins = 5, batchId = 99L)
    }
    assert(ex.getMessage.contains("cannot merge"))
  }

  test("streaming AUC monitor: each micro-batch row == batch-side AUC") {
    import spark.implicits._
    val b1 = Seq((1L, true, 3.0), (2L, true, 2.0), (3L, false, 1.0),
      (4L, false, 2.0)) // the hand-checked tie case: AUC 0.875
    val b2 = Seq((5L, true, 9.0), (6L, false, 1.0), (7L, false, 2.0))
    val dir = Files.createTempDirectory("graft-aucmon").toFile
    val ckpt = Files.createTempDirectory("graft-aucmon-ckpt").toFile
    b1.toDF("id", "y", "s").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    b2.toDF("id", "y", "s").repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val schema = b1.toDF("id", "y", "s").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val q = StreamVerbs.streamingAucMonitor(Tbl(stream), "y", "s") { out =>
        got.synchronized { out.collect().foreach(r =>
          got += ((r.getLong(0), r.getLong(1), r.getDouble(2)))) }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def bAuc(rows: Seq[(Long, Boolean, Double)]) = {
      val r = graft.ml.Eval.aucBinary(rows.toDF("id", "y", "s"), "y", "s")
        .head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    assert(got.toSet == Set(bAuc(b1), bAuc(b2)) &&
      got.exists(_._3 == 0.875) && got.exists(_._3 == 1.0),
      s"stream $got")
  }

  test("streaming decontamination against the persisted index == the " +
      "inline Bloom scrub") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val idx = Files.createTempDirectory("graft-sdecon-idx").toString
    graft.ml.Dedup.buildDecontamIndex(spark, bench, "text", idx, n = 5)
    val dir = Files.createTempDirectory("graft-sdecon-in").toFile
    val ckpt = Files.createTempDirectory("graft-sdecon-ckpt").toFile
    docs.filter(col("doc_id") < 250).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    docs.filter(col("doc_id") >= 250).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val got = scala.collection.mutable.Set.empty[Long]
    val q = StreamVerbs.streamingDecontaminateFromIndex(Tbl(stream),
        "doc_id", "text", idx, maxContaminatedFrac = 0.5) { out =>
        got.synchronized {
          out.select("doc_id").collect().foreach(r => got += r.getLong(0))
        }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val exp = graft.ml.Dedup.decontaminateBloom(docs, "doc_id", "text",
        bench, "text", n = 5, maxContaminatedFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.toSet == exp && exp.nonEmpty && exp.size < 500,
      s"stream ${got.size} kept vs inline ${exp.size}")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("streaming OOV monitor: cumulative per-source coverage == the " +
      "one-shot vocabCoverage over everything streamed") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source")
    val tok = Files.createTempDirectory("graft-oov-tok").toString
    // tokenizer frozen on the even half; the odd half streams through
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    graft.text.Bpe.buildTokenizer(even, "text", tok, nMerges = 8)
    val dir = Files.createTempDirectory("graft-oov-in").toFile
    val ckpt = Files.createTempDirectory("graft-oov-ckpt").toFile
    val state = Files.createTempDirectory("graft-oov-state").toString
    odd.filter(col("doc_id") < 250).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    odd.filter(col("doc_id") >= 250).repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val limit = 16L
    val got = scala.collection.mutable.Map
      .empty[String, (Long, Long, Double)]
    val q = StreamVerbs.streamingOovMonitor(Tbl(stream), "doc_id", "text",
        "source", tok, state, vocabLimit = limit) { out =>
        got.synchronized {
          got.clear() // cumulative: the last report wins
          out.collect().foreach(r => got(r.getString(0)) =
            (r.getLong(1), r.getLong(2), r.getDouble(3)))
        }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val merges = spark.read.parquet(s"$tok/merges")
    val vocab = graft.text.Bpe.vocabTruncate(
      spark.read.parquet(s"$tok/vocab"), limit)
    val enc = graft.text.Bpe.encodeDocs(odd, "doc_id", "text", merges)
    val exp = graft.text.Bpe.vocabCoverage(enc, "doc_id", vocab, odd,
        "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got.toMap == exp && exp.nonEmpty,
      s"stream ${got.size} groups vs batch ${exp.size}")
    assert(exp.values.exists(_._2 > 0), "fixture must exercise real OOV")
    // a tokenizer/limit mismatch against the accumulated state is loud
    val ex = intercept[IllegalArgumentException] {
      graft.text.Bpe.oovMonitorIngest(spark, state, odd.limit(5),
        "doc_id", "text", "source", tok, vocabLimit = 8L, batchId = 99L)
    }
    assert(ex.getMessage.contains("cannot merge"))
  }

  test("lifecycleIngest replay: a re-delivered batch re-emits windows, " +
      "batch assignments, and manifest bit-identically") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val lab = docs.withColumn("cls",
      when(col("lang") === "en", lit("pos")).otherwise(lit("neg")))
    val gate = Files.createTempDirectory("graft-lcr-gate").toString
    graft.text.Classify.buildNbModel(
      lab.filter(col("doc_id") % 2 === 0), "cls", "text", gate)
    val scored = graft.text.Classify.scoreBinaryFromModel(
        spark, gate, odd, "doc_id", "text")
      .join(odd.select(col("doc_id"), (col("lang") === "en").as("truth")),
        Seq("doc_id"))
    graft.text.Classify.saveGateThreshold(spark, gate, scored, "truth", 0.8)
    val bench = even.filter(col("doc_id") % 10 === 0)
    val decIdx = Files.createTempDirectory("graft-lcr-dec").toString
    graft.ml.Dedup.buildDecontamIndex(spark, bench, "text", decIdx, n = 3)
    val tok = Files.createTempDirectory("graft-lcr-tok").toString
    graft.text.Bpe.buildTokenizer(docs, "text", tok, nMerges = 8,
      sepToken = true)
    val evenIds = graft.text.Bpe.encodeDocsFromTokenizer(spark, tok, even,
      "doc_id", "text")
    val boundaries = graft.ops.Scale.lengthGroupedBatches(evenIds,
        "doc_id", col("n_tokens"), nBuckets = 4, batchBudget = 2048L)
      .filter(col("bucket") >= 1)
      .groupBy("bucket").agg(min("len").as("boundary"))
      .localCheckpoint()
    val idx = Files.createTempDirectory("graft-lcr-idx").toString
    graft.ml.Dedup.buildMinhashIndex(even, "doc_id", "text", idx,
      n = 3, bands = 16, rows = 2, seed = 42L, portable = true)
    val state = Files.createTempDirectory("graft-lcr-state").toString
    def run(b: org.apache.spark.sql.DataFrame, id: Long) = {
      val r = StreamVerbs.lifecycleIngest(spark, state, b, "doc_id",
        "text", "source", gate, decIdx, idx, tok, 64, boundaries,
        2048L, maxContaminatedFrac = 0.5,
        dedupThreshold = 0.3, batchId = id)
      (r.windows.select("window_id", "ids").collect()
         .map(x => x.getLong(0) -> x.getSeq[Long](1).toList).toMap,
       r.batches.collect().map(x => x.getLong(0) ->
         (x.getLong(1), x.getLong(2), x.getLong(3))).toMap,
       r.manifest.collect().map(x => x.getString(0) -> (x.getLong(1),
         x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap)
    }
    val b1 = odd.filter(col("doc_id") < 200)
    val b2 = odd.filter(col("doc_id") >= 200 && col("doc_id") < 400)
    run(b1, 0L)
    val (w2, bt2, m2) = run(b2, 1L)
    assert(w2.nonEmpty && bt2.nonEmpty && m2.nonEmpty)
    val seqBefore = spark.read.parquet(s"$idx/sigs")
      .agg(max(col("batch_seq").cast("long"))).head().getLong(0)
    // redelivery of batch 1 (crash after every stage committed, before
    // the checkpoint commit): every stage re-emits, nothing re-applies
    val (w2r, bt2r, m2r) = run(b2, 1L)
    assert(w2r == w2, "replayed windows diverged")
    assert(bt2r == bt2, "replayed batch assignments diverged")
    assert(m2r == m2, "replayed manifest diverged")
    assert(spark.read.parquet(s"$idx/sigs")
      .agg(max(col("batch_seq").cast("long"))).head().getLong(0)
      == seqBefore, "index grew on replay")
    // and the NEXT batch still applies fresh on top of the same state
    val b3 = odd.filter(col("doc_id") >= 400 && col("doc_id") < 460)
    val (w3, _, m3) = run(b3, 2L)
    assert(w3.keySet.forall(k => !w2.keySet.contains(k)),
      "window ids must advance past the replayed batch")
    assert(m3.nonEmpty)
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("lifecycleIngest crash injection: killed after every stage commit " +
      "in turn, the redelivered batch lands bit-identical to an " +
      "uncrashed run") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .withColumn("truth", col("lang") === "en")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    // frozen read-only artifacts, shared by every crash variant
    val lab = docs.withColumn("cls",
      when(col("lang") === "en", lit("pos")).otherwise(lit("neg")))
    val gate = Files.createTempDirectory("graft-lci-gate").toString
    graft.text.Classify.buildNbModel(
      lab.filter(col("doc_id") % 2 === 0), "cls", "text", gate)
    val scored = graft.text.Classify.scoreBinaryFromModel(
        spark, gate, odd, "doc_id", "text")
      .join(odd.select(col("doc_id"), (col("lang") === "en").as("truth")),
        Seq("doc_id"))
    graft.text.Classify.saveGateThreshold(spark, gate, scored, "truth", 0.8)
    val decIdx = Files.createTempDirectory("graft-lci-dec").toString
    graft.ml.Dedup.buildDecontamIndex(spark,
      even.filter(col("doc_id") % 10 === 0), "text", decIdx, n = 3)
    val tok = Files.createTempDirectory("graft-lci-tok").toString
    graft.text.Bpe.buildTokenizer(docs, "text", tok, nMerges = 8,
      sepToken = true)
    val evenIds = graft.text.Bpe.encodeDocsFromTokenizer(spark, tok, even,
      "doc_id", "text")
    val boundaries = graft.ops.Scale.lengthGroupedBatches(evenIds,
        "doc_id", col("n_tokens"), nBuckets = 4, batchBudget = 2048L)
      .filter(col("bucket") >= 1)
      .groupBy("bucket").agg(min("len").as("boundary"))
      .localCheckpoint()
    val b1 = odd.filter(col("doc_id") < 120)
    val b2 = odd.filter(col("doc_id") >= 120 && col("doc_id") < 240)
    def freshIdx(): String = {
      val p = Files.createTempDirectory("graft-lci-idx").toString
      graft.ml.Dedup.buildMinhashIndex(even, "doc_id", "text", p,
        n = 3, bands = 16, rows = 2, seed = 42L, portable = true)
      p
    }
    def run(idx: String, state: String, b: org.apache.spark.sql.DataFrame,
            id: Long, fail: Option[Int]) =
      StreamVerbs.lifecycleIngest(spark, state, b, "doc_id", "text",
        "source", gate, decIdx, idx, tok, 64, boundaries, 2048L,
        maxContaminatedFrac = 0.5, dedupThreshold = 0.3, batchId = id,
        failAfterStage = fail, oovVocabLimit = Some(16L),
        eceLabelCol = Some("truth"))
    def outs(r: StreamVerbs.LifecycleBatchOut) =
      (r.admitted.select("doc_id").collect().map(_.getLong(0)).toSet,
       r.windows.select("window_id", "ids").collect()
         .map(x => x.getLong(0) -> x.getSeq[Long](1).toList).toMap,
       r.batches.collect().map(x => x.getLong(0) ->
         (x.getLong(1), x.getLong(2), x.getLong(3))).toMap,
       r.manifest.collect().map(x => x.getString(0) -> (x.getLong(1),
         x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap,
       r.oov.get.collect().map(x => x.getString(0) ->
         (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap,
       r.ece.get.collect().map(x => x.getLong(0) -> (x.getLong(1),
         x.getLong(2), x.getDouble(3), x.getDouble(4),
         x.getDouble(5))).toMap)
    // the uncrashed reference chain
    val refIdx = freshIdx()
    val refState = Files.createTempDirectory("graft-lci-ref").toString
    run(refIdx, refState, b1, 0L, None)
    val ref = outs(run(refIdx, refState, b2, 1L, None))
    assert(ref._1.nonEmpty && ref._2.nonEmpty && ref._3.nonEmpty &&
      ref._4.nonEmpty && ref._5.nonEmpty && ref._6.nonEmpty)
    // kill after each stage commit in turn (0 = before any commit,
    // 1 = after the dedup index append, 2 = after the window carry,
    // 3 = after the batch carry, 4 = after the manifest, 5 = after the
    // OOV rider, 6 = after the ECE rider — i.e. after everything
    // committed but before the checkpoint), then redeliver
    for (k <- 0 to 6) {
      val idx = freshIdx()
      val state = Files.createTempDirectory(s"graft-lci-k$k").toString
      run(idx, state, b1, 0L, None)
      val ex = intercept[RuntimeException] {
        run(idx, state, b2, 1L, Some(k))
      }
      assert(ex.getMessage.contains("injected crash"), ex.getMessage)
      val got = outs(run(idx, state, b2, 1L, None))
      assert(got == ref,
        s"stage-$k crash: redelivered outputs diverged from uncrashed run")
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("lifecycle monitor riders: OOV and ECE state maintained by the " +
      "lifecycle pass == the standalone monitors over the same batches") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .withColumn("truth", col("lang") === "en")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val lab = docs.withColumn("cls",
      when(col("lang") === "en", lit("pos")).otherwise(lit("neg")))
    val gate = Files.createTempDirectory("graft-rid-gate").toString
    graft.text.Classify.buildNbModel(
      lab.filter(col("doc_id") % 2 === 0), "cls", "text", gate)
    val scoredRef = graft.text.Classify.scoreBinaryFromModel(
        spark, gate, odd, "doc_id", "text")
      .join(odd.select(col("doc_id"), col("truth")), Seq("doc_id"))
    graft.text.Classify.saveGateThreshold(spark, gate, scoredRef, "truth",
      0.8)
    val decIdx = Files.createTempDirectory("graft-rid-dec").toString
    graft.ml.Dedup.buildDecontamIndex(spark,
      even.filter(col("doc_id") % 10 === 0), "text", decIdx, n = 3)
    val tok = Files.createTempDirectory("graft-rid-tok").toString
    graft.text.Bpe.buildTokenizer(docs, "text", tok, nMerges = 8,
      sepToken = true)
    val evenIds = graft.text.Bpe.encodeDocsFromTokenizer(spark, tok, even,
      "doc_id", "text")
    val boundaries = graft.ops.Scale.lengthGroupedBatches(evenIds,
        "doc_id", col("n_tokens"), nBuckets = 4, batchBudget = 2048L)
      .filter(col("bucket") >= 1)
      .groupBy("bucket").agg(min("len").as("boundary"))
      .localCheckpoint()
    val idx = Files.createTempDirectory("graft-rid-idx").toString
    graft.ml.Dedup.buildMinhashIndex(even, "doc_id", "text", idx,
      n = 3, bands = 16, rows = 2, seed = 42L, portable = true)
    val state = Files.createTempDirectory("graft-rid-state").toString
    val vocabLim = 16L
    val b1 = odd.filter(col("doc_id") < 200)
    val b2 = odd.filter(col("doc_id") >= 200 && col("doc_id") < 400)
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      StreamVerbs.lifecycleIngest(spark, state, b, "doc_id", "text",
        "source", gate, decIdx, idx, tok, 64, boundaries, 2048L,
        maxContaminatedFrac = 0.5, dedupThreshold = 0.3, batchId = id,
        oovVocabLimit = Some(vocabLim), eceLabelCol = Some("truth"))
    def oovMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    def eceMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val r1 = run(b1, 0L)
    val admitted1 = r1.admitted.localCheckpoint()
    val r2 = run(b2, 1L)
    val admitted2 = r2.admitted.localCheckpoint()
    assert(r2.oov.nonEmpty && r2.ece.nonEmpty)
    // standalone monitors over the SAME batches: OOV watches the
    // admitted docs (what enters training), ECE the gate-scored batch
    val soState = Files.createTempDirectory("graft-rid-so").toString
    graft.text.Bpe.oovMonitorIngest(spark, soState, admitted1, "doc_id",
      "text", "source", tok, vocabLimit = vocabLim, batchId = 0L)
    val soOov = graft.text.Bpe.oovMonitorIngest(spark, soState, admitted2,
      "doc_id", "text", "source", tok, vocabLimit = vocabLim, batchId = 1L)
    val seState = Files.createTempDirectory("graft-rid-se").toString
    def scoredOf(b: org.apache.spark.sql.DataFrame) =
      graft.text.Classify.scoreBinaryFromModel(spark, gate, b, "doc_id",
          "text")
        .join(b.select(col("doc_id"), col("truth")), Seq("doc_id"))
    graft.ml.Eval.eceMonitorIngest(spark, seState, scoredOf(b1), "truth",
      "s", bins = 10, batchId = 0L)
    val soEce = graft.ml.Eval.eceMonitorIngest(spark, seState,
      scoredOf(b2), "truth", "s", bins = 10, batchId = 1L)
    assert(oovMap(r2.oov.get) == oovMap(soOov),
      "rider OOV state diverged from the standalone monitor")
    assert(eceMap(r2.ece.get) == eceMap(soEce),
      "rider ECE state diverged from the standalone monitor")
    assert(oovMap(r2.oov.get).nonEmpty && eceMap(r2.ece.get).nonEmpty)
    // a replayed batch re-emits the riders' cumulative reports too
    val r2r = run(b2, 1L)
    assert(oovMap(r2r.oov.get) == oovMap(r2.oov.get))
    assert(eceMap(r2r.ece.get) == eceMap(r2.ece.get))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("streaming lifecycle: gate -> decontaminate -> dedup -> encode -> " +
      "windows -> batches -> manifest == the batch composition") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val L = 64
    val budget = 2048L
    // frozen artifacts, built ONCE before any streaming: gate model +
    // threshold, benchmark slice, minhash index, sep tokenizer, length
    // boundaries (trained on the even reference half's encoded lengths)
    val lab = docs.withColumn("cls",
      when(col("lang") === "en", lit("pos")).otherwise(lit("neg")))
    val gate = Files.createTempDirectory("graft-slc-gate").toString
    graft.text.Classify.buildNbModel(
      lab.filter(col("doc_id") % 2 === 0), "cls", "text", gate)
    val scored = graft.text.Classify.scoreBinaryFromModel(
        spark, gate, odd, "doc_id", "text")
      .join(odd.select(col("doc_id"), (col("lang") === "en").as("truth")),
        Seq("doc_id"))
    graft.text.Classify.saveGateThreshold(spark, gate, scored, "truth", 0.8)
    val bench = even.filter(col("doc_id") % 10 === 0)
    val decIdx = Files.createTempDirectory("graft-slc-dec").toString
    graft.ml.Dedup.buildDecontamIndex(spark, bench, "text", decIdx, n = 3)
    val tok = Files.createTempDirectory("graft-slc-tok").toString
    graft.text.Bpe.buildTokenizer(docs, "text", tok, nMerges = 8,
      sepToken = true)
    val evenIds = graft.text.Bpe.encodeDocsFromTokenizer(spark, tok, even,
      "doc_id", "text")
    val trained = graft.ops.Scale.lengthGroupedBatches(evenIds, "doc_id",
      col("n_tokens"), nBuckets = 4, batchBudget = budget)
    val boundaries = trained.filter(col("bucket") >= 1)
      .groupBy("bucket").agg(min("len").as("boundary"))
      .localCheckpoint()
    def freshIdx(): String = {
      val p = Files.createTempDirectory("graft-slc-idx").toString
      graft.ml.Dedup.buildMinhashIndex(even, "doc_id", "text", p,
        n = 3, bands = 16, rows = 2, seed = 42L, portable = true)
      p
    }
    // three ascending-id micro-batches (the packing contract)
    val cuts = Seq((0L, 200L), (200L, 400L), (400L, Long.MaxValue))
    val parts = cuts.map { case (lo, hi) =>
      odd.filter(col("doc_id") >= lo && col("doc_id") < hi) }
    val dir = Files.createTempDirectory("graft-slc-in").toFile
    val ckpt = Files.createTempDirectory("graft-slc-ckpt").toFile
    val state = Files.createTempDirectory("graft-slc-state").toString
    parts.foreach(_.repartition(1).write.mode("append")
      .parquet(dir.getAbsolutePath))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
    val idxS = freshIdx()
    val export = Files.createTempDirectory("graft-slc-exp").toString
    val gotA = scala.collection.mutable.Set.empty[Long]
    val gotW = scala.collection.mutable.Map.empty[Long, List[Long]]
    val gotB = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val gotM = scala.collection.mutable.Map
      .empty[String, (Long, Long, Long, Long, Long)]
    val q = StreamVerbs.streamingLifecycle(Tbl(stream), "doc_id", "text",
        "source", gate, decIdx, idxS, tok, L, boundaries, budget,
        state, maxContaminatedFrac = 0.5,
        dedupThreshold = 0.3,
        exportEvery = 1, exportPath = export,
        exportDocsPerShard = 100L, admittedCompactEvery = 1) { out =>
        gotW.synchronized {
          out.admitted.select("doc_id").collect().foreach(r =>
            gotA += r.getLong(0))
          out.windows.select("window_id", "ids").collect().foreach(r =>
            gotW(r.getLong(0)) = r.getSeq[Long](1).toList)
          out.batches.collect().foreach(r =>
            gotB(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getLong(3)))
          gotM.clear() // cumulative: the last manifest wins
          out.manifest.collect().foreach(r =>
            gotM(r.getString(0)) = (r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4), r.getLong(5)))
        }
      }
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    // batch reference: sequential per-batch admission on a fresh index
    // (dedup-on-ingest is order-dependent BY DESIGN), then the one-shot
    // window/batcher/manifest composition over the admitted corpus
    val idxB = freshIdx()
    val (thr, _) = graft.text.Classify.gateThreshold(spark, gate)
    def admit(b: org.apache.spark.sql.DataFrame) = {
      val g = b.join(graft.text.Classify.scoreBinaryFromModel(spark, gate,
          b, "doc_id", "text").filter(col("s") >= thr).select("doc_id"),
        Seq("doc_id"), "left_semi")
      graft.ml.Dedup.ingestDedup(spark, idxB,
        graft.ml.Dedup.decontaminateBloom(g, "doc_id", "text", bench,
          "text", n = 3, maxContaminatedFrac = 0.5),
        "doc_id", "text", threshold = 0.3).localCheckpoint()
    }
    val admitted = parts.map(admit).reduce(_.unionByName(_))
    val ids = graft.text.Bpe.encodeDocsFromTokenizer(spark, tok, admitted,
      "doc_id", "text").localCheckpoint()
    val (sep, _, _) = graft.text.Bpe.tokenizerMeta(spark, tok)
    val expW = graft.ops.Scale.contextWindows(ids, "doc_id", "ids", L,
        insertSep = sep)
      .filter(col("n_filled") === L)
      .select("window_id", "ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val expB = graft.ops.Scale.lengthBatchesByBoundaries(ids, "doc_id",
        col("n_tokens"), boundaries, budget)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expM = graft.ops.Scale.shardManifest(
        admitted.select("doc_id", "source")
          .join(ids.select("doc_id", "n_tokens"), Seq("doc_id")),
        "source", "doc_id", col("n_tokens"),
        graft.ops.Sketch.portableHash(col("doc_id").cast("string")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(gotW.toMap == expW && expW.nonEmpty,
      s"windows: stream ${gotW.size} vs batch ${expW.size}")
    assert(gotB.toMap == expB && expB.nonEmpty,
      s"batches: stream ${gotB.size} vs batch ${expB.size}")
    assert(gotM.toMap == expM && expM.nonEmpty,
      s"manifest: stream $gotM vs batch $expM")
    // EXPORT RIDER: the maintained shard export holds exactly the
    // admitted corpus and verifies clean against its own manifest
    val sizeC = graft.text.TextFns.tokenCount(col("text")).cast("long")
    val fpC = graft.ops.Sketch.portableHash(col("text"))
    val expIds = spark.read.parquet(s"$export/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expIds == gotA.toSet && expIds.nonEmpty,
      s"export ${expIds.size} docs vs streamed admitted ${gotA.size}")
    val ver = graft.ops.Scale.verifyShards(spark, export, "shard",
        "doc_id", sizeC, fpC)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ver.nonEmpty && ver.values.forall(_ == "unchanged"),
      s"maintained export must verify: $ver")
    // a further resync with the unchanged store is a byte-level no-op —
    // the incremental claim (only moved shards ever rewrite)
    import scala.jdk.CollectionConverters._
    def expFiles() = java.nio.file.Files
      .walk(java.nio.file.Paths.get(export, "data"))
      .iterator().asScala.filter(p =>
        java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        (java.nio.file.Files.size(p),
         java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
    val before = expFiles()
    // the admitted-compaction rider bounded the store: base + the newest
    // batch's partition, nothing else (exported partitions folded away)
    val seqDirs = java.nio.file.Files
      .list(java.nio.file.Paths.get(state, "admitted"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("batch_seq=")).toSet
    assert(seqDirs == Set("batch_seq=-1", "batch_seq=2"),
      s"admitted store must stay bounded: $seqDirs")
    val packed = spark.read.parquet(s"$state/admitted").drop("batch_seq")
      .withColumn("shard", expr("CAST(doc_id AS BIGINT) div 100"))
    val again = graft.ops.Scale.resyncShards(spark, packed, export,
        "shard", "doc_id", sizeC, fpC)
      .collect().map(r => r.getString(1)).toSet
    assert(again == Set("unchanged"), s"no-op resync receipt: $again")
    assert(expFiles() == before, "no-op resync must not rewrite files")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("export cycle is O(delta): already-exported admitted partitions " +
      "are NEVER re-read (poisoned with junk and the cycle still lands " +
      "the right bytes), untouched export shards never rewrite, crash " +
      "windows replay idempotently, admitted compaction bounds partitions") {
    import java.nio.file.Files
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source")
    val state = Files.createTempDirectory("graft-odelta-state").toString
    val export = Files.createTempDirectory("graft-odelta-exp").toString
    val admitted = s"$state/admitted"
    def writeBatch(seq: Long, lo: Long, hi: Long): Unit =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .withColumn("batch_seq", lit(seq))
        .write.partitionBy("batch_seq")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(admitted)
    def cycle(batchId: Long): Unit =
      StreamVerbs.lifecycleExportCycle(spark, state, export, "doc_id",
        "text", batchId, docsPerShard = 50L)
    def verifyAll(): Map[Long, String] =
      graft.ops.Scale.verifyShards(spark, export, "shard", "doc_id",
          graft.text.TextFns.tokenCount(col("text")).cast("long"),
          graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def exportIds(): Set[Long] = spark.read.parquet(s"$export/data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    import scala.jdk.CollectionConverters._
    def shardFiles(): Map[String, (Long, Long)] = Files
      .walk(java.nio.file.Paths.get(export, "data"))
      .iterator().asScala.filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis)).toMap
    try {
      // bootstrap: three batches (ids 0..274, shard 5 partial at 250-274)
      writeBatch(0L, 0L, 100L)
      writeBatch(1L, 100L, 200L)
      writeBatch(2L, 200L, 275L)
      cycle(2L)
      assert(StreamVerbs.exportCursor(spark, state) == 2L)
      assert(exportIds() == (0L until 275L).toSet)
      assert(verifyAll().values.forall(_ == "unchanged"))
      val afterBoot = shardFiles()
      // POISON every already-exported admitted partition: if a later
      // cycle reads ANY of them, junk ids land in the export (or the
      // read blows up) — the content assertions below prove non-reads
      val junk = spark.range(1).select(lit(888888L).as("doc_id"),
        lit("POISON").as("text"), lit("junk").as("source"))
      (0L to 2L).foreach { b =>
        junk.write.mode("overwrite").parquet(s"$admitted/batch_seq=$b")
      }
      // growth batch: ids 275..349 — grows shard 5, adds shard 6
      writeBatch(3L, 275L, 350L)
      cycle(3L)
      assert(StreamVerbs.exportCursor(spark, state) == 3L)
      assert(exportIds() == (0L until 350L).toSet,
        "delta cycle must land exactly the new ids — and read no poison")
      assert(verifyAll().values.forall(_ == "unchanged"))
      val afterGrow = shardFiles()
      // untouched shards 0..4: byte-identical files (never rewritten)
      val untouched = afterBoot.filter(!_._1.contains("shard=5"))
      assert(untouched.forall { case (k, v) => afterGrow.get(k).contains(v) },
        "untouched export shards must not be rewritten")
      // CRASH WINDOW: cursor advance lost (crash between the resync and
      // the cursor swap) — rewind the cursor and replay the cycle: the
      // id-dedup absorbs the already-landed rows, the diff comes out
      // all-unchanged, and NOT EVEN the tail shards rewrite
      graft.ops.CarryState.replaceDir(spark, s"$state/export_cursor") {
        staging => spark.range(1).select(lit(2L).as("last_seq"))
          .write.mode("overwrite").parquet(staging)
      }
      cycle(3L)
      assert(StreamVerbs.exportCursor(spark, state) == 3L)
      assert(shardFiles() == afterGrow,
        "crash-replay of a completed cycle must be a byte-level no-op")
      assert(exportIds() == (0L until 350L).toSet)
      // BOOTSTRAP CRASH (the r17 advisory window): data landed, manifest
      // did not — the export must not silently serve a hole
      val export2 = Files.createTempDirectory("graft-odelta-exp2").toString
      val state2 = Files.createTempDirectory("graft-odelta-st2").toString
      docs.filter(col("doc_id") < 100)
        .withColumn("batch_seq", lit(0L))
        .write.partitionBy("batch_seq").mode("overwrite")
        .parquet(s"$state2/admitted")
      StreamVerbs.lifecycleExportCycle(spark, state2, export2, "doc_id",
        "text", 0L, docsPerShard = 50L)
      // reconstruct the crash: manifest gone, cursor not advanced
      Files.walk(java.nio.file.Paths.get(export2, "manifest"))
        .iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      Files.walk(java.nio.file.Paths.get(state2, "export_cursor"))
        .iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      StreamVerbs.lifecycleExportCycle(spark, state2, export2, "doc_id",
        "text", 0L, docsPerShard = 50L)
      val ver2 = graft.ops.Scale.verifyShards(spark, export2, "shard",
          "doc_id", graft.text.TextFns.tokenCount(col("text")).cast("long"),
          graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(ver2.nonEmpty && ver2.values.forall(_ == "unchanged"),
        s"bootstrap crash replay must complete the export: $ver2")
      // ADMITTED COMPACTION across the export boundary: folding the
      // exported partitions (never the newest) bounds the dir count and
      // the next cycle still prunes correctly off the cursor
      graft.ops.Scale.compactBatchStore(spark, admitted, upToSeq = 2L)
      def seqDirs() = Files.list(java.nio.file.Paths.get(admitted))
        .iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("batch_seq=")).toSet
      assert(seqDirs() == Set("batch_seq=-1", "batch_seq=3"), seqDirs())
      writeBatch(4L, 350L, 400L)
      cycle(4L)
      assert(exportIds() == (0L until 400L).toSet)
      assert(verifyAll().values.forall(_ == "unchanged"))
    } finally {
      Seq(state, export).foreach { d =>
        Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
          .toSeq.reverse.foreach(Files.deleteIfExists(_))
      }
      graft.ml.Dedup.unpersistIntermediates()
    }
  }
}
