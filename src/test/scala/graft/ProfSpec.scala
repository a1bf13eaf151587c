package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Dedup
import graft.text.TextFns

/** Profiling harness — skipped unless GRAFT_PROF is set (it reads sf0.1). */
class ProfSpec extends AnyFunSuite {
  test("batched BPE at 2048 merges on sf0.1: rounds compress and round " +
       "latency stays FLAT as the merge table grows (the 32k-merge evidence)") {
    assume(sys.env.contains("GRAFT_PROF"), "set GRAFT_PROF=1 to run profiling")
    val spark = TestSpark.spark
    import spark.implicits._
    // sf0.1 documents for corpus mass + 2000 deterministic pseudo-random
    // 32-char words (BpeSpec's md5 device, scaled 5x) so 2048 merge rounds
    // have a realistic vocabulary to chew through — the working set is
    // DISTINCT words, so this profiles round latency, not corpus size.
    // NOTE this corpus is exact batching's WORST case (random words -> a
    // tie-dense pair-frequency tail, where the prefix rule provably cannot
    // batch past the tie — see trainIncrementalBatched's scaladoc), so the
    // compression pin is deliberately the honest worst-case bound; the
    // claim that MAKES 32k merges feasible is the flat round latency.
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text")
    val md = java.security.MessageDigest.getInstance("MD5")
    val extra = (1 to 2000).map { i =>
      md.reset()
      md.digest(i.toString.getBytes("UTF-8"))
        .flatMap(b => Seq((b >> 4) & 0xf, b & 0xf))
        .map(n => ('a' + n).toChar).mkString
    }.grouped(8).map(_.mkString(" ")).toSeq.toDF("text")
    val corpus = docs.unionByName(extra)
    val t0 = System.nanoTime()
    var rounds = 0
    val roundTs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val merges = graft.text.Bpe.trainIncrementalBatched(corpus, "text",
      nMerges = 2048, onRound = (r, _) => {
        rounds = r; roundTs += (System.nanoTime() - t0) / 1e9
      }).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[prof] batched BPE: $merges merges in $rounds rounds, $dt%.1f s " +
      f"(${merges.toDouble / rounds}%.2f merges/round)")
    assert(merges == 2048L, s"corpus exhausted at $merges merges")
    // real compression even on the tie-dense worst case
    assert(rounds <= (2048 * 7) / 8,
      s"batching must compress rounds on the worst case: $rounds rounds")
    // flat latency: late rounds must not slow down as merges accumulate —
    // the delta design's whole point (a growing merge table must not grow
    // per-round cost). Compare mean per-round time of the last quarter
    // against the first quarter (after a 32-round JIT/warmup skip).
    val deltas = roundTs.zip(roundTs.drop(1)).map { case (a, b) => b - a }
      .drop(32)
    val q = deltas.size / 4
    val early = deltas.take(q).sum / q
    val late = deltas.takeRight(q).sum / q
    println(f"[prof] per-round s: first-quarter $early%.3f, last-quarter $late%.3f")
    assert(late < early * 2,
      f"late rounds must stay flat: $late%.3f s vs early $early%.3f s")
  }

  test("profile LSH internals at sf0.1") {
    assume(sys.env.contains("GRAFT_PROF"), "set GRAFT_PROF=1 to run profiling")
    val spark = TestSpark.spark
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm up shingling/codegen
    time("warmup shingles") {
      docs.select(explode(TextFns.wordShingles(col("text"), 3))).count()
    }
    time("string shingles (warm)") {
      docs.select(explode(TextFns.wordShingles(col("text"), 3))).count()
    }
    time("hash shingles (warm)") {
      docs.select(explode(TextFns.shingleHashes(col("text"), 3))).count()
    }
    time("exact jaccard pairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    val shjac = docs.select(col("doc_id").as("id"),
      explode(TextFns.shingleHashes(col("text"), 3)).as("g"))
    time("jaccard: shingle explode") { shjac.count() }
    val shC = shjac.cache(); shC.count()
    time("jaccard: self-join commons") {
      shC.as("a").join(shC.as("b"), Seq("g"))
        .where(col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).count().count()
    }
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).cache()
    pairs.count()
    time("connected components") { Dedup.connectedComponents(pairs).count() }
    time("keepCanonical") { Dedup.keepCanonical(docs, "doc_id", pairs).count() }
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 32, 42L)
    time("minhash signatures") { sigs.count() }
    time("minhash signatures again") { sigs.count() }
    val sigsC = sigs.cache()
    time("sig cache") { sigsC.count() }
    time("banding join from sigs") {
      Dedup.lshPairsFromSignatures(sigsC, 8, 4, 0.5).count()
    }
    val composed = Dedup.minhashSignaturesComposed(docs, "doc_id", "text", 3, 32, 42L)
    time("composed signatures") { composed.count() }
    time("simhash") { Dedup.simhash(docs, "doc_id", "text").count() }
    time("simhashPairs") { Dedup.simhashPairs(docs, "doc_id", "text").count() }
    val sh64 = Dedup.simhash(docs, "doc_id", "text").cache(); sh64.count()
    val chunked = sh64.select(col("id"),
      explode(org.apache.spark.sql.functions.array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)).as("ckey"))
    val buckets = chunked.groupBy("ckey").count()
    println("[prof] simhash bucket stats: " + buckets.agg(
      max("count").as("max"), expr("sum(count*count)").as("joinrows")).head())
  }

  test("ingestDedup per-batch latency stays flat as the index grows " +
       "(the standing-corpus-ingest evidence)") {
    assume(sys.env.contains("GRAFT_PROF"), "set GRAFT_PROF=1 to run profiling")
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft-prof-mh")
    try {
      Dedup.buildMinhashIndex(docs, "doc_id", "text", idx.toString,
        n = 3, bands = 16, rows = 2)
      runIngestFlatness(spark, idx.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(idx).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("ingestDedup flat-latency pin holds on the BAND-KEYED layout; " +
       "compaction keeps the probe flat vs partition accumulation") {
    assume(sys.env.contains("GRAFT_PROF"), "set GRAFT_PROF=1 to run profiling")
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft-prof-mhb")
    try {
      Dedup.buildMinhashIndex(docs, "doc_id", "text", idx.toString,
        n = 3, bands = 16, rows = 2, bandParts = 32)
      // same 12-batch flatness pin, now with every append maintaining the
      // banded layout and every probe partition-pruning against it
      runIngestFlatness(spark, idx.toString)
      // the probe after compaction must not be slower than the probe on
      // the accumulated 13-partition index (listing/footer overhead is
      // what compaction removes; at this scale it only must not REGRESS)
      val md = java.security.MessageDigest.getInstance("MD5")
      val probe = (1 to 500).map { i =>
        md.reset()
        val ws = (0 until 4).map(j =>
          md.digest(s"probe-$i-$j".getBytes("UTF-8"))
            .flatMap(x => Seq((x >> 4) & 0xf, x & 0xf))
            .map(n => ('a' + n).toChar).mkString)
        (90000000L + i, ws.mkString(" "))
      }.toDF("doc_id", "text").localCheckpoint()
      def probeTime(): Double = {
        val t0 = System.nanoTime()
        Dedup.dedupeAgainstIndex(spark, idx.toString, probe, "doc_id",
          "text", threshold = 0.9).count()
        (System.nanoTime() - t0) / 1e9
      }
      probeTime() // warm
      val tAccum = (1 to 3).map(_ => probeTime()).min
      Dedup.compactMinhashIndex(spark, idx.toString)
      val nParts = spark.read.parquet(s"${idx.toString}/sigs")
        .select("batch_seq").distinct().count()
      assert(nParts == 2, s"compaction must leave base+last: $nParts")
      probeTime() // warm post-compaction
      val tComp = (1 to 3).map(_ => probeTime()).min
      println(f"[prof] banded probe s: accumulated $tAccum%.2f, " +
        f"compacted $tComp%.2f")
      assert(tComp < tAccum * 1.5,
        f"compaction must not regress the probe: $tComp%.2f vs $tAccum%.2f")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(idx).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("winnow-index probe latency scales with the PROBE, not the corpus: " +
       "a small probe against 1x vs 4x corpus depth stays within 2.5x") {
    assume(sys.env.contains("GRAFT_PROF"), "set GRAFT_PROF=1 to run profiling")
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-prof-widx")
    try {
      // 1x index: a quarter of the corpus; 4x: the whole corpus — both
      // at the same partition count, so the probe's pruned read is the
      // same FRACTION and the per-partition depth quadruples
      val idx1 = s"$dir/one"; val idx4 = s"$dir/four"
      Dedup.buildWinnowIndex(spark, docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", idx1, n = 5, w = 4, parts = 64)
      Dedup.buildWinnowIndex(spark, docs, "doc_id", "text", idx4,
        n = 5, w = 4, parts = 64)
      val probe = docs.filter(col("doc_id") % 97 === 3).limit(50)
        .localCheckpoint()
      def t(idx: String): Double = {
        val t0 = System.nanoTime()
        Dedup.winnowCandidatesAgainstIndex(spark, idx, probe,
          "doc_id", "text", minShared = 2).count()
        (System.nanoTime() - t0) / 1e9
      }
      t(idx1); t(idx4) // warm
      val t1 = (1 to 3).map(_ => t(idx1)).min
      val t4 = (1 to 3).map(_ => t(idx4)).min
      println(f"[prof] winnow probe s: 1x-depth $t1%.2f, 4x-depth $t4%.2f")
      // a full-scan probe would track corpus size ~4x; the pruned probe
      // pays only its touched partitions' extra depth
      assert(t4 < t1 * 2.5,
        f"probe must not track corpus depth: $t4%.2f vs $t1%.2f")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** The 12-batch ingest-flatness loop shared by the flat and banded
    * layouts: novel synthetic batches append 500 sigs each; per-batch
    * latency must not grow with the standing partition count. */
  private def runIngestFlatness(spark: org.apache.spark.sql.SparkSession,
                                idxPath: String): Unit = {
    import spark.implicits._
    {
      // 12 batches of 500 synthetic novel docs: the index grows 5000 ->
      // ~11000 signatures across the run; per-batch work must not grow
      // with it (batch shingling dominates; the standing-sig scan is slim)
      val md = java.security.MessageDigest.getInstance("MD5")
      def batch(b: Int) = (1 to 500).map { i =>
        md.reset()
        val ws = (0 until 4).map(j =>
          md.digest(s"$b-$i-$j".getBytes("UTF-8"))
            .flatMap(x => Seq((x >> 4) & 0xf, x & 0xf))
            .map(n => ('a' + n).toChar).mkString)
        (b * 100000L + i, ws.mkString(" "))
      }.toDF("doc_id", "text")
      val ts = (1 to 12).map { b =>
        val df = batch(b)
        val t0 = System.nanoTime()
        val kept = Dedup.ingestDedup(spark, idxPath, df, "doc_id",
          "text", threshold = 0.9).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] ingest batch $b%2d: kept $kept, $dt%.2f s")
        assert(kept == 500L, s"synthetic batches are all-novel: $kept")
        dt
      }
      val early = ts.slice(2, 5).sum / 3   // skip 2 warmup batches
      val late = ts.takeRight(3).sum / 3
      println(f"[prof] ingest per-batch s: early $early%.2f, late $late%.2f")
      assert(late < early * 2,
        f"ingest must stay flat as the index grows: $late%.2f vs $early%.2f")
    }
  }
}
