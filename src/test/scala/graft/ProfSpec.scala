package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Dedup
import graft.text.TextFns

/** Profiling harness — skipped unless GRAFT_PROF is set (it reads sf0.1). */
class ProfSpec extends AnyFunSuite {
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
}
