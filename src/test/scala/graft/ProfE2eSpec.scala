package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Dedup
import graft.text.TextFns

/** Stage-by-stage profile of q_pipeline_e2e — skipped unless GRAFT_PROF. */
class ProfE2eSpec extends AnyFunSuite {
  test("profile pipeline e2e stages at sf0.1") {
    assume(sys.env.contains("GRAFT_PROF"), "set GRAFT_PROF=1 to run profiling")
    val spark = TestSpark.spark
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    docs.count()
    val qual = time("quality filter") {
      val q = graft.ops.Scale.spread(docs)
        .withColumn("q", TextFns.qualityScore(col("text")))
        .filter(col("q") >= 0.6).cache()
      q.count(); q
    }
    val pairs = time("minhashLshPairs thr=0.5") {
      val p = Dedup.minhashLshPairs(qual, "doc_id", "text", n = 3, threshold = 0.5).cache()
      println(s"[prof] n_pairs = ${p.count()}"); p
    }
    val labels = time("connectedComponents") {
      val l = Dedup.connectedComponents(pairs)
      println(s"[prof] n_labeled = ${l.count()}"); l
    }
    time("anti-join + langid + agg") {
      val dupes = labels.filter(col("id") =!= col("label"))
        .select(col("id").as("__dup_id"))
      qual.join(dupes, qual("doc_id") === col("__dup_id"), "left_anti")
        .withColumn("pred", TextFns.langId(col("text")))
        .groupBy("pred").count().count()
    }
  }
}
