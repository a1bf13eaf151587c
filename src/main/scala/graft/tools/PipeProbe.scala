package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tbl
import graft.functions.Fns
import graft.ml.Dedup
import graft.text.TextFns

/** Dev-only probe: times each stage of q_pipeline_e2e separately at the
  * bench's exact session settings, so a regression can be attributed to a
  * stage instead of guessed. Not part of the driver contract.
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      val qual = Tbl(Dedup.trackCache(
        Tbl(graft.ops.Scale.spread(docs))
          .mutate("q" -> TextFns.qualityScore(col("text")))
          .filter(col("q") >= 0.6)
          .df))
      time("qual materialize")(qual.df.count())
      val pairs = Dedup.minhashLshPairs(qual.df, "doc_id", "text",
        n = 3, threshold = 0.5)
      time("pairs count")(pairs.count())
      val canon = Dedup.keepCanonical(qual.df, "doc_id", pairs)
      time("keepCanonical")(canon.count())
      val out = Tbl(canon)
        .mutate("pred"  -> TextFns.langId(col("text")),
                "n_tok" -> TextFns.tokenCount(col("text")).cast("long"))
        .groupBy("pred")
        .summarize(
          "n_docs"    -> Fns.Agg.n(),
          "sum_tok"   -> sum(col("n_tok")),
          "avg_chars" -> (round(sum(length(col("text"))), 2) / count(lit(1))))
        .df
      time("final agg")(out.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
