package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scaling probe (not part of the driver contract): the bench's
  * sf0.1 corpus is overhead-bound (per-query ratios ≈1 between 8 and 32
  * cores — see the committed scaling table), so this inflates the
  * documents table IN MEMORY (N replicas with offset doc ids — the
  * read-only testdata is never touched) until the timed operators are
  * compute-bound, then times them under `SPARK_GRAFT_CPUS`. Run it at 8
  * and at 32 cores and compare: a CPU-bound operator should move toward
  * the core ratio.
  *
  *   SPARK_GRAFT_CPUS=8  sbt "runMain graft.tools.ScaleProbe 20"
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScaleProbe 20"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 20
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val nDocs = docs0.count()
    // N replicas with disjoint id ranges; localCheckpoint so the timed
    // region excludes the inflation and every pass reads materialized
    // blocks (not the parquet scan N times)
    val docs = (0 until reps).map(r =>
        docs0.select((col("doc_id") + lit(r * 10L * nDocs)).as("doc_id"),
          col("text")))
      .reduce(_ unionByName _)
      .repartition(cpus.toInt * 2)
      .localCheckpoint(true)
    println(s"[scaleprobe] cpus=$cpus reps=$reps rows=${docs.count()}")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scaleprobe] $name%-28s min ${times.min}%6.2f s  " +
        f"(all: ${times.map(t => f"$t%.2f").mkString(" ")})")
    }
    val ph = (c: org.apache.spark.sql.Column) =>
      graft.ops.Sketch.portableHash(c)
    time("winnow_fps (one-pass)") {
      graft.ml.Dedup.winnowFingerprints(docs, "doc_id", "text", 5, 4, ph)
    }
    time("shingle_hashes_md5") {
      docs.select(col("doc_id"),
        graft.text.TextFns.shingleHashesPortable(col("text"), 5).as("hs"))
    }
    time("lm_score (join+agg)") {
      graft.text.TextFns.lmScore(docs, "doc_id", "text", docs, "text")
    }
    time("global_rank (prefix sum)") {
      graft.ops.Scale.globalRowNumber(
        docs.select(col("doc_id"), length(col("text")).as("len")),
        Seq(col("len"), col("doc_id")))
    }
    spark.stop()
  }
}
