package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: writes the `explain("formatted")` output of named
  * SparkEntry queries to files (for the plans/rNN before/after evidence the
  * optimization rounds commit). Mirrors Bench's session configuration so the
  * captured plan shape is the one the bench actually runs. Not part of the
  * driver contract.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <query...>
  * Writes <outDir>/<query>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // formatted mode BEFORE execution shows the initial plan; executing
      // first lets AQE finalize, and the executedPlan string carries the
      // final join strategies / AQEShuffleRead nodes. Capture both.
      val initial = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      df.count()
      val fin = df.queryExecution.executedPlan.toString
      val body = s"==== $name (explain formatted, initial plan) ====\n" +
        initial + s"\n==== $name (executed plan after AQE) ====\n" + fin
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        body.getBytes("UTF-8"))
      // bench hygiene: each query measured/planned from a clean cache
      graft.ml.Dedup.unpersistIntermediates()
      spark.catalog.clearCache()
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
