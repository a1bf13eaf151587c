package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: prints the executed plan of a named SparkEntry query so
  * exchange-reuse / shuffle-count claims can be checked by eye. Not part of
  * the driver contract.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-planprobe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count()  // materialize so AQE final plan is available
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
