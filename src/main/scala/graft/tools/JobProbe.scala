package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic (not part of the bench contract): run named SparkEntry
  * queries once each and report wall seconds, Spark JOB count, STAGE
  * count, total task count and summed task time. At small scale the
  * wall clock of a query is roughly (serial jobs × per-job overhead) +
  * (serial stages × per-stage overhead) + real work — this separates
  * those terms so optimization effort lands where the time is.
  *
  *   sbt "runMain graft.tools.JobProbe q_lifecycle_e2e q_ccnet_buckets"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (tbl <- Seq("region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$tbl.parquet").count()

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val jobSites = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val verbose = sys.env.contains("GRAFT_PROBE_JOBS")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized {
          jobs += 1
          if (verbose) {
            // the final stage's name is the action's call site
            val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
            jobSites.merge(site, 1, (a, b) => a + b)
          }
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized { stages += 1 }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        synchronized {
          tasks += 1
          if (t.taskInfo != null) taskMs += t.taskInfo.duration
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "2").toInt
    for (name <- args; fn <- graft.SparkEntry.queries.get(name)) {
      // rep 0 warms JIT/codegen caches; later reps measure
      for (r <- 0 until reps) {
        jobs = 0; stages = 0; tasks = 0; taskMs = 0L
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        Thread.sleep(200) // let the listener bus drain
        println(f"[probe] $name%-28s rep$r wall ${dt}%6.2f s  " +
          f"jobs $jobs%4d  stages $stages%4d  tasks $tasks%5d  " +
          f"taskTime ${taskMs / 1e3}%7.1f s")
        if (verbose && r == reps - 1) {
          import scala.jdk.CollectionConverters._
          jobSites.asScala.toSeq.sortBy(-_._2).take(30).foreach {
            case (site, nJ) => println(f"[probe-jobs] $nJ%4d  $site") }
          jobSites.clear()
        } else jobSites.clear()
      }
    }
    spark.stop()
  }
}
