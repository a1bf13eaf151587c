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
}
