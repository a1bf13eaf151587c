package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fns, Vec}

/** The event-time operators accept either an integral epoch column or a
  * native TIMESTAMP/NTZ/DATE column ([[graft.plans.TimeToNanos]] canonical
  * axis) — the reference operates on datetime64 natively
  * (siuba/ops/generics.py:187-236), so a user handing timestamp parquet must
  * not need a manual cast.
  */
class TimeAdaptiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events = {
    import spark.implicits._
    // (id, user, seconds-offset) — gaps of 10s and 4000s exercise session
    // splits; ns/timestamp twins derive from the same instants
    Seq((1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 4010L), (4L, 2L, 5L),
        (5L, 2L, 7300L), (6L, 2L, 7310L))
      .toDF("id", "uid", "sec")
      .withColumn("ts_ns", col("sec") * 1000000000L)
      .withColumn("ts_t", timestamp_seconds(col("sec")))
      .withColumn("ts_ntz", col("ts_t").cast("timestamp_ntz"))
  }

  test("toNanos: long identity, timestamp micros*1000, date days, null-safe") {
    import spark.implicits._
    val df = Seq((42L, "2024-03-05 01:02:03.5", "2024-03-05"))
      .toDF("l", "t", "d")
      .select(
        Fns.Dt.toNanos(col("l")).as("ln"),
        Fns.Dt.toNanos(col("t").cast("timestamp")).as("tn"),
        Fns.Dt.toNanos(col("d").cast("date")).as("dn"),
        Fns.Dt.toNanos(lit(null).cast("timestamp")).as("nn"))
    val r = df.collect().head
    assert(r.getLong(0) == 42L)
    assert(r.getLong(1) == 1709600523500000000L) // epoch ns of the instant
    assert(r.getLong(2) == 1709596800000000000L) // midnight of the date
    assert(r.isNullAt(3))
  }

  test("sessionId: timestamp column == nanos-long column (gap in nanos)") {
    val gapNs = 1800L * 1000000000L
    def sess(tcol: String) = Tbl(events)
      .groupBy("uid")
      .arrange(col(tcol), col("id"))
      .mutate("session" -> Vec.sessionId(col(tcol), gapNs,
        order = Seq(col(tcol), col("id"))))
      .select(Seq("id", "session"): _*).df
    TestSpark.assertSameRows(sess("ts_ns"), sess("ts_t"), "ts vs ns")
    TestSpark.assertSameRows(sess("ts_ns"), sess("ts_ntz"), "ntz vs ns")
  }

  test("rollingSumRange/CountRange: timestamp order == nanos order") {
    val span = 60L * 1000000000L
    def roll(tcol: String) = Tbl(events)
      .groupBy("uid")
      .mutate(
        "rs" -> Vec.rollingSumRange(col("sec").cast("double"), col(tcol), span),
        "rn" -> Vec.rollingCountRange(col(tcol), span))
      .select(Seq("id", "rs", "rn"): _*).df
    TestSpark.assertSameRows(roll("ts_ns"), roll("ts_t"), "ts vs ns")
    TestSpark.assertSameRows(roll("ts_ns"), roll("ts_ntz"), "ntz vs ns")
  }

  test("range join: timestamp bounds == nanos bounds (bucketWidth in nanos)") {
    def iv(tcol: String) = events
      .select(col("id").as("iv_id"), col(tcol).as("s"))
      .withColumn("e",
        if (tcol == "ts_ns") col("s") + 100L * 1000000000L
        else col("s") + expr("interval 100 seconds"))
      .where(col("iv_id") % 2 === 1)
    def pt(tcol: String) = events.select(col(tcol).as("p"), col("id").as("pt_id"))
    def go(tcol: String) = graft.ops.RangeJoin.pointInInterval(
        pt(tcol), iv(tcol), "p", "s", "e", bucketWidth = 60L * 1000000000L)
      .select(col("iv_id"), col("pt_id"))
    TestSpark.assertSameRows(go("ts_ns"), go("ts_t"), "ts vs ns")
  }

  test("interval overlap: timestamp bounds == nanos bounds") {
    def side(tcol: String, m: Int, a: String, b: String) = events
      .where(col("id") % 2 === m)
      .select(col("id").as(a), col(tcol).as(b))
      .withColumn(b + "e",
        if (tcol == "ts_ns") col(b) + 50L * 1000000000L
        else col(b) + expr("interval 50 seconds"))
    def go(tcol: String) = graft.ops.RangeJoin.intervalOverlap(
        side(tcol, 1, "a_id", "a_s"), side(tcol, 0, "b_id", "b_s"),
        "a_s", "a_se", "b_s", "b_se", bucketWidth = 60L * 1000000000L)
      .select(col("a_id"), col("b_id"))
    TestSpark.assertSameRows(go("ts_ns"), go("ts_t"), "ts vs ns")
  }

  test("toNanos stays inside whole-stage codegen") {
    // a LocalRelation base constant-folds the whole projection away — round
    // trip through parquet so the executed plan has a real scan stage
    val dir = java.nio.file.Files.createTempDirectory("graft-tn").toString
    events.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).select(Fns.Dt.toNanos(col("ts_t")).as("n"))
    // `*(n)` is the codegen-stage marker in the executed-plan string — the
    // projection carrying time_to_nanos must sit inside a codegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [time_to_nanos"), plan)
    assert(df.count() == 6)
  }
}
