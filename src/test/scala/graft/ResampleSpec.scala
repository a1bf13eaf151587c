package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Resample

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("daily resample fills gaps per group with the supplied defaults") {
    val df = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1.0),
      ("a", ts("2024-01-01 11:00:00"), 2.0),
      ("a", ts("2024-01-04 09:00:00"), 4.0), // gap: Jan 2, Jan 3
      ("b", ts("2024-02-10 00:00:00"), 7.0)  // single-day group: no spine rows
    ).toDF("k", "t", "v")
    val out = Resample.resample(df, col("t"), "day", Seq("k"),
      Seq("n" -> count(lit(1)), "s" -> sum("v")),
      fill = Map("n" -> lit(0L)))
      .orderBy("k", "bucket")
      .select(col("k"), col("bucket").cast("date").cast("string"), col("n"), col("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 2L, Some(3.0)),
      ("a", "2024-01-02", 0L, None), // un-filled agg stays NULL
      ("a", "2024-01-03", 0L, None),
      ("a", "2024-01-04", 1L, Some(4.0)),
      ("b", "2024-02-10", 1L, Some(7.0))))
  }

  test("keyless resample and month unit (calendar-interval stepping)") {
    val df = Seq(
      (ts("2024-01-15 00:00:00"), 1),
      (ts("2024-04-02 00:00:00"), 2) // gaps: Feb, Mar
    ).toDF("t", "v")
    val out = Resample.resample(df, col("t"), "month", Nil,
      Seq("n" -> count(lit(1))), fill = Map("n" -> lit(0L)))
      .orderBy("bucket")
      .select(col("bucket").cast("date").cast("string"), col("n"))
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 1L), ("2024-02-01", 0L),
      ("2024-03-01", 0L), ("2024-04-01", 1L)))
  }
}
