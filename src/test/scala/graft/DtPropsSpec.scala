package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fns

/** Differential tests for the datetime family: Spark-side results compared
  * against java.time reference computations on calendar edge cases (leap
  * days, ISO week boundaries, year ends, month lengths) plus a seeded
  * random sample. The session timezone is UTC, and inputs are parsed from
  * strings on both sides, so the comparison is timezone-free.
  */
class DtPropsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val samples: Seq[String] = {
    val edges = Seq(
      "2024-02-29 13:45:10.123", "2024-02-28 23:59:59.999", "2023-02-28 00:00:00.000",
      "2024-12-31 23:59:59.000", "2025-01-01 00:00:00.000", "2024-01-01 00:00:00.001",
      "2024-03-31 12:00:00.000", "2024-04-30 23:00:00.000",
      // ISO week edges: 2021-01-03 is week 53 of 2020; 2021-01-04 starts week 1
      "2021-01-03 10:00:00.000", "2021-01-04 10:00:00.000", "2026-12-28 09:30:00.000",
      "1999-12-31 23:59:59.000", "2000-02-29 06:00:00.000", "2030-06-15 15:15:15.000")
    val rnd = new scala.util.Random(123)
    val gen = (0 until 250).map { _ =>
      val y = 1990 + rnd.nextInt(41)
      val m = 1 + rnd.nextInt(12)
      val d = 1 + rnd.nextInt(java.time.YearMonth.of(y, m).lengthOfMonth())
      f"$y%04d-$m%02d-$d%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d.${rnd.nextInt(1000)}%03d"
    }
    edges ++ gen
  }

  test("dt family matches java.time reference on calendar edges") {
    import spark.implicits._
    import java.time.{DayOfWeek, LocalDateTime, YearMonth}
    import java.time.format.DateTimeFormatter
    import java.time.temporal.{TemporalAdjusters, WeekFields}
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
    val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
    val df = samples.toDF("s").select(col("s"), to_timestamp(col("s")).as("ts"))
    val out = df.select(col("s"),
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"), quarter(col("ts")).as("q"),
        dayofyear(col("ts")).as("doy"), weekofyear(col("ts")).as("wk"),
        Fns.Dt.dayofweekMon0(col("ts")).as("dow0"),
        Fns.Dt.daysInMonth(col("ts")).as("dim"),
        Fns.Dt.isMonthEnd(col("ts")).as("me"),
        Fns.Dt.isYearStart(col("ts")).as("ys"),
        Fns.Dt.toPeriod(col("ts"), "Q").as("pq"),
        Fns.Dt.toPeriod(col("ts"), "W").as("pw"),
        Fns.Dt.totalSeconds(col("ts") - date_trunc("day", col("ts"))).as("sod"))
      .collect()
    assert(out.length == samples.length)
    out.foreach { r =>
      val s = r.getString(0)
      val dt = LocalDateTime.parse(s, fmt)
      def i(n: String) = r.getInt(r.fieldIndex(n))
      assert(i("y") == dt.getYear, s)
      assert(i("m") == dt.getMonthValue, s)
      assert(i("d") == dt.getDayOfMonth, s)
      assert(i("q") == (dt.getMonthValue - 1) / 3 + 1, s)
      assert(i("doy") == dt.getDayOfYear, s)
      assert(i("wk") == dt.get(WeekFields.ISO.weekOfWeekBasedYear()), s)
      assert(i("dow0") == dt.getDayOfWeek.getValue - 1, s)
      val dim = YearMonth.from(dt).lengthOfMonth
      assert(i("dim") == dim, s)
      assert(r.getBoolean(r.fieldIndex("me")) == (dt.getDayOfMonth == dim), s)
      assert(r.getBoolean(r.fieldIndex("ys")) == (dt.getDayOfYear == 1), s)
      assert(r.getString(r.fieldIndex("pq")) ==
        f"${dt.getYear}%04dQ${(dt.getMonthValue - 1) / 3 + 1}", s)
      val monday = dt.toLocalDate.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
      assert(r.getString(r.fieldIndex("pw")) ==
        s"${monday.format(dateFmt)}/${monday.plusDays(6).format(dateFmt)}", s)
      val sod = dt.toLocalTime.toNanoOfDay / 1e9
      assert(math.abs(r.getDouble(r.fieldIndex("sod")) - sod) < 1e-6, s)
    }
  }
}
