package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.dsl._

/** Spec-driven operator matrix, mirroring the reference's
  * test_dply_series_methods.py: every registry op is declared with its kind
  * and exercised against a small frame in the matching verb context
  * (agg → summarize, elwise → mutate, window → arrange+mutate). A missing
  * or broken op fails the matrix, not a hand-written example.
  */
class OpsMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val num = {
    import spark.implicits._
    Tbl(Seq((1.0, 1L, "a"), (2.0, 2L, "a"), (3.0, 3L, "b"), (4.0, 4L, "b"))
      .toDF("x", "i", "g"))
  }
  private lazy val strs = {
    import spark.implicits._
    Tbl(Seq(("Hello World", "a-1"), ("spark sql", "b-22")).toDF("s", "lbl"))
  }
  private lazy val dts = {
    import spark.implicits._
    Seq("2024-02-29 13:45:10", "2023-12-31 00:00:00")
      .toDF("raw").select(col("raw").cast("timestamp").as("ts"))
  }

  private val aggOps: Seq[(String, Column => Column)] = Seq(
    "mean" -> (_.mean()), "sum" -> (_.sum()), "min" -> (_.min()),
    "max" -> (_.max()), "count" -> (_.count()), "nunique" -> (_.nunique()),
    "nunique_approx" -> (_.nuniqueApprox()),
    "median" -> (_.median()), "quantile" -> (_.quantile(0.25)),
    "std" -> (_.std()), "var" -> (_.variance()), "sem" -> (_.sem()),
    "skew" -> (_.skew()), "kurt" -> (_.kurt()), "prod" -> (_.prod()),
    "size" -> (_.size()), "corr" -> (_.corr(col("i"))),
    "cov" -> (_.cov(col("i"))), "dot" -> (_.dot(col("i"))),
    "idxmax" -> (_.idxmax(col("i"))), "idxmin" -> (_.idxmin(col("i")))
  )

  private val elwiseOps: Seq[(String, Column => Column)] = Seq(
    "abs" -> (_.abs()), "round" -> (_.round(1)), "floor" -> (_.floor()),
    "ceil" -> (_.ceil()), "sqrt" -> (_.sqrt()), "exp" -> (_.exp()),
    "log" -> (_.log()), "pow" -> (_.pow(2)), "fillna" -> (_.fillna(0.0)),
    "isna" -> (_.isna()), "notna" -> (_.notna()),
    "astype" -> (_.astype("str")), "clip" -> (_.clip(1.5, 3.5)),
    "floordiv" -> (_.floordiv(lit(2)))
  )

  private val windowOps: Seq[(String, Column => GExpr)] = Seq(
    "cumsum" -> (_.cumsum()), "cummax" -> (_.cummax()),
    "cummin" -> (_.cummin()), "cumprod" -> (_.cumprod()),
    "cummean" -> (_.cummean()), "diff" -> (_.diff()),
    "pct_change" -> (_.pctChange()), "shift" -> (_.shift()),
    "rank" -> (_.rank()), "ffill" -> (_.ffill()), "bfill" -> (_.bfill())
  )

  private val strOps: Seq[(String, Column => Column)] = Seq(
    "upper" -> (_.str.upper()), "lower" -> (_.str.lower()),
    "len" -> (_.str.len()), "strip" -> (_.str.strip()),
    "lstrip" -> (_.str.lstrip()), "rstrip" -> (_.str.rstrip()),
    "title" -> (_.str.title()), "capitalize" -> (_.str.capitalize()),
    "contains" -> (_.str.contains("l")), "startswith" -> (_.str.startswith("H")),
    "endswith" -> (_.str.endswith("d")), "replace" -> (_.str.replace(" ", "_")),
    "findall" -> (_.str.findall("[a-z]+")), "extract" -> (_.str.extract("([A-Z])")),
    "split" -> (_.str.split(" ")), "get" -> (_.str.get(0)),
    "slice" -> (_.str.slice(0, 3)), "zfill" -> (_.str.zfill(15)),
    "pad" -> (_.str.pad(15)), "count" -> (_.str.count("l")),
    "find" -> (_.str.find("o")), "isalpha" -> (_.str.isalpha()),
    "isdigit" -> (_.str.isdigit()), "isalnum" -> (_.str.isalnum()),
    "isspace" -> (_.str.isspace()), "isupper" -> (_.str.isupper()),
    "islower" -> (_.str.islower()), "istitle" -> (_.str.istitle()),
    "cat" -> (_.str.cat(col("lbl"), "-")),
    "swapcase" -> (_.str.swapcase()), "center" -> (_.str.center(15, "*")),
    "wrap" -> (_.str.wrap(5)), "rsplit" -> (_.str.rsplit(" ", 1)),
    "slice_replace" -> (_.str.sliceReplace(1, 3, "XY")),
    "rfind" -> (_.str.rfind("l")), "ljust" -> (_.str.ljust(15, ".")),
    "rjust" -> (_.str.rjust(15, ".")), "isdecimal" -> (_.str.isdecimal()),
    "isnumeric" -> (_.str.isnumeric())
  )

  private val dtOps: Seq[(String, Column => Column)] = Seq(
    "year" -> (_.dt.year()), "month" -> (_.dt.month()), "day" -> (_.dt.day()),
    "hour" -> (_.dt.hour()), "minute" -> (_.dt.minute()),
    "second" -> (_.dt.second()), "quarter" -> (_.dt.quarter()),
    "week" -> (_.dt.week()), "dayofweek" -> (_.dt.dayofweek()),
    "dayofyear" -> (_.dt.dayofyear()), "date" -> (_.dt.date()),
    "normalize" -> (_.dt.normalize()), "days_in_month" -> (_.dt.daysInMonth()),
    "is_month_start" -> (_.dt.isMonthStart()), "is_month_end" -> (_.dt.isMonthEnd()),
    "is_quarter_end" -> (_.dt.isQuarterEnd()), "is_year_end" -> (_.dt.isYearEnd()),
    "month_name" -> (_.dt.monthName()), "day_name" -> (_.dt.dayName()),
    "strftime" -> (_.dt.strftime("yyyy-MM")), "floor_date" -> (_.dt.floor("month")),
    "ceil_date" -> (_.dt.ceil("month")), "to_period" -> (_.dt.toPeriod("M"))
  )

  test(s"agg ops (${aggOps.size}) evaluate in summarize context") {
    val out = num.groupBy("g")
      .summarize(aggOps.map { case (n, f) => n -> f(col("x")) }: _*)
    assert(out.df.count() == 2)
    assert(out.df.columns.length == 1 + aggOps.size)
  }

  test(s"agg ops broadcast in grouped-mutate context") {
    val safe = aggOps.filterNot(o => Set("quantile", "median").contains(o._1))
    val out = num.groupBy("g")
      .mutate(safe.map { case (n, f) => s"m_$n" -> (f(col("x")): GExpr) }: _*)
    assert(out.df.count() == 4)
  }

  test(s"elementwise ops (${elwiseOps.size}) evaluate in mutate context") {
    val out = num.mutate(elwiseOps.map { case (n, f) => s"e_$n" -> (f(col("x")): GExpr) }: _*)
    assert(out.df.count() == 4)
  }

  test(s"window ops (${windowOps.size}) evaluate with arrange state") {
    val out = num.groupBy("g").arrange(col("i"))
      .mutate(windowOps.map { case (n, f) => s"w_$n" -> f(col("x")) }: _*)
    assert(out.df.count() == 4)
  }

  test(s"str ops (${strOps.size}) evaluate") {
    val out = strs.mutate(strOps.map { case (n, f) => s"s_$n" -> (f(col("s")): GExpr) }: _*)
    assert(out.df.count() == 2)
  }

  test("new str ops: swapcase/center/wrap/rsplit/slice_replace semantics") {
    val out = strs.mutate(
      "sw" -> graft.functions.Fns.Str.swapcase(col("s")),
      "ce" -> graft.functions.Fns.Str.center(col("s"), 15, "*"),
      "wr" -> graft.functions.Fns.Str.wrap(col("s"), 6),
      "rs" -> graft.functions.Fns.Str.rsplit(col("s"), " ", 1),
      "sr" -> graft.functions.Fns.Str.sliceReplace(col("s"), 1, 4, "XY"))
      .df.where(col("s") === "Hello World").head()
    assert(out.getString(out.fieldIndex("sw")) == "hELLO wORLD")
    assert(out.getString(out.fieldIndex("ce")) == "**Hello World**")
    assert(out.getString(out.fieldIndex("wr")) == "Hello\nWorld")
    assert(out.getSeq[String](out.fieldIndex("rs")) == Seq("Hello", "World"))
    assert(out.getString(out.fieldIndex("sr")) == "HXYo World")
  }

  test(s"dt ops (${dtOps.size}) evaluate") {
    val out = Tbl(dts).mutate(dtOps.map { case (n, f) => s"d_$n" -> (f(col("ts")): GExpr) }: _*)
    assert(out.df.count() == 2)
    // spot-check semantics: Monday=0 dayofweek; leap-day month end
    val r = out.df.where(col("ts").cast("string").startsWith("2024-02-29")).head()
    assert(r.getInt(out.df.columns.indexOf("d_dayofweek")) == 3) // Thursday
    assert(r.getBoolean(out.df.columns.indexOf("d_is_month_end")))
  }

  test("rfind/ljust/rjust/isdecimal/isnumeric semantics") {
    import spark.implicits._
    val d = Seq(("Hello World", "42", "Ⅻ"), ("xyz", "4.2", "abc"))
      .toDF("s", "n", "u")
    val out = Tbl(d).mutate(
      "rf"  -> __.s.str.rfind("l"),
      "rf0" -> __.s.str.rfind("Q"),
      "lj"  -> __.s.str.ljust(13, "."),
      "rj"  -> __.s.str.rjust(13, "."),
      "dec" -> __.n.str.isdecimal(),
      "num" -> __.u.str.isnumeric())
    val r = out.df.where(col("s") === "Hello World").head()
    def idx(n: String) = out.df.columns.indexOf(n)
    assert(r.getLong(idx("rf")) == 9)   // last 'l' in "Hello World"
    assert(r.getLong(idx("rf0")) == -1)
    assert(r.getString(idx("lj")) == "Hello World..")
    assert(r.getString(idx("rj")) == "..Hello World")
    assert(r.getBoolean(idx("dec")))          // "42"
    assert(r.getBoolean(idx("num")))          // roman numeral XII, category N
    val r2 = out.df.where(col("s") === "xyz").head()
    assert(!r2.getBoolean(idx("dec")))        // "4.2" has a dot
    assert(!r2.getBoolean(idx("num")))        // "abc"
  }

  test("to_period labels every freq; total_seconds measures a timestamp diff") {
    import org.apache.spark.sql.functions.date_trunc
    val out = Tbl(dts).mutate(
      "p_y" -> __.ts.dt.toPeriod("Y"),
      "p_q" -> __.ts.dt.toPeriod("Q"),
      "p_w" -> __.ts.dt.toPeriod("W"),
      "p_d" -> __.ts.dt.toPeriod("D"),
      "secs" -> (col("ts") - date_trunc("day", col("ts"))).dt.totalSeconds())
    val r = out.df.where(col("ts").cast("string").startsWith("2024-02-29")).head()
    def s(n: String) = r.getString(out.df.columns.indexOf(n))
    assert(s("p_y") == "2024")
    assert(s("p_q") == "2024Q1")
    // 2024-02-29 is a Thursday: Mon 2024-02-26 .. Sun 2024-03-03
    assert(s("p_w") == "2024-02-26/2024-03-03")
    assert(s("p_d") == "2024-02-29")
    // 13:45:10 since midnight
    assert(r.getDouble(out.df.columns.indexOf("secs")) == 13 * 3600 + 45 * 60 + 10.0)
  }

  test("dsl proxy __ builds column refs and composes") {
    val out = num.groupBy("g").mutate("demeaned" -> (__.x - __.x.mean()))
    assert(out.df.columns.contains("demeaned"))
    assert(out.df.count() == 4)
  }
}
