package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.dsl._
import graft.functions.{Fns, Vec}

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
    "quantile_approx" -> (_.quantileApprox(0.25)),
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
    "floordiv" -> (_.floordiv(lit(2))),
    "where" -> (_.where(col("x") > 2, lit(-1.0))),
    "mask" -> (_.mask(col("x") > 2)), "isin" -> (_.isin(1.0, 3.0)),
    "near" -> (_.near(col("x") + lit(1e-9)))
  )

  private val windowOps: Seq[(String, Column => GExpr)] = Seq(
    "cumsum" -> (_.cumsum()), "cummax" -> (_.cummax()),
    "cummin" -> (_.cummin()), "cumprod" -> (_.cumprod()),
    "cummean" -> (_.cummean()), "diff" -> (_.diff()),
    "pct_change" -> (_.pctChange()), "shift" -> (_.shift()),
    "rank" -> (_.rank()), "ffill" -> (_.ffill()), "bfill" -> (_.bfill()),
    "autocorr" -> (_.autocorr()), "is_monotonic" -> (_.isMonotonic()),
    "is_monotonic_increasing" -> (_.isMonotonicIncreasing()),
    "is_monotonic_decreasing" -> (_.isMonotonicDecreasing()),
    "duplicated" -> (_.duplicated())
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
    "isnumeric" -> (_.str.isnumeric()),
    "translate" -> (_.str.translate("lo", "01"))
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
    "ceil_date" -> (_.dt.ceil("month")), "to_period" -> (_.dt.toPeriod("M")),
    "tz_localize" -> (_.dt.tzLocalize("America/New_York")),
    "tz_convert" -> (_.dt.tzConvert("Asia/Tokyo"))
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

  test("autocorr matches pandas' shifted-corr definition (nested-window hoist)") {
    import spark.implicits._
    // series 1,2,4,8,3 grouped in one partition; pandas s.autocorr(1) =
    // corr([2,4,8,3],[1,2,4,8]) = corr of pairs
    val d = Tbl(Seq((1, 1.0), (2, 2.0), (3, 4.0), (4, 8.0), (5, 3.0))
      .toDF("i", "x"))
    val got = d.arrange(col("i")).mutate("ac" -> Vec.autocorr(col("x")))
      .df.select("ac").head().getDouble(0)
    val xs = Seq(1.0, 2.0, 4.0, 8.0, 3.0)
    val (a, b) = (xs.tail, xs.init)
    def mean(v: Seq[Double]) = v.sum / v.size
    val (ma, mb) = (mean(a), mean(b))
    val cov = a.zip(b).map { case (p, q) => (p - ma) * (q - mb) }.sum
    val exp = cov / math.sqrt(
      a.map(p => (p - ma) * (p - ma)).sum * b.map(q => (q - mb) * (q - mb)).sum)
    assert(math.abs(got - exp) < 1e-12, s"got $got expected $exp")
  }

  test("nested-window hoist: window-typed ARGUMENT (depth 3) equals staged computation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{sum => fsum, lag => flag, bool_and, coalesce => fcoalesce}
    val d = Seq((1, 2.0), (2, -1.0), (3, 5.0), (4, 0.5)).toDF("i", "v")
    val wOrd = Window.orderBy("i")
    // cs is itself a window; the monotonicity expression nests lag(cs) inside
    // bool_and(...) — three window levels in one Column tree
    val cs = fsum(col("v")).over(wOrd)
    val nested = bool_and(cs.isNotNull &&
      fcoalesce(cs >= flag(cs, 1).over(wOrd), lit(true))).over(Window.partitionBy())
    val (binds, rewritten) = org.apache.spark.sql.graftshim.Shim
      .hoistNestedWindows(nested, "__t")
    assert(binds.nonEmpty, "triple nesting must produce hoisted bindings")
    val withBinds = binds.foldLeft(d) { case (acc, (n, c)) => acc.withColumn(n, c) }
    val got = withBinds.withColumn("mono", rewritten)
      .select("mono").head().getBoolean(0)
    // staged reference: materialize cs, then lag, then bool_and
    val staged = d.withColumn("cs", cs)
      .withColumn("pl", flag(col("cs"), 1).over(wOrd))
      .select(bool_and(col("cs").isNotNull &&
        fcoalesce(col("cs") >= col("pl"), lit(true))).as("mono"))
      .head().getBoolean(0)
    assert(got == staged)
    assert(!got, "cumsum of mixed-sign values is not monotone here")
  }

  test("is_monotonic / duplicated semantics, incl. NULL handling") {
    import spark.implicits._
    val d = Tbl(Seq((1, Some(1.0), "a"), (2, Some(2.0), "b"), (3, Some(2.0), "a"),
        (4, None, "c"), (5, Some(9.0), "a"))
      .toDF("i", "x", "s"))
    val inc = d.arrange(col("i"))
      .mutate("m" -> Vec.isMonotonicIncreasing(col("x")))
      .df.select("m").head().getBoolean(0)
    assert(!inc, "NULL must break monotonicity (pandas NaN rule)")
    val d2 = Tbl(Seq((1, 1.0), (2, 2.0), (3, 2.0)).toDF("i", "x"))
    assert(d2.arrange(col("i")).mutate("m" -> Vec.isMonotonicIncreasing(col("x")))
      .df.select("m").head().getBoolean(0), "non-strict: equal values stay monotonic")
    val dup = d.arrange(col("i")).mutate("dp" -> Vec.duplicated(col("s")))
      .df.orderBy("i").select("dp").collect().map(_.getBoolean(0)).toSeq
    assert(dup == Seq(false, false, true, false, true))
  }

  test("where/mask/isin semantics; NULL cond takes other (pandas NaN-not-True)") {
    import spark.implicits._
    val d = Tbl(Seq((1, Some(5.0)), (2, None), (3, Some(-2.0))).toDF("i", "x"))
    val r = d.mutate(
        "w" -> Fns.where(col("x"), col("x") > 0, lit(0.0)),
        "m" -> Fns.mask(col("x"), col("x") < 0))
      .df.orderBy("i").collect()
    assert(r(0).getDouble(2) == 5.0 && r(0).getDouble(3) == 5.0)
    // x NULL: cond is NULL -> where takes other; mask keeps x (still NULL)
    assert(r(1).getDouble(2) == 0.0 && r(1).isNullAt(3) && r(1).isNullAt(1))
    assert(r(2).getDouble(2) == 0.0 && r(2).isNullAt(3))
  }

  test("explode verb: list rows multiply, empty list keeps a NULL row") {
    import spark.implicits._
    val d = Tbl(Seq((1, Seq("a", "b")), (2, Seq.empty[String]), (3, Seq("c")))
      .toDF("i", "xs"))
    val out = d.explode("xs").df.orderBy("i", "xs")
      .collect().map(r => (r.getInt(0), Option(r.getString(1))))
    assert(out.toSeq == Seq((1, Some("a")), (1, Some("b")), (2, None), (3, Some("c"))))
  }

  test("funnel: ordered steps, out-of-order stages don't convert") {
    import spark.implicits._
    val ev = Tbl(Seq(
      (1L, "click", 1L), (1L, "view", 2L), (1L, "purchase", 3L), // full path
      (2L, "view", 3L), (2L, "click", 5L),                       // view BEFORE click
      (3L, "view", 1L), (3L, "purchase", 2L)                     // never clicked
    ).toDF("u", "stage", "t"))
    val f = ev.groupBy("u")
      .funnel(col("t"), col("stage"), Seq("click", "view", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(f.toSeq == Seq((1, "click", 2L), (2, "view", 1L), (3, "purchase", 1L)))
    intercept[IllegalArgumentException] {
      ev.funnel(col("t"), col("stage"), Seq("click"))
    }
  }

  test("sessionId: hand-checked gap sessions per group") {
    import spark.implicits._
    val d = Tbl(Seq((1L, 0L), (1L, 10L), (1L, 2000L), (1L, 2005L), (2L, 5L))
      .toDF("u", "t"))
    val out = d.groupBy("u").arrange(col("t"))
      .mutate("s" -> Vec.sessionId(col("t"), gap = 100L))
      .df.orderBy("u", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0L, 1L), (1L, 10L, 1L), (1L, 2000L, 2L),
                            (1L, 2005L, 2L), (2L, 5L, 1L)))
    // boundary: a gap of EXACTLY `gap` does not open a session (> not >=)
    val b = Tbl(Seq((1L, 0L), (1L, 100L), (1L, 201L)).toDF("u", "t"))
      .groupBy("u").arrange(col("t"))
      .mutate("s" -> Vec.sessionId(col("t"), gap = 100L))
      .df.orderBy("t").collect().map(_.getLong(2))
    assert(b.toSeq == Seq(1L, 1L, 2L))
  }

  test("topKApprox: grouped tidy top-k equals exact counts in the small-cardinality regime") {
    val docs = Tbl(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val approx = docs.groupBy("source").topKApprox("lang", 32).df
    val exact = docs.df.groupBy("source", "lang")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("est_count"))
    TestSpark.assertSameRows(approx, exact, clue = "grouped topKApprox exact regime")
    // ungrouped, weighted by n_chars: equals weighted groupBy
    val approxW = docs.topKApprox("lang", 32, w = Some(col("n_chars"))).df
    val exactW = docs.df.groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_chars").as("est_count"))
    TestSpark.assertSameRows(approxW, exactW, clue = "weighted topKApprox exact regime")
  }

  test("describeExact: hand-checked exact quartiles in tidy long form") {
    import spark.implicits._
    // v = 1..9: quartiles land exactly on values (type-7/quantile_cont:
    // q25=3, q50=5, q75=7); u = 1..4 interpolates (q25=1.75, q50=2.5)
    val d = Tbl((1 to 9).map(i => (i.toDouble, math.min(i, 4).toDouble))
      .toDF("v", "u"))
    val rows = d.describeExact().df.collect()
      .map(r => r.getString(0) -> r).toMap
    val v = rows("v")
    assert(v.getLong(1) == 9 && v.getDouble(2) == 5.0) // count, mean
    assert(v.getDouble(5) == 3.0 && v.getDouble(6) == 5.0 && v.getDouble(7) == 7.0)
    assert(v.getDouble(4) == 1.0 && v.getDouble(8) == 9.0) // min, max
    val u = rows("u") // 1,2,3,4,4,4,4,4,4 -> q25 = 2.0? positions: p=q*(n-1)
    // sorted u: [1,2,3,4,4,4,4,4,4]; q25 pos=2 -> 3.0; q50 pos=4 -> 4.0
    assert(u.getDouble(5) == 3.0 && u.getDouble(6) == 4.0)
    // no numeric columns -> loud refusal
    intercept[IllegalArgumentException] {
      Tbl(Seq(("a", "b")).toDF("x", "y")).describeExact()
    }
  }

  test("getDummies: sorted level indicators, nulls all-zero") {
    import spark.implicits._
    val d = Tbl(Seq((1, "b"), (2, "a"), (3, null), (4, "b")).toDF("i", "v"))
    val out = d.getDummies("v").df.orderBy("i").collect()
    val cols = d.getDummies("v").df.columns.toSeq
    assert(cols == Seq("i", "v", "v_a", "v_b"))
    assert(out.map(r => (r.getInt(2), r.getInt(3))).toSeq ==
      Seq((0, 1), (1, 0), (0, 0), (0, 1)))
    // high-cardinality guard refuses loudly
    val wide = Tbl((1 to 50).map(i => (i, s"lv$i")).toDF("i", "v"))
    intercept[GraftError] { wide.getDummies("v", maxLevels = 10) }
    // levels with dots/spaces/backticks yield addressable indicator names
    val odd = Tbl(Seq((1, "a.b"), (2, "c d"), (3, "e`f")).toDF("i", "v"))
    val oddCols = odd.getDummies("v").df.columns.toSeq
    assert(oddCols == Seq("i", "v", "v_a_b", "v_c_d", "v_e_f"))
    assert(odd.getDummies("v").df.select("v_a_b").where(col("v_a_b") === 1)
      .count() == 1)
  }

  test("sampleQuota without strata plans a global top-k, not a global window") {
    import spark.implicits._
    val d = Tbl((1 to 500).map(i => (i.toLong, i % 7)).toDF("id", "g"))
    val top = d.sampleQuota(Nil, Seq(col("id").desc), 5)
    assert(top.df.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(496L, 497L, 498L, 499L, 500L))
    val plan = top.df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("rollingStd/Var and weightedMean, hand-checked incl. NULL pairs") {
    import spark.implicits._
    val d = Tbl(Seq((1, 2.0), (2, 4.0), (3, 6.0)).toDF("i", "x"))
    val rs = d.arrange(col("i"))
      .mutate("s" -> Vec.rollingStd(col("x"), 2), "v" -> Vec.rollingVar(col("x"), 2))
      .df.orderBy("i").collect()
    assert(rs(0).isNullAt(2), "1-row frame has no sample std")
    assert(math.abs(rs(1).getDouble(2) - math.sqrt(2.0)) < 1e-12)
    assert(math.abs(rs(2).getDouble(3) - 2.0) < 1e-12)
    val wm = Tbl(Seq((Some(10.0), Some(1.0)), (Some(20.0), Some(3.0)),
        (Some(99.0), None), (None, Some(5.0))).toDF("x", "w"))
      .summarize("m" -> Fns.Agg.weightedMean(col("x"), col("w")))
      .df.head().getDouble(0)
    assert(math.abs(wm - (10.0 * 1 + 20.0 * 3) / 4.0) < 1e-12,
      s"NULL x or w rows must drop from both sums, got $wm")
  }

  test("expandingVar/Std/Min/Max: var matches the exact integer formula") {
    import spark.implicits._
    val d = Tbl((1L to 300L).map(i => (i % 5, i, (i * 37 % 1000).toDouble))
      .toDF("g", "i", "x"))
    val out = d.groupBy("g").arrange(col("i"))
      .mutate("ev" -> Vec.expandingVar(col("x")),
              "es" -> Vec.expandingStd(col("x")),
              "mn" -> Vec.expandingMin(col("x")),
              "mx" -> Vec.expandingMax(col("x")),
              "n" -> Vec.rowNumber(col("i")).transform(_.cast("bigint")),
              "s" -> Vec.cumsum(col("x").cast("bigint")),
              "s2" -> Vec.cumsum((col("x") * col("x")).cast("bigint")))
      .df.collect()
    out.foreach { r =>
      val n = r.getLong(r.fieldIndex("n"))
      val s = r.getLong(r.fieldIndex("s"))
      val s2 = r.getLong(r.fieldIndex("s2"))
      if (n == 1) assert(r.isNullAt(r.fieldIndex("ev")))
      else {
        val exact = (n * s2 - s * s).toDouble / (n * (n - 1))
        assert(math.abs(r.getDouble(r.fieldIndex("ev")) - exact) < 1e-6 * (1 + exact))
        assert(math.abs(r.getDouble(r.fieldIndex("es")) - math.sqrt(exact)) <
          1e-6 * (1 + math.sqrt(exact)))
      }
      assert(r.getDouble(r.fieldIndex("mn")) <= r.getDouble(r.fieldIndex("mx")))
    }
  }

  test("rollingQuantile: linear interpolation, q=0.5 equals rollingMedian") {
    import spark.implicits._
    // pandas pin: Series([4,1,3,2]).rolling(3, min_periods=1).quantile(0.25)
    //   -> [4.0, 1.75, 2.0, 1.5]
    val d = Tbl(Seq((1, 4.0), (2, 1.0), (3, 3.0), (4, 2.0)).toDF("i", "x"))
    val got = d.arrange(col("i"))
      .mutate("q" -> Vec.rollingQuantile(col("x"), 0.25, 3))
      .df.orderBy("i").collect().map(_.getDouble(2)).toSeq
    assert(got == Seq(4.0, 1.75, 2.0, 1.5), got)
    // q=0.5 must agree with the rolling median on a bigger randomized frame
    val big = Tbl((1L to 300L).map(i => (i, (i * 37 % 101).toDouble))
      .toDF("i", "x"))
    val both = big.arrange(col("i"))
      .mutate("med" -> Vec.rollingMedian(col("x"), 7),
              "q50" -> Vec.rollingQuantile(col("x"), 0.5, 7))
      .df.collect()
    both.foreach(r => assert(r.getDouble(2) == r.getDouble(3),
      s"row ${r.getLong(0)}: med=${r.getDouble(2)} q50=${r.getDouble(3)}"))
  }

  test("range-frame rolling: trailing span includes peers, hand-checked") {
    import spark.implicits._
    // ts 0,5,5,12,100 with span 10: frames {0},{0,5,5},{0,5,5},{5,5,12},{100}
    val d = Tbl(Seq((1, 0L, 1.0), (2, 5L, 2.0), (3, 5L, 4.0),
        (4, 12L, 8.0), (5, 100L, 16.0)).toDF("id", "ts", "v"))
    val out = d.mutate(
        "s" -> Vec.rollingSumRange(col("v"), col("ts"), 10L),
        "n" -> Vec.rollingCountRange(col("ts"), 10L))
      .df.orderBy("id").collect()
      .map(r => (r.getDouble(3), r.getLong(4))).toSeq
    assert(out == Seq((1.0, 1L), (7.0, 3L), (7.0, 3L), (14.0, 3L), (16.0, 1L)))
  }

  test("tz_localize/tz_convert match java.time zone math (incl. DST edge)") {
    import spark.implicits._
    import java.time._
    val samples = Seq("2024-03-10 02:30:00", "2024-07-01 12:00:00",
      "2024-11-03 01:30:00", "2021-01-01 00:00:00")
    val d = samples.toDF("raw").select(col("raw").cast("timestamp").as("ts"))
    val got = d.select(
        col("ts"),
        Fns.Dt.tzLocalize(col("ts"), "America/New_York").as("loc"),
        Fns.Dt.tzConvert(col("ts"), "Asia/Tokyo").as("conv"))
      .collect()
    got.foreach { r =>
      val naive = r.getTimestamp(0).toLocalDateTime
      // tz_localize: interpret naive as NY wall clock -> instant (session UTC)
      val expLoc = naive.atZone(ZoneId.of("America/New_York"))
        .withZoneSameInstant(ZoneId.of("UTC")).toLocalDateTime
      assert(r.getTimestamp(1).toLocalDateTime == expLoc, s"localize $naive")
      // tz_convert: treat naive as UTC instant -> Tokyo wall clock
      val expConv = naive.atZone(ZoneId.of("UTC"))
        .withZoneSameInstant(ZoneId.of("Asia/Tokyo")).toLocalDateTime
      assert(r.getTimestamp(2).toLocalDateTime == expConv, s"convert $naive")
    }
  }
}
