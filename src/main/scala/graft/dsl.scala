package graft

import scala.language.dynamics
import org.apache.spark.sql.{Column, functions => F}
import graft.functions.{Fns, Vec}

/** The `_`-expression DSL (SURVEY §7.4 item 8): the reference builds lazy
  * column ASTs by operator overloading on a `Symbolic` proxy
  * (siuba/siu/symbolic.py:28-157). Scala's analogue is a `Dynamic` proxy
  * emitting Spark `Column`s plus pandas-named method extensions carrying the
  * ops registry's kind tags: elementwise/agg methods return `Column`
  * (auto-windowized in mutate/filter context), window-kind methods return
  * `GExpr` (need the verb's partition/order state).
  *
  * {{{
  * import graft.dsl._
  * tbl.groupBy("cyl").mutate("demeaned" -> (__.hp - __.hp.mean()))
  * tbl.arrange(__.mpg).mutate("cs" -> __.mpg.cumsum())
  * tbl.mutate("up" -> __.name.str.upper(), "yr" -> __.ts.dt.year())
  * }}}
  */
object dsl {

  /** `__.colName` builds `col("colName")` — the `_` proxy. */
  object __ extends Dynamic {
    def selectDynamic(name: String): Column = F.col(name)
  }

  /** String accessor (`_.x.str.*`, generics.py:127-182). */
  final class StrAccessor(private val c: Column) {
    def upper(): Column = F.upper(c)
    def lower(): Column = F.lower(c)
    def len(): Column = F.length(c)
    def strip(): Column = F.trim(c)
    def lstrip(): Column = F.ltrim(c)
    def rstrip(): Column = F.rtrim(c)
    def title(): Column = F.initcap(c)
    def capitalize(): Column = Fns.Str.capitalize(c)
    def contains(s: String): Column = c.contains(s)
    def startswith(s: String): Column = c.startsWith(s)
    def endswith(s: String): Column = c.endsWith(s)
    def replace(from: String, to: String): Column = F.regexp_replace(c, from, to)
    def findall(re: String): Column = F.regexp_extract_all(c, F.lit(re), F.lit(0))
    def extract(re: String): Column = F.regexp_extract(c, re, 1)
    def split(sep: String): Column = F.split(c, sep)
    def get(i: Int): Column = Fns.Str.get(c, i)
    def slice(start: Int, stop: Int): Column = Fns.Str.slice(c, start, stop)
    def zfill(w: Int): Column = Fns.Str.zfill(c, w)
    def pad(w: Int, side: String = "left", fill: String = " "): Column =
      Fns.Str.pad(c, w, side, fill)
    def count(sub: String): Column = Fns.Str.strCount(c, sub)
    def find(sub: String): Column = Fns.Str.find(c, sub)
    def rfind(sub: String): Column = Fns.Str.rfind(c, sub)
    def ljust(w: Int, fill: String = " "): Column = Fns.Str.ljust(c, w, fill)
    def rjust(w: Int, fill: String = " "): Column = Fns.Str.rjust(c, w, fill)
    def isalpha(): Column = Fns.Str.isAlpha(c)
    def isdigit(): Column = Fns.Str.isDigit(c)
    def isdecimal(): Column = Fns.Str.isDecimal(c)
    def isnumeric(): Column = Fns.Str.isNumeric(c)
    def isalnum(): Column = Fns.Str.isAlnum(c)
    def isspace(): Column = Fns.Str.isSpace(c)
    def isupper(): Column = Fns.Str.isUpper(c)
    def islower(): Column = Fns.Str.isLower(c)
    def istitle(): Column = Fns.Str.isTitle(c)
    def cat(other: Column, sep: String = ""): Column = F.concat_ws(sep, c, other)
    def swapcase(): Column = Fns.Str.swapcase(c)
    def center(w: Int, fill: String = " "): Column = Fns.Str.center(c, w, fill)
    def wrap(w: Int): Column = Fns.Str.wrap(c, w)
    def rsplit(sep: String, n: Int = -1): Column = Fns.Str.rsplit(c, sep, n)
    def sliceReplace(start: Int, stop: Int, repl: String): Column =
      Fns.Str.sliceReplace(c, start, stop, repl)
    def translate(from: String, to: String): Column =
      Fns.Str.translate(c, from, to)
  }

  /** Datetime accessor (`_.x.dt.*`, generics.py:187-236). */
  final class DtAccessor(private val c: Column) {
    def year(): Column = F.year(c)
    def month(): Column = F.month(c)
    def day(): Column = F.dayofmonth(c)
    def hour(): Column = F.hour(c)
    def minute(): Column = F.minute(c)
    def second(): Column = F.second(c)
    def quarter(): Column = F.quarter(c)
    def week(): Column = F.weekofyear(c)
    def weekofyear(): Column = F.weekofyear(c)
    def dayofweek(): Column = Fns.Dt.dayofweekMon0(c) // Monday=0, like pandas
    def dayofyear(): Column = F.dayofyear(c)
    def date(): Column = F.to_date(c)
    def normalize(): Column = F.date_trunc("day", c)
    def daysInMonth(): Column = Fns.Dt.daysInMonth(c)
    def isMonthStart(): Column = Fns.Dt.isMonthStart(c)
    def isMonthEnd(): Column = Fns.Dt.isMonthEnd(c)
    def isQuarterStart(): Column = Fns.Dt.isQuarterStart(c)
    def isQuarterEnd(): Column = Fns.Dt.isQuarterEnd(c)
    def isYearStart(): Column = Fns.Dt.isYearStart(c)
    def isYearEnd(): Column = Fns.Dt.isYearEnd(c)
    def monthName(): Column = Fns.Dt.monthName(c)
    def dayName(): Column = Fns.Dt.dayName(c)
    def strftime(fmt: String): Column = F.date_format(c, fmt)
    def floor(unit: String): Column = Fns.Dt.floorDate(c, unit)
    def ceil(unit: String): Column = Fns.Dt.ceilDate(c, unit)
    def toPeriod(freq: String): Column = Fns.Dt.toPeriod(c, freq)
    def totalSeconds(): Column = Fns.Dt.totalSeconds(c)
    def tzLocalize(tz: String): Column = Fns.Dt.tzLocalize(c, tz)
    def tzConvert(tz: String): Column = Fns.Dt.tzConvert(c, tz)
  }

  implicit final class ColOps(private val c: Column) {
    // ---- aggregate kind (plain agg in summarize; windowed in mutate) ----
    def mean(): Column = F.avg(c)
    def sum(): Column = F.sum(c)
    def min(): Column = F.min(c)
    def max(): Column = F.max(c)
    def count(): Column = F.count(c)
    def size(): Column = F.count(F.lit(1))
    def nunique(): Column = F.count_distinct(c)
    def nuniqueApprox(rsd: Double = 0.05): Column = Fns.Agg.nDistinctApprox(c, rsd)
    def median(): Column = F.median(c)
    def mode(): Column = F.mode(c) // most frequent value (pandas kind=None in ref)
    def quantile(q: Double): Column = F.percentile(c, F.lit(q))
    def quantileApprox(q: Double): Column = Fns.Agg.percentileApprox(c, q)
    def heavyHitters(k: Int): Column = Fns.Agg.heavyHitters(c, k)
    def std(): Column = F.stddev_samp(c)
    def variance(): Column = F.var_samp(c)
    def sem(): Column = Fns.Agg.sem(c)
    def skew(): Column = Fns.Agg.skewCorrected(c)
    def kurt(): Column = Fns.Agg.kurtCorrected(c)
    def prod(): Column = F.product(c)
    def all(): Column = F.bool_and(c)
    def any(): Column = F.bool_or(c)
    def corr(other: Column): Column = F.corr(c, other)
    def cov(other: Column): Column = F.covar_samp(c, other)
    def dot(other: Column): Column = Fns.Agg.dot(c, other)
    def idxmax(idx: Column): Column = F.max_by(idx, c)
    def idxmin(idx: Column): Column = F.min_by(idx, c)

    // ---- elementwise kind ----
    def abs(): Column = F.abs(c)
    def round(n: Int): Column = F.round(c, n)
    def floor(): Column = F.floor(c)
    def ceil(): Column = F.ceil(c)
    def sqrt(): Column = F.sqrt(c)
    def exp(): Column = F.exp(c)
    def log(): Column = F.log(c)
    def pow(p: Double): Column = F.pow(c, p)
    def fillna(v: Any): Column = F.coalesce(c, F.lit(v))
    def isna(): Column = c.isNull
    def notna(): Column = c.isNotNull
    def astype(t: String): Column = Fns.asType(c, t)
    def clip(lo: Double, hi: Double): Column = Fns.clip(c, F.lit(lo), F.lit(hi))
    def floordiv(b: Column): Column = Fns.floorDiv(c, b)
    def where(cond: Column, other: Column = F.lit(null)): Column =
      Fns.where(c, cond, other)
    def mask(cond: Column, other: Column = F.lit(null)): Column =
      Fns.mask(c, cond, other)
    def isin(vs: Any*): Column = c.isin(vs: _*)
    def near(other: Column): Column = Fns.near(c, other)

    // ---- window kind (GExpr: needs the verb's partition/order state) ----
    def cumsum(): GExpr = Vec.cumsum(c)
    def cummax(): GExpr = Vec.cummax(c)
    def cummin(): GExpr = Vec.cummin(c)
    def cumprod(): GExpr = Vec.cumprod(c)
    def cummean(): GExpr = Vec.cummean(c)
    def diff(n: Int = 1): GExpr = Vec.diff(c, n)
    def pctChange(): GExpr = Vec.pctChange(c)
    def shift(n: Int = 1): GExpr = if (n >= 0) Vec.lag(c, n) else Vec.lead(c, -n)
    def rank(): GExpr = Vec.avgRank(c) // pandas default method="average"
    def ffill(): GExpr = Vec.ffill(c)
    def bfill(): GExpr = Vec.bfill(c)
    def autocorr(lag: Int = 1): GExpr = Vec.autocorr(c, lag)
    def isMonotonic(): GExpr = Vec.isMonotonic(c)
    def isMonotonicIncreasing(): GExpr = Vec.isMonotonicIncreasing(c)
    def isMonotonicDecreasing(): GExpr = Vec.isMonotonicDecreasing(c)
    def duplicated(): GExpr = Vec.duplicated(c)

    // ---- accessors ----
    def str: StrAccessor = new StrAccessor(c)
    def dt: DtAccessor = new DtAccessor(c)
  }
}
