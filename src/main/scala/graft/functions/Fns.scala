package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar / conditional / aggregate function surface (the reference's ops
  * registry, siuba/ops/generics.py, and siuba/dply/vector.py helpers), mapped
  * to codegen'd `org.apache.spark.sql.functions` — no UDFs anywhere.
  */
object Fns {

  // ---- conditionals (siuba/dply/verbs.py:1034-1179) -----------------------

  /** Vectorized ternary; an NA condition takes the FALSE branch, matching the
    * reference's deliberate deviation (siuba/dply/verbs.py:1085).
    */
  def ifElse(cond: Column, t: Column, f: Column): Column =
    when(coalesce(cond, lit(false)), t).otherwise(f)

  /** Multi-branch conditional, first match wins (dict order in the
    * reference). Pass `default` for the `True:` arm.
    */
  def caseWhen(branches: Seq[(Column, Column)], default: Column = lit(null)): Column =
    branches.tail
      .foldLeft(when(branches.head._1, branches.head._2)) { case (acc, (c, v)) =>
        acc.when(c, v)
      }
      .otherwise(default)

  /** Inclusive range test (vector.py:241-259). */
  def between(x: Column, lo: Column, hi: Column): Column = x.between(lo, hi)

  /** dplyr `near`: float equality within `tol` (default sqrt of double
    * epsilon, dplyr's default). Declared-but-NotImplemented in the reference
    * (vector.py `near`); trivially supported here.
    */
  def near(x: Column, y: Column,
           tol: Double = math.sqrt(2.220446049250313e-16)): Column =
    abs(x - y) < lit(tol)

  /** Values equal to any of `ys` become NULL (vector.py:424-440 / NULLIF). */
  def naIf(x: Column, ys: Any*): Column =
    when(x.isin(ys: _*), lit(null)).otherwise(x)

  // coalesce: use org.apache.spark.sql.functions.coalesce directly.

  /** pandas `Series.where(cond, other)` (generics.py:396): keep x where cond
    * holds, else `other` (default NULL — pandas' NaN). NULL conds take
    * `other`, matching pandas' NaN-is-not-True.
    */
  def where(x: Column, cond: Column, other: Column = lit(null)): Column =
    when(coalesce(cond, lit(false)), x).otherwise(other)

  /** pandas `Series.mask(cond, other)` (generics.py:384): the complement —
    * replace x where cond holds. */
  def mask(x: Column, cond: Column, other: Column = lit(null)): Column =
    when(coalesce(cond, lit(false)), other).otherwise(x)

  // ---- aggregates (registry, siuba/ops/generics.py:79-100) ----------------

  object Agg {
    def n(): Column                 = count(lit(1))
    def nDistinct(c: Column): Column = count_distinct(c)
    /** Weighted mean sum(x*w)/sum(w) — the mixture-stat aggregate (rows with
      * NULL x or w contribute to neither sum, pandas' pairwise drop). */
    def weightedMean(x: Column, w: Column): Column = {
      val both = x.isNotNull && w.isNotNull
      sum(when(both, x * w)) / sum(when(both, w))
    }
    /** HyperLogLog++ distinct estimate (SURVEY §2.5 opt-in extension): at
      * 100 TB an exact count-distinct shuffles every distinct value; the
      * sketch is a fixed-size buffer per group, map-side combinable.
      */
    def nDistinctApprox(c: Column, rsd: Double = 0.05): Column =
      approx_count_distinct(c, rsd)
    /** Exact median via the native sort-based `median` aggregate. */
    def median(c: Column): Column   = org.apache.spark.sql.functions.median(c)
    /** Exact quantile (sort-based `percentile`); use `percentileApprox` at
      * extreme scale where an exact sort per group is not worth it.
      */
    def quantile(c: Column, q: Double): Column = percentile(c, lit(q))
    def percentileApprox(c: Column, q: Double): Column =
      percentile_approx(c, lit(q), lit(10000))
    /** Standard error of the mean. */
    def sem(c: Column): Column = stddev_samp(c) / sqrt(count(c))
    def idxMax(idx: Column, c: Column): Column = max_by(idx, c)
    def idxMin(idx: Column, c: Column): Column = min_by(idx, c)
    def all(c: Column): Column = bool_and(c)
    def any(c: Column): Column = bool_or(c)
    def dot(a: Column, b: Column): Column = sum(a * b)

    /** Approximate top-k frequencies (Misra-Gries mergeable summary,
      * graft.plans.HeavyHittersAgg): array<struct<item, est_count>> sorted
      * by est_count desc. Map-side combinable — each partition shuffles at
      * most k counters instead of every distinct key. Exact when the column
      * has ≤ k distinct values; otherwise any item with true frequency
      * > n/(k+1) is guaranteed present, est within n/(k+1) of truth.
      */
    def heavyHitters(c: Column, k: Int): Column =
      org.apache.spark.sql.graftshim.Shim.columnOf(
        graft.plans.HeavyHittersAgg(
          org.apache.spark.sql.graftshim.Shim.exprOf(c), k)
          .toAggregateExpression())

    /** Weighted heavy hitters: top items by sum of a positive integral
      * weight (tokens, bytes) instead of row count — same MG summary, same
      * W/(k+1) bound with W the total weight.
      */
    def heavyHittersWeighted(c: Column, w: Column, k: Int): Column =
      org.apache.spark.sql.graftshim.Shim.columnOf(
        graft.plans.HeavyHittersAgg(
          org.apache.spark.sql.graftshim.Shim.exprOf(c),
          org.apache.spark.sql.graftshim.Shim.exprOf(w.cast("long")), k)
          .toAggregateExpression())

    /** Bias-corrected sample skewness G1 (pandas `skew`). Spark's `skewness`
      * is the population g1 = m3/m2^1.5; G1 = g1 * sqrt(n(n-1)) / (n-2).
      */
    def skewCorrected(c: Column): Column = {
      val n = count(c).cast("double")
      skewness(c) * sqrt(n * (n - 1)) / (n - 2)
    }

    /** Bias-corrected sample excess kurtosis G2 (pandas `kurt`). Spark's
      * `kurtosis` is the population excess g2;
      * G2 = (n-1)/((n-2)(n-3)) * ((n+1) g2 + 6).
      */
    def kurtCorrected(c: Column): Column = {
      val n = count(c).cast("double")
      (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * kurtosis(c) + 6)
    }
  }

  // ---- strings (generics.py:127-182; SQL base.py:266-306) -----------------

  object Str {
    /** pandas str.capitalize lowercases the tail — `initcap` does not
      * (SURVEY §7.3): build it from substring ops.
      */
    def capitalize(c: Column): Column =
      concat(upper(substring(c, 1, 1)), lower(c.substr(lit(2), length(c))))
    def strC(sep: String, cs: Column*): Column = concat_ws(sep, cs: _*)
    def len(c: Column): Column = length(c)
    /** Non-overlapping occurrence count of a literal substring (str.count). */
    def strCount(c: Column, sub: String): Column =
      ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(sub), "")))
        / sub.length).cast("long")
    /** 0-based index of first occurrence, -1 if absent (str.find). */
    def find(c: Column, sub: String): Column = (instr(c, sub) - 1).cast("long")
    /** 0-based index of the LAST occurrence, -1 if absent (str.rfind):
      * locate the reversed needle in the reversed haystack and convert
      * back — one scan, no loop.
      */
    def rfind(c: Column, sub: String): Column = {
      val posRev = instr(reverse(c), sub.reverse)
      when(posRev === 0, lit(-1L))
        .otherwise((length(c) - posRev - lit(sub.length) + 1).cast("long"))
    }
    /** Left-pad with zeros (str.zfill). Python zfill never truncates, Spark
      * lpad does — guard values already at or over the width.
      */
    def zfill(c: Column, width: Int): Column =
      when(length(c) >= width, c).otherwise(lpad(c, width, "0"))
    /** Character at position i, 0-based (str.get). */
    def get(c: Column, i: Int): Column = substring(c, i + 1, 1)
    /** str.slice(start, stop), 0-based half-open like Python. */
    def slice(c: Column, start: Int, stop: Int): Column =
      substring(c, start + 1, math.max(stop - start, 0))
    /** str.slice_replace: replace [start, stop) with `repl`. */
    def sliceReplace(c: Column, start: Int, stop: Int, repl: String): Column =
      concat(substring(c, 1, start), lit(repl),
        c.substr(lit(stop + 1), length(c)))
    def repeat(c: Column, n: Int): Column =
      org.apache.spark.sql.functions.repeat(c, n)
    /** `str.translate` with aligned from/to character strings (the
      * reference declares it unsupported, generics.py:180). Characters in
      * `from` beyond `to`'s length are DELETED — the same convention as
      * `str.maketrans(a, b, deletechars)` collapsed into two arguments.
      */
    def translate(c: Column, from: String, to: String): Column =
      org.apache.spark.sql.functions.translate(c, from, to)
    /** Per-character case flip (str.swapcase). */
    def swapcase(c: Column): Column =
      array_join(transform(split(c, ""), ch =>
        when(ch =!= lower(ch), lower(ch)).otherwise(upper(ch))), "")
    /** str.center: pad both sides to `width`, extra char right (Python). */
    def center(c: Column, width: Int, fill: String = " "): Column =
      pad(c, width, "both", fill)
    /** Greedy whitespace word-wrap into `width`-char lines joined by \n
      * (str.wrap with textwrap defaults except break_long_words: words
      * longer than `width` are left unbroken).
      */
    def wrap(c: Column, width: Int): Column =
      rtrim(regexp_replace(c, s"(.{1,$width})(\\s+|$$)", "$1\n"), "\n")
    /** Split from the right, at most `n` splits (str.rsplit); n < 0 = all. */
    def rsplit(c: Column, sep: String, n: Int = -1): Column = {
      val q = java.util.regex.Pattern.quote(sep)
      if (n < 0) split(c, q)
      else reverse(transform(
        split(reverse(c), java.util.regex.Pattern.quote(sep.reverse), n + 1),
        s => reverse(s)))
    }
    def isAlpha(c: Column): Column   = c.rlike("^[A-Za-z]+$")
    def isDigit(c: Column): Column   = c.rlike("^[0-9]+$")
    /** str.isdecimal: ASCII decimal digits only (no superscripts/fractions). */
    def isDecimal(c: Column): Column = c.rlike("^[0-9]+$")
    /** str.isnumeric: any unicode numeric character (category N) — wider
      * than isdigit (roman numerals, fractions, CJK numerals).
      */
    def isNumeric(c: Column): Column = c.rlike("^\\p{N}+$")
    def isAlnum(c: Column): Column   = c.rlike("^[A-Za-z0-9]+$")
    def isSpace(c: Column): Column   = c.rlike("^\\s+$")
    def isUpper(c: Column): Column   = (c === upper(c)) && c.rlike("[A-Za-z]")
    def isLower(c: Column): Column   = (c === lower(c)) && c.rlike("[A-Za-z]")
    def isTitle(c: Column): Column   = c === initcap(c) && c.rlike("[A-Za-z]")
    def title(c: Column): Column     = initcap(c)
    /** str.pad: pandas/Python padding never truncates values already at or
      * over the width (Spark's lpad/rpad do) — hence the length guard.
      */
    def pad(c: Column, width: Int, side: String = "left", fill: String = " "): Column = {
      val padded = side match {
        case "left"  => lpad(c, width, fill)
        case "right" => rpad(c, width, fill)
        case "both"  =>
          val extra = greatest(lit(width) - length(c), lit(0))
          val lpadLen = (length(c) + floor(extra / 2)).cast("int")
          rpad(lpad(c, lpadLen, lit(fill)), lit(width), lit(fill))
      }
      when(length(c) >= width, c).otherwise(padded)
    }
    /** str.ljust / str.rjust (non-truncating, like [[pad]]). */
    def ljust(c: Column, width: Int, fill: String = " "): Column =
      pad(c, width, "right", fill)
    def rjust(c: Column, width: Int, fill: String = " "): Column =
      pad(c, width, "left", fill)
  }

  // ---- datetime (generics.py:187-236; SQL base.py:312-360) ----------------

  object Dt {
    /** Canonical integral time axis: TIMESTAMP/NTZ/DATE → nanos-since-epoch
      * long; integral columns pass through in the caller's own units (see
      * [[graft.plans.TimeToNanos]]). The event-time operators (sessionId,
      * range-frame rollings, range/interval joins) route their time columns
      * through this, so they accept either representation.
      */
    def toNanos(c: Column): Column =
      org.apache.spark.sql.graftshim.Shim.columnOf(
        graft.plans.TimeToNanos(org.apache.spark.sql.graftshim.Shim.exprOf(c)))

    /** Monday=0 like pandas `dt.dayofweek` — Spark's dayofweek is
      * 1=Sunday..7=Saturday, so shift: (dow + 5) % 7.
      */
    def dayofweekMon0(c: Column): Column = (dayofweek(c) + 5) % 7
    def isMonthStart(c: Column): Column = dayofmonth(c) === 1
    def isMonthEnd(c: Column): Column   = to_date(c) === last_day(c)
    def isQuarterStart(c: Column): Column =
      dayofmonth(c) === 1 && month(c).isin(1, 4, 7, 10)
    def isQuarterEnd(c: Column): Column =
      to_date(c) === last_day(c) && month(c).isin(3, 6, 9, 12)
    def isYearStart(c: Column): Column = dayofyear(c) === 1
    def isYearEnd(c: Column): Column   = month(c) === 12 && dayofmonth(c) === 31
    def daysInMonth(c: Column): Column = dayofmonth(last_day(c))
    def monthName(c: Column): Column   = date_format(c, "MMMM")
    def dayName(c: Column): Column     = date_format(c, "EEEE")
    /** pandas `dt.to_period(freq).astype(str)` (generics.py:218): the
      * date_trunc-based string period label. W renders the Mon..Sun span
      * like pandas' weekly periods.
      */
    def toPeriod(c: Column, freq: String): Column = freq.toUpperCase match {
      case "Y" | "A"   => date_format(c, "yyyy")
      case "Q"         => concat(date_format(c, "yyyy"), lit("Q"), quarter(c).cast("string"))
      case "M"         => date_format(c, "yyyy-MM")
      case "W"         =>
        val start = date_trunc("week", c)
        concat(date_format(start, "yyyy-MM-dd"), lit("/"),
               date_format(date_add(start, 6), "yyyy-MM-dd"))
      case "D"         => date_format(c, "yyyy-MM-dd")
      case "H"         => date_format(c, "yyyy-MM-dd HH:00")
      case "T" | "MIN" => date_format(c, "yyyy-MM-dd HH:mm")
      case "S"         => date_format(c, "yyyy-MM-dd HH:mm:ss")
      case other => throw graft.GraftError(
        s"to_period: unsupported freq '$other' (Y/A, Q, M, W, D, H, T/min, S)")
    }

    /** pandas `dt.total_seconds` on a day-time interval (e.g. a timestamp
      * difference): cast to the single-unit SECOND interval (total span),
      * then through decimal to keep the fractional microseconds, then
      * double — `(ts_a - ts_b).dt.totalSeconds()` matches pandas to 1e-6.
      */
    def totalSeconds(c: Column): Column =
      c.cast("interval second").cast("decimal(28,6)").cast("double")

    /** pandas `dt.tz_localize(tz)` (generics.py:224): interpret naive
      * wall-clock values as `tz` local time → the corresponding instant.
      * Spark timestamps are zoneless instants rendered in the session zone,
      * so this is exactly `to_utc_timestamp`.
      */
    def tzLocalize(c: Column, tz: String): Column = to_utc_timestamp(c, tz)

    /** pandas `dt.tz_convert(tz)` (generics.py:223): render instants as
      * `tz` wall-clock (`from_utc_timestamp`). Round-trips with
      * [[tzLocalize]] for any zone without DST gaps at the value.
      */
    def tzConvert(c: Column, tz: String): Column = from_utc_timestamp(c, tz)

    /** floor_date/ceil_date verbs (siuba/experimental/datetime.py:124-190). */
    def floorDate(c: Column, unit: String): Column = date_trunc(unit, c)
    def ceilDate(c: Column, unit: String): Column = {
      val floored = date_trunc(unit, c)
      val bumped = unit.toLowerCase match {
        case "year" | "yyyy" | "yy"  => add_months(floored, 12)
        case "quarter"               => add_months(floored, 3)
        case "month" | "mon" | "mm"  => add_months(floored, 1)
        case "week"                  => date_add(floored, 7)
        case "day" | "dd"            => date_add(floored, 1)
        case "hour"                  => floored + expr("INTERVAL 1 HOUR")
        case "minute"                => floored + expr("INTERVAL 1 MINUTE")
        case "second"                => floored + expr("INTERVAL 1 SECOND")
      }
      when(c === floored, c).otherwise(bumped)
    }
  }

  // ---- missing data / conversion ------------------------------------------

  /** `pd.cut`-style binning (extension: the reference defers to pandas).
    * Right-closed bins (lo, hi] by default (`right=false` gives [lo, hi));
    * values outside the break range map to NULL; `includeLowest` closes the
    * first bin's lower edge. `labels` must have `breaks.size - 1` entries;
    * defaults to pandas-style "(lo, hi]" strings built from the literal
    * break spellings (so the label text is deterministic — no float
    * formatting involved). A chain of when() comparisons: codegen'd,
    * map-only, no shuffle.
    */
  def cut(x: Column, breaks: Seq[Double], labels: Seq[String] = null,
          right: Boolean = true, includeLowest: Boolean = false): Column = {
    require(breaks.size >= 2, "need at least 2 breaks")
    require(breaks == breaks.sorted, "breaks must be increasing")
    val labs: Seq[String] =
      if (labels != null) {
        require(labels.size == breaks.size - 1, "labels must match bin count")
        labels
      } else breaks.sliding(2).map { case Seq(lo, hi) =>
        if (right) s"($lo, $hi]" else s"[$lo, $hi)"
      }.toSeq
    val nBins = breaks.size - 1
    val bins = (0 until nBins).map { i =>
      val (lo, hi) = (breaks(i), breaks(i + 1))
      val lower =
        if (right) { if (i == 0 && includeLowest) x >= lo else x > lo }
        else x >= lo
      val upper =
        if (right) x <= hi
        else { if (i == nBins - 1 && includeLowest) x <= hi else x < hi }
      (lower && upper, labs(i))
    }
    bins.foldLeft(lit(null).cast("string")) { case (acc, (cond, lab)) =>
      when(cond, lab).otherwise(acc)
    }
  }

  /** `pd.qcut`-style quantile binning (extension): breaks are the EXACT
    * linear-interpolation percentiles of `x` in `df` (one bounded aggregate
    * — q+1 doubles to the driver, the same discovery pattern as forcats
    * level scans), then binning follows [[cut]] with right-closed bins and
    * the lowest edge included — so equal values always share a bin (unlike
    * ntile, which splits ties across bins to force equal counts).
    */
  def qcut(df: org.apache.spark.sql.DataFrame, x: Column, q: Int,
           labels: Seq[String] = null): Column = {
    require(q >= 2, "q must be >= 2")
    val ps = (0 to q).map(_.toDouble / q)
    val row = df.agg(percentile(x, lit(ps.toArray)).as("p")).head()
    val breaks = row.getSeq[Double](0)
    require(breaks.distinct.size == breaks.size,
      s"duplicate quantile edges $breaks — reduce q or pre-dedupe x")
    cut(x, breaks, labels, right = true, includeLowest = true)
  }

  def fillNa(c: Column, v: Column): Column = coalesce(c, v)
  def isNa(c: Column): Column  = c.isNull
  def notNa(c: Column): Column = c.isNotNull

  /** `astype` — reference supports exactly {str,int,float,bool}
    * (siuba/sql/dialects/base.py:160-175).
    */
  def asType(c: Column, t: String): Column = t match {
    case "str"   => c.cast("string")
    case "int"   => c.cast("long")
    case "float" => c.cast("double")
    case "bool"  => c.cast("boolean")
    case other   => c.cast(other)
  }

  /** Floor division: pandas `//` truncates toward -inf and the reference
    * casts to integer (siuba/sql/dialects/base.py:69-73).
    */
  def floorDiv(a: Column, b: Column): Column = floor(a / b).cast("long")

  /** Bound values into [lo, hi] (pandas clip, generics.py:73-122). */
  def clip(c: Column, lo: Column, hi: Column): Column =
    least(greatest(c, lo), hi)
}
