package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GExpr, WinCtx}

/** Window / vector functions (the reference's siuba/dply/vector.py family).
  * Each returns a GExpr that closes over the verb-time window context:
  * partition = group keys, default ordering = arrange state
  * (siuba/sql/backend.py:91-149). All are plain Spark window expressions —
  * whole-stage-codegen friendly, shuffle only on the partition keys.
  */
object Vec {

  private def gx(f: WinCtx => Column): GExpr = new GExpr {
    def toCol(ctx: WinCtx): Column = f(ctx)
  }

  /** 1-based position per group (vector.py:183-227). */
  def rowNumber(order: Column*): GExpr = gx(c => row_number().over(c.orderedBy(order)))

  /** rank method="min"; NA stays NA via the reference's partition-on-NOT-NULL
    * trick (siuba/sql/dply/vector.py:53-97).
    */
  def minRank(x: Column, desc: Boolean = false): GExpr = gx { c =>
    val w = Window.partitionBy(c.partition :+ x.isNull: _*)
      .orderBy(if (desc) x.desc else x.asc)
    when(x.isNotNull, rank().over(w))
  }

  def denseRank(x: Column, desc: Boolean = false): GExpr = gx { c =>
    val w = Window.partitionBy(c.partition :+ x.isNull: _*)
      .orderBy(if (desc) x.desc else x.asc)
    when(x.isNotNull, dense_rank().over(w))
  }

  /** (min_rank - 1) / (n - 1) over non-null values (vector.py:130-155). */
  def percentRank(x: Column): GExpr = gx { c =>
    val w = Window.partitionBy(c.partition :+ x.isNull: _*).orderBy(x)
    when(x.isNotNull, percent_rank().over(w))
  }

  /** Proportion of rows <= current (vector.py:171-177). */
  def cumeDist(x: Column): GExpr = gx { c =>
    val w = Window.partitionBy(c.partition :+ x.isNull: _*).orderBy(x)
    when(x.isNotNull, cume_dist().over(w))
  }

  /** pandas method="average" tie rank, emulated as
    * rank + (count(dups)-1)/2 like the reference's SQL translation
    * (siuba/sql/dialects/base.py:75-80).
    */
  def avgRank(x: Column): GExpr = gx { c =>
    val wOrd = Window.partitionBy(c.partition :+ x.isNull: _*).orderBy(x)
    val wDup = Window.partitionBy(c.partition :+ x: _*)
    when(x.isNotNull, rank().over(wOrd) + (count(x).over(wDup) - 1) / 2.0)
  }

  /** Declared-but-NotImplemented in the reference (vector.py:233-235);
    * trivially supported on Spark.
    */
  def ntile(n: Int, order: Column*): GExpr =
    gx(c => org.apache.spark.sql.functions.ntile(n).over(c.orderedBy(order)))

  def lead(x: Column, n: Int = 1, default: Any = null, order: Seq[Column] = Nil): GExpr =
    gx(c => org.apache.spark.sql.functions.lead(x, n, default).over(c.orderedBy(order)))

  def lag(x: Column, n: Int = 1, default: Any = null, order: Seq[Column] = Nil): GExpr =
    gx(c => org.apache.spark.sql.functions.lag(x, n, default).over(c.orderedBy(order)))

  /** x - lag(x, periods) (siuba/sql/dialects/base.py:61-67). */
  def diff(x: Column, periods: Int = 1, order: Seq[Column] = Nil): GExpr = gx { c =>
    if (periods >= 0) x - org.apache.spark.sql.functions.lag(x, periods).over(c.orderedBy(order))
    else x - org.apache.spark.sql.functions.lead(x, -periods).over(c.orderedBy(order))
  }

  /** x / lag(x) - 1 (ops registry pct_change). */
  def pctChange(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => x / org.apache.spark.sql.functions.lag(x, 1).over(c.orderedBy(order)) - 1)

  // -- cumulative ops: frame ROWS UNBOUNDED PRECEDING..CURRENT ROW ----------

  def cumsum(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => sum(x).over(c.cumulBy(order)))
  def cummax(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => max(x).over(c.cumulBy(order)))
  def cummin(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => min(x).over(c.cumulBy(order)))
  def cummean(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => avg(x).over(c.cumulBy(order)))
  /** Running product via the native `product` aggregate (handles zeros and
    * negatives, unlike the exp-log-sum trick).
    */
  def cumprod(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => product(x).over(c.cumulBy(order)))
  def cumall(cond: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => min(cond).over(c.cumulBy(order)))
  def cumany(cond: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => max(cond).over(c.cumulBy(order)))

  /** n-th value per group, 0-based like the reference; negative n counts from
    * the end (vector.py:454-522). Whole-partition frame.
    */
  def nth(x: Column, n: Int, order: Seq[Column] = Nil): GExpr = gx { c =>
    if (n >= 0) nth_value(x, n + 1).over(c.fullBy(order))
    else if (n == -1) last(x).over(c.fullBy(order))
    else {
      // n-th from the end = nth_value over the mirrored ordering — a plain
      // window expression, not a per-row collect_list materialization.
      // Groups smaller than |n| yield NULL (pandas), which nth_value's
      // whole-partition frame already gives.
      val eff = if (order.nonEmpty) order else c.order
      val rev = eff.map(org.apache.spark.sql.graftshim.Shim.reverseSort)
      nth_value(x, -n).over(c.fullBy(rev))
    }
  }

  def firstVal(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => first(x).over(c.fullBy(order)))
  def lastVal(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => last(x).over(c.fullBy(order)))

  /** Forward-fill / backward-fill over the ordering (registry bfill/ffill). */
  def ffill(x: Column, order: Seq[Column] = Nil): GExpr = gx { c =>
    last(x, ignoreNulls = true)
      .over(c.orderedBy(order).rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }
  def bfill(x: Column, order: Seq[Column] = Nil): GExpr = gx { c =>
    first(x, ignoreNulls = true)
      .over(c.orderedBy(order).rowsBetween(Window.currentRow, Window.unboundedFollowing))
  }

  /** Group row count, usable in mutate (windowed) via GExpr. In summarize,
    * use `Agg.n`.
    */
  def n(): GExpr = gx(c => count(lit(1)).over(c.plain))

  /** pandas `Series.autocorr(lag)` as a grouped window op (registry 'window'
    * kind, siuba/ops/generics.py:102): Pearson correlation of the series
    * with its own lag over the group. Null pairs (the first `lagN` rows) are
    * excluded by `corr`, matching pandas' pairwise NaN drop. Built as a
    * window agg over a windowed lag — mutate hoists the nested lag into a
    * temp projection automatically.
    */
  def autocorr(x: Column, lagN: Int = 1, order: Seq[Column] = Nil): GExpr = gx { c =>
    val lagged = org.apache.spark.sql.functions.lag(x, lagN).over(c.orderedBy(order))
    corr(x.cast("double"), lagged.cast("double")).over(c.plain)
  }

  /** pandas `is_monotonic_increasing` per group (generics.py:109-110): true
    * iff the series never decreases in `order` order; any NULL makes the
    * group false (pandas: NaN breaks monotonicity).
    */
  def isMonotonicIncreasing(x: Column, order: Seq[Column] = Nil): GExpr = gx { c =>
    val prev = org.apache.spark.sql.functions.lag(x, 1).over(c.orderedBy(order))
    bool_and(x.isNotNull && coalesce(x >= prev, lit(true))).over(c.plain)
  }

  def isMonotonicDecreasing(x: Column, order: Seq[Column] = Nil): GExpr = gx { c =>
    val prev = org.apache.spark.sql.functions.lag(x, 1).over(c.orderedBy(order))
    bool_and(x.isNotNull && coalesce(x <= prev, lit(true))).over(c.plain)
  }

  /** Gap-based session ids per group (batch sessionization — the batch twin
    * of streaming `session_window`): a new session starts when the time
    * column advances by MORE than `gap` (same units as `t`) since the
    * previous row in `order` order; ids are 1-based per group. One lag plus
    * one running sum over the group's ordering — the inner lag window is
    * hoisted by mutate's nested-window rewrite, exactly like autocorr's.
    * The first row of each group (lag NULL) opens session 1.
    */
  def sessionId(t: Column, gap: Long, order: Seq[Column] = Nil): GExpr = gx { c =>
    // type-adaptive: TIMESTAMP/NTZ/DATE order columns canonicalize to
    // nanos-long (gap is then in nanos); integral columns keep their units
    val tn = Fns.Dt.toNanos(t)
    val ord = if (order.nonEmpty) order else Seq(tn)
    val prev = org.apache.spark.sql.functions.lag(tn, 1).over(c.orderedBy(ord))
    val newSession = when(tn - prev > gap, 1L).otherwise(0L)
    sum(newSession).over(c.orderedBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)) + 1
  }

  /** `is_monotonic` is pandas' deprecated alias for increasing. */
  def isMonotonic(x: Column, order: Seq[Column] = Nil): GExpr =
    isMonotonicIncreasing(x, order)

  /** pandas `duplicated(keep='first')` per group (generics.py:369): true for
    * every occurrence of `x` after the first, in `order` order within the
    * group. One window partitioned by (groups, x) — same shuffle class as
    * the other window verbs.
    */
  def duplicated(x: Column, order: Seq[Column] = Nil): GExpr = gx { c =>
    val o = if (order.nonEmpty) order else c.order
    if (o.isEmpty)
      throw graft.GraftError(
        "duplicated needs an ordering: call arrange(...) first or pass order columns")
    row_number().over(Window.partitionBy(c.partition :+ x: _*).orderBy(o: _*)) > 1
  }

  // -- rolling windows (extension; reference declares rolling unsupported,
  //    siuba/ops/generics.py:241-255) — trailing n-row frames -------------

  private def rollingFrame(c: WinCtx, order: Seq[Column], nRows: Int) =
    c.orderedBy(order).rowsBetween(-(nRows - 1), Window.currentRow)

  // -- value-range rolling frames (trailing `span` in the ORDER column's own
  //    units — e.g. trailing 60s on an epoch-ns timestamp): RANGE BETWEEN
  //    -span AND CURRENT ROW. Equal order values are frame peers under RANGE
  //    semantics on every engine, so results stay deterministic with ties —
  //    the event-time rolling aggregate ROWS frames can't express.
  //    TIMESTAMP/NTZ/DATE order columns canonicalize to nanos-long (span is
  //    then in nanos); integral columns keep their own units.
  private def rangeFrame(c: WinCtx, order: Column, span: Long) =
    Window.partitionBy(c.partition: _*).orderBy(Fns.Dt.toNanos(order))
      .rangeBetween(-span, Window.currentRow)

  def rollingSumRange(x: Column, order: Column, span: Long): GExpr =
    gx(c => sum(x).over(rangeFrame(c, order, span)))
  def rollingMeanRange(x: Column, order: Column, span: Long): GExpr =
    gx(c => avg(x).over(rangeFrame(c, order, span)))
  def rollingCountRange(order: Column, span: Long): GExpr =
    gx(c => count(lit(1)).over(rangeFrame(c, order, span)))

  def rollingSum(x: Column, nRows: Int, order: Seq[Column] = Nil): GExpr =
    gx(c => sum(x).over(rollingFrame(c, order, nRows)))
  def rollingMean(x: Column, nRows: Int, order: Seq[Column] = Nil): GExpr =
    gx(c => avg(x).over(rollingFrame(c, order, nRows)))
  def rollingMax(x: Column, nRows: Int, order: Seq[Column] = Nil): GExpr =
    gx(c => max(x).over(rollingFrame(c, order, nRows)))
  def rollingMin(x: Column, nRows: Int, order: Seq[Column] = Nil): GExpr =
    gx(c => min(x).over(rollingFrame(c, order, nRows)))
  def rollingStd(x: Column, nRows: Int, order: Seq[Column] = Nil): GExpr =
    gx(c => stddev_samp(x).over(rollingFrame(c, order, nRows)))
  def rollingVar(x: Column, nRows: Int, order: Seq[Column] = Nil): GExpr =
    gx(c => var_samp(x).over(rollingFrame(c, order, nRows)))

  // -- expanding windows (pandas `expanding()`, also declared unsupported
  //    in the reference) — running UNBOUNDED PRECEDING .. CURRENT ROW
  //    frames; sum/mean are the existing cumsum/cummean ----------------------

  private def expandingFrame(c: WinCtx, order: Seq[Column]) =
    c.orderedBy(order).rowsBetween(Window.unboundedPreceding, Window.currentRow)

  def expandingVar(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => var_samp(x).over(expandingFrame(c, order)))
  def expandingStd(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => stddev_samp(x).over(expandingFrame(c, order)))
  def expandingMin(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => min(x).over(expandingFrame(c, order)))
  def expandingMax(x: Column, order: Seq[Column] = Nil): GExpr =
    gx(c => max(x).over(expandingFrame(c, order)))

  /** pandas `ewm(alpha).mean()` — see [[graft.plans.EwmMean]] for the
    * custom window function and its exact pandas semantics. `x` is cast to
    * double; the running recursion needs an ordering like every window verb.
    */
  def ewmMean(x: Column, alpha: Double, adjust: Boolean = false,
              order: Seq[Column] = Nil): GExpr = gx { c =>
    val o = if (order.nonEmpty) order else c.order
    if (o.isEmpty)
      throw graft.GraftError(
        "ewmMean needs an ordering: call arrange(...) first or pass order columns")
    org.apache.spark.sql.graftshim.Shim.windowOf(
      graft.plans.EwmMean(
        org.apache.spark.sql.graftshim.Shim.exprOf(x.cast("double")),
        alpha, adjust),
      c.partition, o)
  }

  /** pandas `ewm(alpha, adjust=True).var(bias)` — see [[graft.plans.EwmVar]]
    * for the decayed-sums recursion and exact semantics. */
  def ewmVar(x: Column, alpha: Double, bias: Boolean = false,
             order: Seq[Column] = Nil): GExpr = gx { c =>
    val o = if (order.nonEmpty) order else c.order
    if (o.isEmpty)
      throw graft.GraftError(
        "ewmVar needs an ordering: call arrange(...) first or pass order columns")
    org.apache.spark.sql.graftshim.Shim.windowOf(
      graft.plans.EwmVar(
        org.apache.spark.sql.graftshim.Shim.exprOf(x.cast("double")),
        alpha, bias),
      c.partition, o)
  }

  /** pandas `ewm(alpha).std(bias)` — sqrt of [[ewmVar]]. */
  def ewmStd(x: Column, alpha: Double, bias: Boolean = false,
             order: Seq[Column] = Nil): GExpr =
    ewmVar(x, alpha, bias, order).transform(sqrt)

  /** Exact rolling quantile with linear interpolation over the trailing
    * n-row frame — pandas `rolling(n).quantile(q, interpolation="linear")`.
    * Index h = (count-1)·q splits into floor element + fractional carry;
    * both engines (and the DuckDB `quantile_cont` window oracle) compute
    * lower + (upper-lower)·frac in the same order, so results are
    * deterministic — and exact whenever x is integer-scaled and q is a
    * dyadic rational. Same O(frame) per-row state as [[rollingMedian]];
    * fine for the small frames rolling verbs use.
    */
  def rollingQuantile(x: Column, q: Double, nRows: Int,
                      order: Seq[Column] = Nil): GExpr = {
    require(q >= 0 && q <= 1, "q must be in [0, 1]")
    gx { c =>
      val arr = array_sort(collect_list(x).over(rollingFrame(c, order, nRows)))
      val n = size(arr)
      val h = (n - 1).cast("double") * lit(q)
      val lo = floor(h).cast("int")
      val frac = h - floor(h)
      val lower = element_at(arr, lo + 1).cast("double")
      val upper = element_at(arr, least(lo + 2, n)).cast("double")
      when(n === 0, lit(null)).otherwise(lower + (upper - lower) * frac)
    }
  }

  /** Exact rolling median over the trailing n-row frame: sort the frame's
    * collected values, take the middle (odd count) or the mean of the two
    * middles (even count — exact when x is integer-scaled, since the mean
    * of two int64s is a half-integer). collect_list over an n-row frame is
    * O(n) state per row — fine for the small frames rolling medians use;
    * a t-digest sketch is the path for frames in the thousands.
    */
  def rollingMedian(x: Column, nRows: Int, order: Seq[Column] = Nil): GExpr =
    gx { c =>
      val arr = array_sort(collect_list(x).over(rollingFrame(c, order, nRows)))
      val n = size(arr)
      val mid = ((n + 1) / 2).cast("int") // int division: n is positive
      val half = (n / 2).cast("int")
      // cast each middle element to double BEFORE adding (as rollingQuantile
      // does): native-type addition of two near-max ints would overflow
      // before the /2.0 promotes
      when(n % 2 === 1, element_at(arr, mid).cast("double"))
        .otherwise((element_at(arr, half).cast("double") +
          element_at(arr, half + 1).cast("double")) / 2.0)
    }
}
