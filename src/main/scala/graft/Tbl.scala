package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import graft.internal.exprs

/** Window context threaded through mutate/filter expressions.
  *
  * Mirrors the reference's over-clause completion: group keys become
  * PARTITION BY and the arrange state becomes ORDER BY injected into every
  * over-clause (siuba/sql/backend.py:91-149); cumulative ops get the frame
  * ROWS UNBOUNDED PRECEDING..CURRENT ROW (siuba/sql/translate.py:131-166).
  */
final case class WinCtx(partition: Seq[Column], order: Seq[Column]) {
  /** Plain aggregate-over-group window — no ordering (AggOver). */
  def plain: WindowSpec = Window.partitionBy(partition: _*)

  /** Window ordered by explicit cols, falling back to the arrange state. */
  def orderedBy(cols: Seq[Column]): WindowSpec = {
    val o = if (cols.nonEmpty) cols else order
    if (o.isEmpty)
      throw GraftError(
        "window function needs an ordering: call arrange(...) first or pass order columns")
    Window.partitionBy(partition: _*).orderBy(o: _*)
  }

  /** Cumulative frame (RankOver/CumlOver in the reference). */
  def cumulBy(cols: Seq[Column]): WindowSpec =
    orderedBy(cols).rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Whole-partition frame, for nth/first/last with ordering. */
  def fullBy(cols: Seq[Column]): WindowSpec =
    orderedBy(cols).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
}

/** A deferred column expression: a function of the window context. Plain
  * `Column`s convert implicitly (see the `graft` package object) with
  * aggregate subtrees auto-wrapped in `.over(partitionBy(groups))` — the
  * reference's grouped-aggregate broadcasting (GroupByAgg,
  * siuba/experimental/pd_groups/groupby.py:100-129).
  */
trait GExpr { self =>
  def toCol(ctx: WinCtx): Column
  /** Post-process the materialized column (e.g. round a cumulative sum). */
  def transform(f: Column => Column): GExpr = new GExpr {
    def toCol(ctx: WinCtx): Column = f(self.toCol(ctx))
  }
}

/** A table with grouping and ordering state carried between verbs, like the
  * reference's DataFrameGroupBy dispatch target (siuba/dply/verbs.py:260-275)
  * and LazyTbl's (group_by, order_by) state (siuba/sql/backend.py:182-224).
  * The DataFrame inside is lazy (a Catalyst LogicalPlan), so this is also the
  * analogue of LazyTbl's op stack.
  */
final case class Tbl(
    df: DataFrame,
    groups: Seq[String] = Nil,
    ord: Seq[Column] = Nil,
    factors: Map[String, graft.cats.Forcats.Factor] = Map.empty
) {
  /** Register a column as categorical with ordered levels; `arrange` on it
    * then sorts by level index automatically (the reference sorts factors by
    * category order, not lexically — SURVEY §7.4 decision 3).
    */
  def withFactor(name: String, f: graft.cats.Forcats.Factor): Tbl =
    copy(factors = factors + (name -> f))

  private def ctx: WinCtx = WinCtx(groups.map(col), ord)

  def cols: Seq[String] = df.columns.toSeq

  /** (name, dtype) pairs for typed tidyselect resolution (`where()`). */
  def typedFields: Seq[(String, org.apache.spark.sql.types.DataType)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType)

  // ---- grouping -----------------------------------------------------------

  /** Attach grouping keys (state, not an immediate aggregation). `add` stacks
    * onto existing groups (siuba/dply/verbs.py:280-368). Computed keys are
    * created with mutate first.
    */
  def groupBy(keys: String*): Tbl = copy(groups = keys.toSeq)
  def groupByAdd(keys: String*): Tbl = copy(groups = (groups ++ keys).distinct)
  def groupBy(computed: (String, Column)*)(implicit d: DummyImplicit): Tbl = {
    val withCols = computed.foldLeft(df) { case (acc, (n, c)) => acc.withColumn(n, c) }
    Tbl(withCols, groups ++ computed.map(_._1), ord, factors)
  }
  def ungroup: Tbl = copy(groups = Nil)

  // ---- projection ---------------------------------------------------------

  /** Tidyselect: keep/drop/reorder/rename. Group columns are re-added if the
    * selection misses them (siuba/dply/verbs.py:657-674).
    */
  def select(sels: Sel*): Tbl = {
    var resolved = Sel.resolveT(typedFields, sels)
    val missingGroups = groups.filterNot(g => resolved.exists(_._2 == g))
    resolved = missingGroups.map(g => (g, g)) ++ resolved
    val renames = resolved.collect { case (out, src) if out != src => src -> out }
    val kept = resolved.flatMap { case (out, src) =>
      factors.get(src).map(out -> _)
    }.toMap
    Tbl(df.select(resolved.map { case (out, src) => col(src).as(out) }: _*),
        groups.map(g => renames.toMap.getOrElse(g, g)), ord, kept)
  }
  def select(names: String*)(implicit d: DummyImplicit): Tbl =
    select(names.map(n => Sel.Name(n): Sel): _*)

  def rename(pairs: (String, String)*): Tbl = {
    val m = pairs.map { case (nw, old) => old -> nw }.toMap
    Tbl(df.withColumnsRenamed(m), groups.map(g => m.getOrElse(g, g)), ord,
        factors.map { case (n, f) => m.getOrElse(n, n) -> f })
  }

  def drop(names: String*): Tbl = select(names.map(n => Sel.Not(Sel.Name(n)): Sel): _*)

  // ---- mutate family ------------------------------------------------------

  /** Add/overwrite columns; later pairs see earlier results
    * (siuba/dply/verbs.py:230-275). Sequential `withColumn` gives that
    * binding; Catalyst's CollapseProject folds the chain back into one
    * projection, so there is no per-column plan cost.
    */
  def mutate(pairs: (String, GExpr)*): Tbl = {
    val out = pairs.foldLeft(df) { case (acc, (name, e)) =>
      // windows nested inside another window's function (autocorr's
      // corr-over-lag, monotonicity's bool_and-over-lag) are illegal in one
      // expression: hoist the inner window into a temp projection first,
      // exactly like filter does for windows in WHERE
      val (inner, rewritten) =
        org.apache.spark.sql.graftshim.Shim.hoistNestedWindows(
          e.toCol(ctx), "__graft_nw")
      if (inner.isEmpty) acc.withColumn(name, rewritten)
      else {
        val withTmp = inner.foldLeft(acc) { case (a, (n, c)) => a.withColumn(n, c) }
        withTmp.withColumn(name, rewritten).drop(inner.map(_._1): _*)
      }
    }
    copy(df = out)
  }

  /** mutate, keep only group cols + results (siuba/dply/verbs.py:593-651). */
  def transmute(pairs: (String, GExpr)*): Tbl = {
    val m = mutate(pairs: _*)
    val keep = (groups ++ pairs.map(_._1)).distinct
    Tbl(m.df.select(keep.map(col): _*), groups, ord,
        factors.filter { case (n, _) => keep.contains(n) })
  }

  // ---- filter -------------------------------------------------------------

  /** Keep rows where ALL conditions are true; NULL conditions drop the row
    * (Spark `WHERE` semantics = the reference's NA-drop,
    * siuba/dply/verbs.py:403-472). Group-aggregate predicates
    * (`filter(_.mpg == _.mpg.max())`) work via the auto-windowizing GExpr
    * conversion — the same strategy as the reference's SQL backend, which
    * hoists over-clauses into a CTE then filters (siuba/sql/verbs/filter.py).
    */
  def filter(conds: GExpr*): Tbl = {
    val cs = conds.map(_.toCol(ctx))
    // Window expressions are illegal in WHERE: hoist them into a projection
    // first, filter on the materialized column, then drop it — the same
    // shape as the reference's CTE hoist (siuba/sql/verbs/filter.py:13-64).
    // Catalyst prunes the temp columns after the Filter, so no extra pass.
    val (windowed, plain) = cs.zipWithIndex.partition { case (c, _) =>
      exprs.containsWindow(c)
    }
    if (windowed.isEmpty) copy(df = df.filter(cs.reduce(_ && _)))
    else {
      val tmpNames = windowed.map { case (_, i) => s"__graft_w$i" }
      val withTmp = windowed.foldLeft(df) { case (acc, (c, i)) =>
        acc.withColumn(s"__graft_w$i", c)
      }
      val allConds = plain.map(_._1) ++ tmpNames.map(col)
      copy(df = withTmp.filter(allConds.reduce(_ && _)).drop(tmpNames: _*))
    }
  }

  // ---- summarize family ---------------------------------------------------

  /** One row per group; expressions must be aggregate trees. The result is
    * ungrouped (the reference returns a plain frame keyed by the groups,
    * siuba/dply/verbs.py:478-587).
    */
  def summarize(aggs: (String, Column)*): Tbl = {
    if (aggs.isEmpty)
      return Tbl(if (groups.isEmpty) df.limit(0) else df.select(groups.map(col): _*).distinct())
    val named = aggs.map { case (n, c) => c.as(n) }
    val out =
      if (groups.isEmpty) df.agg(named.head, named.tail: _*)
      else df.groupBy(groups.map(col): _*).agg(named.head, named.tail: _*)
    Tbl(out)
  }

  /** Group sizes as column `name` (auto-deduped on clash like the reference's
    * `_check_name`, siuba/dply/verbs.py:1268-1282); `wt` = weighted count;
    * `sort` = descending by count. Extra cols group on the fly.
    */
  def count(extra: Seq[String] = Nil, wt: Option[Column] = None,
            sort: Boolean = false, name: String = "n"): Tbl = {
    val keys = (groups ++ extra).distinct
    var nm = name
    while (keys.contains(nm)) nm = nm + nm.last // n -> nn -> nnn
    val agg = wt.map(w => sum(w))
      .getOrElse(org.apache.spark.sql.functions.count(lit(1))).as(nm)
    val grouped =
      if (keys.isEmpty) df.agg(agg)
      else df.groupBy(keys.map(col): _*).agg(agg)
    val sorted = if (sort) grouped.orderBy(desc(nm)) else grouped
    Tbl(sorted, groups, Nil)
  }

  /** dplyr `tally` — on the reference's own TODO list (verbs.py:48) and
    * unimplemented there: count of the current groups only, `count()`
    * without adding keys. */
  def tally(wt: Option[Column] = None, sort: Boolean = false,
            name: String = "n"): Tbl = count(Nil, wt, sort, name)

  /** count over expression keys (siuba/dply/verbs.py:1186-1265): each pair
    * is computed, then counted as a grouping key alongside existing groups.
    */
  def count(first: (String, Column), rest: (String, Column)*): Tbl = {
    val computed = first +: rest
    val withCols = computed.foldLeft(df) { case (acc, (n, c)) => acc.withColumn(n, c) }
    Tbl(withCols, groups, ord, factors).count(extra = computed.map(_._1))
  }

  /** Deterministic hash-based Bernoulli sample: keep a row iff
    * `xxhash64(key, seed) mod M < frac*M`. Unlike `sample()` (whose output
    * depends on partitioning and row order), the decision is a pure
    * function of the key and seed — reproducible across runs, repartitions
    * and clusters, and nested: the frac=0.1 sample is a subset of the
    * frac=0.2 sample at the same seed. The right sampler for 100 TB
    * pipelines where a sample must be re-derivable.
    */
  def sampleByHash(idCol: String, frac: Double, seed: Long = 42L): Tbl = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    val m = 1L << 30
    copy(df = df.filter(
      pmod(xxhash64(col(idCol), lit(seed)), lit(m)) < lit((m * frac).toLong)))
  }

  /** Deterministic train/val/test split assignment: `outCol` gets the name
    * of the split whose cumulative hash range `xxhash64(key, seed) mod 2^30`
    * falls into. A pure function of (key, seed) — reproducible across runs,
    * partitionings and growing data (a row never migrates as rows are
    * added). LEAKAGE CONTROL: key on the GROUP (domain / source /
    * dedup-cluster id), not the row id, and every member of a group lands
    * in the same split — near-duplicates cannot straddle train/test.
    * `hash` overrides the hash leaf (e.g. an md5-derived portable hash for
    * engine-reproducible splits). Fractions must sum to 1.
    */
  def splitByHash(keyCol: String, splits: Seq[(String, Double)],
                  outCol: String = "split", seed: Long = 42L,
                  hash: Option[Column] = None): Tbl = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0),
      "need at least one split; fractions must be nonnegative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val m = 1L << 30
    val h = pmod(hash.getOrElse(xxhash64(col(keyCol), lit(seed))), lit(m))
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(f => (m * f).toLong)
    // outermost-first when-chain: earlier splits win their range; the last
    // split absorbs any truncation remainder up to 2^30
    val labeled = splits.map(_._1).zip(cuts).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, (name, cut)) =>
        when(h < lit(cut), lit(name)).otherwise(acc)
      }
    copy(df = df.withColumn(outCol, labeled))
  }

  /** pandas `get_dummies` for one column (the reference declares it
    * unsupported, siuba/ops/generics.py:172): one 0/1 indicator per observed
    * level, named `{prefix}_{level}`, levels sorted. Level discovery is a
    * driver-side distinct over a single column — bounded the same way as
    * forcats level discovery; NULL yields no indicator (all zeros), matching
    * pandas' default dummy_na=False.
    */
  def getDummies(c: String, prefix: String = "", maxLevels: Int = 1000): Tbl = {
    val p = if (prefix.nonEmpty) prefix else c
    // level discovery is a driver collect AND each level becomes a column:
    // bound it, loudly — a high-cardinality input here is always a mistake
    val probe = df.select(col(c).cast("string")).distinct()
      .limit(maxLevels + 1).collect()
    if (probe.length > maxLevels)
      throw GraftError(
        s"getDummies('$c'): more than $maxLevels distinct levels; one-hot " +
        "encoding a high-cardinality column produces an unusable schema — " +
        "raise maxLevels only if you really want that many columns")
    val levels = probe.map(_.getString(0)).filter(_ != null).sorted
    // indicator names must stay addressable by col()/select: level strings
    // with dots/backticks/spaces would otherwise produce columns only
    // reachable through backtick quoting (pandas callers expect plain names)
    def sanitize(lv: String): String = lv.map(ch =>
      if (ch.isLetterOrDigit || ch == '_') ch else '_')
    val added = levels.foldLeft(df) { (acc, lv) =>
      acc.withColumn(s"${p}_${sanitize(lv)}",
        when(col(c).cast("string") === lv, 1).otherwise(0))
    }
    copy(df = added)
  }

  /** pandas `Series.explode` as a verb (declared in the reference's registry,
    * siuba/ops/generics.py:422): one row per element of the list column,
    * other columns repeated; empty or NULL lists keep their row with NULL
    * (pandas keeps the index with NaN — explode_outer's exact semantics).
    */
  def explode(c: String): Tbl =
    copy(df = df.withColumn(c,
      org.apache.spark.sql.functions.explode_outer(col(c))))

  /** Per-stratum quota sample: keep the top `k` rows of each group in
    * `orderBy` order (e.g. top-1000 docs per domain by quality score) —
    * the deterministic curation step of a training-data pipeline, vs the
    * probabilistic [[sampleStratified]]. Uses row_number (not rank), so
    * quotas are exact; pass a total order (tie-break on a unique id) for a
    * reproducible result. One hash-partitioned window — group cardinality
    * bounds each task, no global sort, scales to any number of strata.
    */
  def sampleQuota(groupCols: Seq[String], orderBy: Seq[Column], k: Int): Tbl = {
    require(k > 0, "k must be positive")
    // no strata -> global top-k: orderBy+limit plans TakeOrderedAndProject
    // (per-partition top-k, tiny merge), NOT the single-partition window a
    // partitionless row_number would silently funnel everything through
    if (groupCols.isEmpty) copy(df = df.orderBy(orderBy: _*).limit(k))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
      copy(df = df.withColumn("__qrn", row_number().over(w))
        .filter(col("__qrn") <= k).drop("__qrn"))
    }
  }

  /** Deterministic approximate quantiles from a bottom-k hash sample: per
    * group, keep the k rows with the smallest `xxhash64(sampleKey, seed)`
    * (a uniform seed-stable sample — and, unlike streaming sketch
    * compaction, MERGE-ORDER-INDEPENDENT: the k smallest hashes of a union
    * don't depend on partitioning), then take EXACT percentiles of the
    * sample. Rank error is O(1/√k): k=1000 ≈ ±1.6 percentile points at
    * 95% confidence. One window shuffle for the sample, then percentiles
    * over ≤k rows per group — predictable cost at any input size; the
    * one-pass alternative is `Fns.Agg.approxQuantile` (native sketch).
    * `hash` overrides the leaf (md5-portable → engine-reproducible);
    * `sampleKey` must identify rows (it also tie-breaks equal hashes).
    * Output: one row per group, one `q{1000p}` column per prob.
    */
  /** `sampleKey` (with the hash prepended) must order rows TOTALLY — or at
    * least down to rows indistinguishable in `xCol`: if distinct values
    * share a key, the bottom-k cut between them is scan-order-dependent
    * and the quantiles become nondeterministic. When the key columns can
    * repeat, append `xCol` itself as the final tiebreak.
    */
  def quantilesBySample(xCol: Column, probs: Seq[Double], k: Int,
                        sampleKey: Seq[Column], seed: Long = 42L,
                        hash: Option[Column] = None): Tbl = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be in [0, 1]")
    require(k > 0, "k must be positive")
    val h = hash.getOrElse(xxhash64((sampleKey :+ lit(seed)): _*))
    val sampled = sampleQuota(groups, h +: sampleKey, k)
    val aggs = probs.map(p =>
      percentile(xCol, lit(p)).as("q" + math.round(p * 1000)))
    if (groups.isEmpty) Tbl(sampled.df.agg(aggs.head, aggs.tail: _*))
    else Tbl(sampled.df.groupBy(groups.map(col): _*)
      .agg(aggs.head, aggs.tail: _*))
  }

  /** Native Bernoulli sample (fast, but partitioning-dependent) and
    * stratified per-group sampling (Spark's `sampleBy`).
    */
  def sampleFrac(frac: Double, seed: Long = 42L): Tbl =
    copy(df = df.sample(frac, seed))

  def sampleStratified(c: String, fractions: Map[Any, Double],
                       seed: Long = 42L): Tbl =
    copy(df = df.stat.sampleBy(c, fractions, seed))

  /** pandas `Series.value_counts` as a verb (the reference declares it but
    * leaves it unsupported, siuba/ops/generics.py kind=None): per-value
    * counts of `c`, descending, with optional `normalize` to fractions.
    * One hash aggregate (+ a scalar subtotal broadcast when normalizing).
    */
  def valueCounts(c: String, normalize: Boolean = false,
                  name: String = "n"): Tbl = {
    val counted = count(extra = Seq(c), sort = true, name = name)
    if (!normalize) counted
    else {
      // total via a windowed sum over the (already tiny) distinct-value
      // table — no driver collect, no second pass over the input
      val w = Window.partitionBy(groups.map(col): _*)
      Tbl(counted.df.withColumn(name,
            col(name).cast("double") / sum(col(name)).over(w))
          .orderBy(desc(name)), groups, Nil)
    }
  }

  /** pandas `describe` (unsupported in the reference, kind=None): count /
    * mean / stddev / min / 25% / 50% / 75% / max per selected numeric
    * column — Spark's native `summary()` (approx percentiles, one pass).
    */
  def describe(sel: Sel*): Tbl = {
    val cs =
      if (sel.isEmpty) typedFields.collect {
        case (n, dt) if dt.isInstanceOf[org.apache.spark.sql.types.NumericType] => n
      }
      else Sel.resolveT(typedFields, sel).map(_._2)
    Tbl(df.select(cs.map(col): _*)
      .summary("count", "mean", "stddev", "min", "25%", "50%", "75%", "max"))
  }

  /** Ordered funnel analysis over an event table: for the current grouping
    * (the user/entity key), step i counts groups that reached stage i AFTER
    * their step i-1 time — the product-analytics conversion funnel. Output:
    * (step, stage, n) with step 1-based.
    *
    * Each step time is a per-group conditional `min` that references the
    * previous step's time — expressed as agg-in-mutate, which graft's
    * grouped-agg broadcasting turns into one window per step over the SAME
    * partitioning, so Exchange reuse keeps it a single shuffle of the
    * events; the final tally is one tiny aggregate.
    */
  def funnel(ts: Column, stage: Column, steps: Seq[String]): DataFrame = {
    require(groups.nonEmpty, "funnel needs a grouping: group_by the user/entity key first")
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = this
    steps.zipWithIndex.foreach { case (s, i) =>
      val cond = if (i == 0) stage === s
                 else stage === s && ts > col(s"__fstep${i - 1}")
      cur = cur.mutate(s"__fstep$i" -> min(when(cond, ts)))
    }
    val perGroup = cur.df.groupBy(groups.map(col): _*).agg(
      max(col("__fstep0")).as("__fstep0"),
      steps.indices.tail.map(i => max(col(s"__fstep$i")).as(s"__fstep$i")): _*)
    val tallies = steps.indices.map(i =>
      sum(when(col(s"__fstep$i").isNotNull, 1L).otherwise(0L)).as(s"__n$i"))
    val one = perGroup.agg(tallies.head, tallies.tail: _*)
    val rows = org.apache.spark.sql.functions.explode(array(steps.indices.map(i =>
      struct(lit(i + 1).as("step"), lit(steps(i)).as("stage"),
             col(s"__n$i").as("n"))): _*))
    one.select(rows.as("r")).select(col("r.*"))
  }

  /** Approximate top-k values of a column, per current group, in tidy rows
    * (group keys, item, est_count) — the Misra-Gries `heavy_hitters`
    * aggregate (graft.plans.HeavyHittersAgg): ≤ 2k counters per partition
    * cross the shuffle instead of every distinct value. Optional positive
    * integral weight `w` ranks by summed weight (tokens, bytes) instead of
    * row count. Exact when each group has ≤ k distinct values; otherwise
    * estimates sit within groupTotal/(k+1) below truth, never above.
    */
  def topKApprox(c: String, k: Int, w: Option[Column] = None): Tbl = {
    val agg = w.map(x => graft.functions.Fns.Agg.heavyHittersWeighted(col(c), x, k))
      .getOrElse(graft.functions.Fns.Agg.heavyHitters(col(c), k))
    val aggd =
      if (groups.isEmpty) df.agg(agg.as("__hh"))
      else df.groupBy(groups.map(col): _*).agg(agg.as("__hh"))
    Tbl(aggd
      .select(groups.map(col) :+ explode_outer(col("__hh")).as("__e"): _*)
      .select(groups.map(col) :+ col("__e.item").as(c) :+
              col("__e.est_count").as("est_count"): _*),
      groups)
  }

  /** describe() with EXACT quantiles, in tidy long form (one row per
    * numeric column). `summary()`'s percentiles are approx (relative-error
    * sketch) and can drift across Spark versions; this variant uses the
    * sort-based `percentile` — deterministic, version-stable, and
    * oracle-able against any engine's `quantile_cont`. One aggregate pass
    * computes every stat for every column (no per-column jobs); the sorts
    * inside exact percentiles make it the small-data/diagnostics twin of
    * [[describe]] — at extreme scale, sample first or stay approx.
    */
  def describeExact(sel: Sel*): Tbl = {
    val cs =
      if (sel.isEmpty) typedFields.collect {
        case (n, dt) if dt.isInstanceOf[org.apache.spark.sql.types.NumericType] => n
      }
      else Sel.resolveT(typedFields, sel).map(_._2)
    require(cs.nonEmpty, "describeExact: no numeric columns selected")
    def d(n: String) = col(n).cast("double")
    val aggs = cs.flatMap { n => Seq(
      org.apache.spark.sql.functions.count(d(n)).as(s"__c_$n"),
      avg(d(n)).as(s"__m_$n"),
      stddev_samp(d(n)).as(s"__s_$n"),
      min(d(n)).as(s"__mn_$n"),
      percentile(d(n), lit(0.25)).as(s"__q1_$n"),
      percentile(d(n), lit(0.5)).as(s"__q2_$n"),
      percentile(d(n), lit(0.75)).as(s"__q3_$n"),
      max(d(n)).as(s"__mx_$n")) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = org.apache.spark.sql.functions.explode(array(cs.map { n =>
      struct(
        lit(n).as("column"), col(s"__c_$n").as("count"),
        col(s"__m_$n").as("mean"), col(s"__s_$n").as("stddev"),
        col(s"__mn_$n").as("min"), col(s"__q1_$n").as("q25"),
        col(s"__q2_$n").as("q50"), col(s"__q3_$n").as("q75"),
        col(s"__mx_$n").as("max")) }: _*))
    Tbl(one.select(rows.as("r")).select(col("r.*")))
  }

  /** [[describeExact]]'s scale sibling: quantiles come from ONE mergeable
    * per-column quantile sketch ([[graft.ops.Sketch.quantileSketchByGroup]]
    * over the melted (column, value) relation — one pass for every column)
    * instead of an exact per-column `percentile` sort. Quantile semantics
    * are type-1 (the ⌈q·n⌉-th order statistic, no interpolation) — exact
    * while a column holds ≤ k values, rank error O(log(n/k)/k) beyond.
    * count/mean/stddev/min/max stay exact (one aggregate pass). Same
    * output shape as describeExact: (column, count, mean, stddev, min,
    * q25, q50, q75, max), mean/stddev rounded to 4dp.
    */
  def describeApprox(sel: Sel*): Tbl = describeApprox(8192, sel)

  /** [[describeApprox]] with an explicit per-level sketch capacity. */
  def describeApprox(k: Int, sel: Seq[Sel]): Tbl = {
    import graft.ops.Sketch
    val cs =
      if (sel.isEmpty) typedFields.collect {
        case (n, dt) if dt.isInstanceOf[org.apache.spark.sql.types.NumericType] => n
      }
      else Sel.resolveT(typedFields, sel).map(_._2)
    require(cs.nonEmpty, "describeApprox: no numeric columns selected")
    def d(n: String) = col(n).cast("double")
    val long = df.select(org.apache.spark.sql.functions.explode(array(
        cs.map(n => struct(lit(n).as("column"), d(n).as("v"))): _*)).as("r"))
      .select(col("r.*"))
    val sk = Sketch.quantileSketchByGroup(long, Seq("column"), col("v"), k)
    val qp = Sketch.quantileEstimate(sk, Seq("column"), Seq(2500, 5000, 7500))
      .groupBy("column").agg(
        max(when(col("q") === 0.25, col("est"))).as("q25"),
        max(when(col("q") === 0.5, col("est"))).as("q50"),
        max(when(col("q") === 0.75, col("est"))).as("q75"))
    val stats = long.groupBy("column").agg(
      org.apache.spark.sql.functions.count(col("v")).as("count"),
      round(avg(col("v")), 4).as("mean"),
      round(stddev_samp(col("v")), 4).as("stddev"),
      min(col("v")).as("min"), max(col("v")).as("max"))
    // left join: a selected column whose values are ALL NULL has no sketch
    // rows — it must still report (count=0, NULL quantiles), not vanish
    Tbl(stats.join(qp, Seq("column"), "left")
      .select("column", "count", "mean", "stddev", "min", "q25", "q50",
        "q75", "max"))
  }

  /** count() appended to the original rows — a windowed count
    * (`COUNT(*) OVER (PARTITION BY keys)`, siuba/sql/verbs/count.py:58-84).
    * No shuffle beyond the window exchange; no join back.
    */
  def addCount(extra: Seq[String] = Nil, wt: Option[Column] = None,
               name: String = "n"): Tbl = {
    val keys = (groups ++ extra).distinct
    var nm = name
    while (cols.contains(nm)) nm = nm + nm.last
    val w = Window.partitionBy(keys.map(col): _*)
    val c = wt.map(x => sum(x))
      .getOrElse(org.apache.spark.sql.functions.count(lit(1)))
    copy(df = df.withColumn(nm, c.over(w)))
  }

  /** dplyr `add_tally` — [[addCount]] over the current groups only. */
  def addTally(wt: Option[Column] = None, name: String = "n"): Tbl =
    addCount(Nil, wt, name)

  // ---- sort / limit / distinct -------------------------------------------

  /** Multi-key sort; records the ordering for later over-clauses, exactly as
    * the reference's arrange does for its SQL backend
    * (siuba/sql/verbs/arrange.py:10-50). A total `orderBy` on Spark is a
    * range-partitioned sort — scales out; stability is not guaranteed
    * (pandas' mergesort is), so callers needing determinism add a unique
    * tie-break column.
    */
  def arrange(by: Column*): Tbl = {
    // bare references to registered factor columns sort by level index, not
    // lexically; direction / null-ordering decorations are preserved by
    // inspecting the SortOrder ColumnNode (expression sorts pass through)
    val rewritten =
      if (factors.isEmpty) by.toSeq
      else by.toSeq.map(c => org.apache.spark.sql.graftshim.Shim
        .rewriteSortFactor(c, n => factors.get(n).map(f => f.sortKey(_))))
    Tbl(df.orderBy(rewritten: _*), groups, rewritten, factors)
  }

  def head(n: Int): Tbl = copy(df = df.limit(n))

  /** Rows with the top-n values of `wt` per group, ties kept — implemented as
    * `min_rank(desc(wt)) <= n` like the reference (siuba/dply/verbs.py:
    * 1863-1914). Spark plans rank-then-filter as a per-partition TopK.
    * Negative n = bottom-n.
    */
  def topN(n: Int, wt: Column): Tbl = {
    val ranked = rank().over(
      Window.partitionBy(groups.map(col): _*)
        .orderBy(if (n >= 0) wt.desc else wt.asc))
    copy(df = df.withColumn("__rk", ranked).filter(col("__rk") <= math.abs(n)).drop("__rk"))
  }

  /** Unique rows over the given cols. `keepAll` keeps the first row's other
    * columns (`dropDuplicates`); otherwise projects then de-dupes
    * (siuba/dply/verbs.py:954-1028). Grouped: group cols always included.
    */
  def distinct(on: Seq[String] = Nil, keepAll: Boolean = false): Tbl = {
    val keys = (groups ++ on).distinct
    if (keys.isEmpty) Tbl(df.distinct(), groups, Nil, factors)
    else if (keepAll) Tbl(df.dropDuplicates(keys), groups, Nil, factors)
    else Tbl(df.select(keys.map(col): _*).distinct(), groups, Nil,
             factors.filter { case (n, _) => keys.contains(n) })
  }

  /** distinct over computed columns (mutate-style kwargs,
    * siuba/dply/verbs.py:954-1028): each pair is evaluated first, then the
    * result is de-duped over those names (plus any group keys).
    */
  def distinct(first: (String, Column), rest: (String, Column)*): Tbl = {
    val computed = first +: rest
    val withCols = computed.foldLeft(df) { case (acc, (n, c)) => acc.withColumn(n, c) }
    Tbl(withCols, groups, ord, factors).distinct(computed.map(_._1))
  }

  // ---- joins --------------------------------------------------------------

  /** Equi-joins with the reference's semantics: NA keys match NA
    * (pandas merge, siuba/dply/verbs.py:1639-1647 → `<=>` null-safe equality),
    * m:n matches multiply, shared non-key columns get `_x`/`_y` suffixes, and
    * full-join key columns are coalesced (siuba/sql/verbs/join.py:11-43).
    * Catalyst picks broadcast/SMJ/SHJ; pass the right side through
    * `org.apache.spark.sql.functions.broadcast` upstream to hint.
    */
  def join(right: Tbl, on: Seq[(String, String)], how: String,
           suffixes: (String, String) = ("_x", "_y")): Tbl = {
    val l = df.alias("__l")
    val r = right.df.alias("__r")
    val cond = on.map { case (lk, rk) => col(s"__l.$lk") <=> col(s"__r.$rk") }
      .reduce(_ && _)
    val joined = l.join(r, cond, how)

    // right key columns are dropped, keeping the left name — pandas/siuba
    // output shape (test_verb_join.py: join on {"ii": "jj"} yields [ii, x, y])
    val lKeys = on.map(_._1); val rKeys = on.map(_._2)
    val lNonKey = df.columns.filterNot(lKeys.contains)
    val rNonKey = right.df.columns.filterNot(rKeys.contains)
    val overlap = lNonKey.toSet.intersect(rNonKey.toSet)

    val keyCols: Seq[Column] = on.map { case (lk, rk) =>
      how match {
        case "right" => col(s"__r.$rk").as(lk)
        case "full" | "outer" | "full_outer" =>
          coalesce(col(s"__l.$lk"), col(s"__r.$rk")).as(lk)
        case _ => col(s"__l.$lk").as(lk)
      }
    }
    val lCols = lNonKey.toSeq.map { c =>
      col(s"__l.$c").as(if (overlap(c)) c + suffixes._1 else c)
    }
    val rCols = rNonKey.toSeq.map { c =>
      col(s"__r.$c").as(if (overlap(c)) c + suffixes._2 else c)
    }
    Tbl(joined.select(keyCols ++ lCols ++ rCols: _*), groups, Nil)
  }

  def innerJoin(right: Tbl, on: Seq[String]): Tbl = join(right, on.map(k => k -> k), "inner")
  def leftJoin(right: Tbl, on: Seq[String]): Tbl  = join(right, on.map(k => k -> k), "left")
  def rightJoin(right: Tbl, on: Seq[String]): Tbl = join(right, on.map(k => k -> k), "right")
  def fullJoin(right: Tbl, on: Seq[String]): Tbl  = join(right, on.map(k => k -> k), "full")

  /** Join-key inference: with no `on`, join on every identically-named
    * column and warn, like the reference (siuba/dply/verbs.py:1727-1736,
    * siuba/sql/verbs/join.py:180-198). Left column order is preserved.
    */
  private[graft] def sharedKeys(right: Tbl, what: String): Seq[String] = {
    val rset = right.df.columns.toSet
    val shared = df.columns.toSeq.filter(rset)
    if (shared.isEmpty)
      throw GraftError(s"$what: no shared column names to infer join keys from")
    Console.err.println(
      s"graft warning: $what joining on inferred keys (${shared.mkString(", ")}); pass `on` explicitly to silence")
    shared
  }
  def innerJoin(right: Tbl): Tbl = innerJoin(right, sharedKeys(right, "inner_join"))
  def leftJoin(right: Tbl): Tbl  = leftJoin(right, sharedKeys(right, "left_join"))
  def rightJoin(right: Tbl): Tbl = rightJoin(right, sharedKeys(right, "right_join"))
  def fullJoin(right: Tbl): Tbl  = fullJoin(right, sharedKeys(right, "full_join"))
  def semiJoin(right: Tbl): Tbl  = semiJoin(right, sharedKeys(right, "semi_join"))
  def antiJoin(right: Tbl): Tbl  = antiJoin(right, sharedKeys(right, "anti_join"))

  /** As-of (backward) join sugar over [[graft.ops.AsofJoin]]: most recent
    * right row with ts <= left ts per key. Union+window, no row blow-up.
    */
  def asofJoin(right: Tbl, key: String, ts: String): Tbl =
    Tbl(graft.ops.AsofJoin.asofBackward(df, right.df, key, ts), groups, Nil)

  /** Range join sugar over [[graft.ops.RangeJoin]]: rows of this table
    * whose `ptCol` falls inside the right table's [startCol, endCol].
    */
  def rangeJoin(intervals: Tbl, ptCol: String, startCol: String,
                endCol: String, bucketWidth: Long): Tbl =
    Tbl(graft.ops.RangeJoin.pointInInterval(df, intervals.df,
      ptCol, startCol, endCol, bucketWidth), groups, Nil)

  /** Theta join: arbitrary boolean on-clause over the aliased sides `l`/`r`
    * (the reference's SQL-only `sql_on`, siuba/sql/verbs/join.py:169-233).
    * Catalyst extracts any equi-conjuncts into a hash join and post-filters
    * the rest; pure inequality conditions fall to BNLJ — caller beware at
    * scale.
    */
  def thetaJoin(right: Tbl, cond: (DataFrame, DataFrame) => Column,
                how: String = "inner"): Tbl = {
    val l = df.alias("l"); val r = right.df.alias("r")
    Tbl(l.join(r, cond(l, r), how), groups, Nil)
  }

  /** OLAP grouping-set aggregations — beyond the reference (SURVEY §2.5
    * notes them as free extensions).
    */
  def cube(keys: Seq[String])(aggs: (String, Column)*): Tbl = {
    val named = aggs.map { case (n, c) => c.as(n) }
    Tbl(df.cube(keys.map(col): _*).agg(named.head, named.tail: _*))
  }
  def rollup(keys: Seq[String])(aggs: (String, Column)*): Tbl = {
    val named = aggs.map { case (n, c) => c.as(n) }
    Tbl(df.rollup(keys.map(col): _*).agg(named.head, named.tail: _*))
  }

  // semi/anti conditions use plan aliases, not df(col) references: the
  // latter resolve ambiguously (or trivially true) when `right` derives
  // from the same lineage as `this` — the classic self-join trap.

  /** Left rows with >=1 match — never duplicates (WHERE EXISTS). */
  def semiJoin(right: Tbl, on: Seq[String]): Tbl = {
    val l = df.alias("__l"); val r = right.df.alias("__r")
    val cond = on.map(k => col(s"__l.$k") <=> col(s"__r.$k")).reduce(_ && _)
    Tbl(l.join(r, cond, "left_semi"), groups, ord, factors)
  }

  /** Left rows with no match (WHERE NOT EXISTS). */
  def antiJoin(right: Tbl, on: Seq[String]): Tbl = {
    val l = df.alias("__l"); val r = right.df.alias("__r")
    val cond = on.map(k => col(s"__l.$k") <=> col(s"__r.$k")).reduce(_ && _)
    Tbl(l.join(r, cond, "left_anti"), groups, ord, factors)
  }

  /** Row-bind by column name (dplyr bind_rows; not in the reference —
    * SURVEY §2.7 extension). Missing columns fill with NULL.
    */
  def bindRows(others: Tbl*): Tbl =
    Tbl(others.foldLeft(df)((acc, o) =>
      acc.unionByName(o.df, allowMissingColumns = true)), groups, Nil)

  // ---- rows_* maintenance verbs (dplyr rows_insert/update/upsert/delete;
  // extension — incremental corpus/table maintenance expressed as joins so
  // Catalyst broadcasts the typically-small patch side) -------------------

  private def rowsCheck(source: Tbl, by: Seq[String], verb: String): Unit = {
    require(by.nonEmpty, s"$verb: need at least one key column")
    val missing = source.df.columns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw GraftError(s"$verb: source columns ${missing.mkString(",")} not in target")
    if (!by.forall(source.df.columns.contains))
      throw GraftError(s"$verb: key columns must exist in source")
  }

  /** Insert source rows whose key is NOT already in the target; rows with
    * an existing key are silently skipped (dplyr `conflict = "ignore"`).
    * Source may omit non-key columns (filled NULL).
    */
  def rowsInsert(source: Tbl, by: Seq[String]): Tbl = {
    rowsCheck(source, by, "rows_insert")
    val fresh = source.antiJoin(Tbl(df.select(by.map(col): _*)), by)
    Tbl(df.unionByName(fresh.df, allowMissingColumns = true), groups, Nil)
  }

  /** Overwrite matched rows' columns with the source's values (the source's
    * NULLs overwrite too, per dplyr rows_update); target columns absent
    * from the source keep their values; unmatched source rows are ignored.
    */
  def rowsUpdate(source: Tbl, by: Seq[String]): Tbl = {
    rowsCheck(source, by, "rows_update")
    // dplyr contract: source keys must be unique (a dup would multiply
    // target rows); not re-checked here — run Checks.duplicateKeyCount on
    // the patch when the source is untrusted
    val srcCols = source.df.columns.toSet
    val s = source.df.select(by.map(col) ++
        source.df.columns.filterNot(by.contains)
          .map(c => col(c).as(s"__src_$c")): _*)
      .withColumn("__matched", lit(true))
    val withFlag = df.join(s, by, "left")
      .withColumn("__matched", coalesce(col("__matched"), lit(false)))
    val out = df.columns.toSeq.map { c =>
      if (by.contains(c) || !srcCols(c)) col(c)
      else when(col("__matched"), col(s"__src_$c")).otherwise(col(c)).as(c)
    }
    Tbl(withFlag.select(out: _*), groups, Nil)
  }

  /** rows_update for matches plus rows_insert for new keys. */
  def rowsUpsert(source: Tbl, by: Seq[String]): Tbl =
    rowsUpdate(source, by).rowsInsert(source, by)

  /** Drop target rows whose key appears in the source (dplyr rows_delete). */
  def rowsDelete(source: Tbl, by: Seq[String]): Tbl = {
    rowsCheck(source, by, "rows_delete")
    antiJoin(Tbl(source.df.select(by.map(col): _*)), by)
  }

  /** Set operations (SURVEY §2.7 extensions; SQL INTERSECT / EXCEPT). */
  def intersect(other: Tbl): Tbl = Tbl(df.intersect(other.df), groups, Nil, factors)
  def except(other: Tbl): Tbl   = Tbl(df.except(other.df), groups, Nil, factors)

  /** Physical-distribution hints (no semantic effect). `repartitionBy`
    * pre-shuffles on keys so a later same-key join/agg reuses the exchange;
    * `coalesceTo` shrinks partition count without a shuffle (post-filter or
    * pre-write).
    */
  def repartitionBy(n: Int, keys: String*): Tbl =
    copy(df = df.repartition(n, keys.map(col): _*))
  def coalesceTo(n: Int): Tbl = copy(df = df.coalesce(n))

  // ---- materialization ----------------------------------------------------

  def collect(): Array[Row] = df.collect()
  def showQuery(): Unit = df.explain(true)

  /** dplyr `glimpse`: schema plus the first rows, transposed-ish via show —
    * a debugging convenience, driver-side by definition. */
  def glimpse(n: Int = 5): Unit = { df.printSchema(); df.show(n, 24, false) }

  /** dbplyr/siuba `compute()` (sql/verbs/compute.py): materialize the
    * pipeline so far and keep working lazily on the result. On Spark that is
    * an eager `localCheckpoint` — lineage is cut (iterative pipelines stop
    * re-planning a growing tree) and downstream verbs read the materialized
    * blocks. `eager = false` marks without materializing (next action pays).
    */
  def compute(eager: Boolean = true): Tbl =
    copy(df = df.localCheckpoint(eager))

  /** Pin the current plan's result in executor memory/disk for reuse by
    * multiple downstream consumers (grouping/order state is unaffected).
    * Spark-side extension — the reference's eager backend is always
    * "cached"; this is the lazy-backend analogue of materializing once.
    */
  def cache(): Tbl = copy(df = df.cache())
  def unpersist(): Tbl = copy(df = df.unpersist())
}

object Tbl {
  def read(spark: SparkSession, dir: String, table: String): Tbl =
    Tbl(spark.read.parquet(s"$dir/$table.parquet"))
}
