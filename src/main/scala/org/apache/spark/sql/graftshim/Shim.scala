package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.internal._

/** Spark 4 made Column a thin wrapper over a `ColumnNode` tree
  * (org.apache.spark.sql.internal.columnNodes.scala) whose node classes and
  * Column constructor are `private[sql]`, so graft's expression rewriter
  * lives here, under the `org.apache.spark.sql` package.
  *
  * What it implements: the reference engine (machow/siuba) classifies every
  * column operation as elementwise / aggregate / window and, in mutate/filter
  * context on a grouped table, re-expands per-group aggregates to row length
  * (siuba/experimental/pd_groups/groupby.py:100-129; siuba/sql/translate.py:
  * 87-107 emits `AVG(x) OVER (PARTITION BY g)`). On Spark that subsystem
  * collapses to one rewrite: wrap each aggregate subtree of a Column in
  * `.over(partitionBy(groupKeys))`.
  */
object Shim {

  /** Build a user-facing Column from a raw Catalyst expression (for custom
    * Expressions/aggregates; the classic bridge is `private[sql]`).
    */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Column for a custom Catalyst window function over (partition, order).
    * `expressionColumn(...).over(spec)` does NOT work: the analyzer fails
    * with WINDOW_FUNCTION_WITHOUT_OVER_CLAUSE even for builtin window
    * functions routed through an ExpressionColumnNode (verified on 4.1.2) —
    * so the WindowExpression is built directly in Catalyst. The frame is
    * left Unspecified: ResolveWindowFrame adopts the function's own frame.
    */
  def windowOf(func: org.apache.spark.sql.catalyst.expressions.Expression,
               partition: Seq[Column], order: Seq[Column]): Column = {
    import org.apache.spark.sql.catalyst.expressions._
    val sorts = order.map(c => exprOf(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    columnOf(WindowExpression(func,
      WindowSpecDefinition(partition.map(exprOf), sorts, UnspecifiedFrame)))
  }

  /** Register a function builder on a live session's FunctionRegistry
    * (session-scoped). `sessionState` is `private[sql]`, hence here.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** Aggregate function names as they appear in UnresolvedFunction nodes. */
  private val aggNames: Set[String] = Set(
    "avg", "mean", "sum", "min", "max", "count", "count_distinct",
    "approx_count_distinct", "stddev", "stddev_samp", "stddev_pop", "std",
    "variance", "var_samp", "var_pop", "skewness", "kurtosis", "corr",
    "covar_samp", "covar_pop", "collect_list", "collect_set", "percentile",
    "percentile_approx", "median", "mode", "bool_and", "bool_or", "every",
    "some", "max_by", "min_by", "first", "first_value", "last", "last_value",
    "any_value", "product", "sum_distinct", "hll_sketch_agg", "array_agg",
    "try_avg", "try_sum", "regr_avgx", "regr_avgy", "regr_count", "regr_r2"
  )

  private def isAgg(n: ColumnNodeLike): Boolean = n match {
    case f: UnresolvedFunction => aggNames(f.functionName.toLowerCase)
    case _                     => false
  }

  /** True if the column contains an aggregate call not already windowed. */
  def containsAgg(c: Column): Boolean = {
    def go(n: ColumnNodeLike): Boolean = n match {
      case _: Window             => false // already has an over-clause
      case f: UnresolvedFunction => isAgg(f) || f.arguments.exists(go(_))
      case a: Alias              => go(a.child)
      case ct: Cast              => go(ct.child)
      case s: SortOrder          => go(s.child)
      case cw: CaseWhenOtherwise =>
        cw.branches.exists(b => go(b._1) || go(b._2)) || cw.otherwise.exists(go(_))
      case e: UnresolvedExtractValue => go(e.child) || go(e.extraction)
      case l: LambdaFunction     => go(l.function)
      case u: UpdateFields       => go(u.structExpression)
      case _                     => false
    }
    go(c.node)
  }

  /** True if the column contains a window (over-clause) anywhere. */
  def containsWindow(c: Column): Boolean = {
    var found = false
    def go(n: ColumnNodeLike): Unit = n match {
      case _: Window             => found = true
      case f: UnresolvedFunction => f.arguments.foreach(go)
      case a: Alias              => go(a.child)
      case ct: Cast              => go(ct.child)
      case s: SortOrder          => go(s.child)
      case cw: CaseWhenOtherwise =>
        cw.branches.foreach { b => go(b._1); go(b._2) }; cw.otherwise.foreach(go)
      case e: UnresolvedExtractValue => go(e.child); go(e.extraction)
      case l: LambdaFunction     => go(l.function)
      case u: UpdateFields       => go(u.structExpression)
      case _                     => ()
    }
    go(c.node)
    found
  }

  /** Rewrite a sort column that references a factor (categorical) column
    * into its level-index sort key, preserving any direction / null-ordering
    * decoration. Handles a bare reference, `.desc`/`.asc_nulls_last`/…
    * (a SortOrder node), and qualified names (`t.f` resolves on the last
    * part). Anything more complex (expression sorts) is returned unchanged —
    * those are not bare factor references. `key(name)` returns the
    * original-column → sort-key transform for registered factors.
    */
  def rewriteSortFactor(c: Column, key: String => Option[Column => Column]): Column = {
    def attr(n: ColumnNode): Option[(String, Column)] = n match {
      case a: UnresolvedAttribute =>
        Some((a.nameParts.last, Column(a)))
      case _ => None
    }
    c.node match {
      case s: SortOrder =>
        attr(s.child).flatMap { case (nm, orig) =>
          key(nm).map(f => Column(s.copy(child = f(orig).node)))
        }.getOrElse(c)
      case n =>
        attr(n).flatMap { case (nm, orig) => key(nm).map(_(orig)) }.getOrElse(c)
    }
  }

  /** Reverse a sort column: asc↔desc and nulls_first↔nulls_last, whatever
    * decoration it carries; an undecorated column becomes `.desc_nulls_last`
    * (the mirror of the asc/nulls_first default). Used to express "n-th from
    * the end" as nth_value over the mirrored ordering.
    */
  def reverseSort(c: Column): Column = c.node match {
    case s: SortOrder =>
      val dir = s.sortDirection match {
        case SortOrder.Ascending  => SortOrder.Descending
        case SortOrder.Descending => SortOrder.Ascending
      }
      val no = s.nullOrdering match {
        case SortOrder.NullsFirst => SortOrder.NullsLast
        case SortOrder.NullsLast  => SortOrder.NullsFirst
      }
      Column(SortOrder(s.child, dir, no, s.origin))
    case _ => c.desc_nulls_last
  }

  /** Wrap every aggregate subtree of `c` in `.over(spec)`:
    * `col("x") - avg(col("x"))` becomes `col("x") - avg(col("x")).over(spec)`.
    * Aggregates cannot nest, so recursion stops at the first aggregate on
    * each path; subtrees already carrying an over-clause are left alone.
    */
  def windowizeAggs(c: Column, spec: WindowSpec): Column = {
    def go(n: ColumnNode): ColumnNode = n match {
      case w: Window => w
      // DISTINCT aggregates are not allowed in windows
      // (DISTINCT_WINDOW_FUNCTION_UNSUPPORTED): rewrite count(DISTINCT x)
      // to size(collect_set(x)) over the same spec — identical semantics.
      case f: UnresolvedFunction
          if f.isDistinct && f.functionName.toLowerCase == "count"
            && f.arguments.size == 1 =>
        org.apache.spark.sql.functions
          .size(org.apache.spark.sql.functions.collect_set(Column(f.arguments.head)).over(spec))
          .cast("long").node
      case f: UnresolvedFunction if isAgg(f) => Column(f).over(spec).node
      case f: UnresolvedFunction => f.copy(arguments = f.arguments.map(go))
      case a: Alias              => a.copy(child = go(a.child))
      case ct: Cast              => ct.copy(child = go(ct.child))
      case s: SortOrder          => s.copy(child = go(s.child))
      case cw: CaseWhenOtherwise =>
        cw.copy(
          branches = cw.branches.map { case (p, v) => (go(p), go(v)) },
          otherwise = cw.otherwise.map(go))
      case e: UnresolvedExtractValue =>
        e.copy(child = go(e.child), extraction = go(e.extraction))
      case other => other
    }
    Column(go(c.node))
  }

  /** Structural map over the node kinds the rewriters understand; anything
    * else is a leaf. */
  private def mapKids(n: ColumnNode, f: ColumnNode => ColumnNode): ColumnNode =
    n match {
      case fn: UnresolvedFunction => fn.copy(arguments = fn.arguments.map(f))
      case a: Alias               => a.copy(child = f(a.child))
      case ct: Cast               => ct.copy(child = f(ct.child))
      case s: SortOrder           => s.copy(child = f(s.child))
      case cw: CaseWhenOtherwise  =>
        cw.copy(branches = cw.branches.map { case (p, v) => (f(p), f(v)) },
                otherwise = cw.otherwise.map(f))
      case e: UnresolvedExtractValue =>
        e.copy(child = f(e.child), extraction = f(e.extraction))
      case other => other
    }

  /** Split nested window expressions — Spark rejects a window function
    * inside another window function's arguments (e.g.
    * `corr(x, lag(x).over(w1)).over(w2)` for autocorr). Every Window subtree
    * found inside an enclosing Window's function is bound to a fresh temp
    * column (named `prefix0`, `prefix1`, … in dependency order) and replaced
    * by a reference; the caller projects the bindings first, then the
    * rewritten expression — the same hoist-to-projection shape `filter` uses
    * for windows in WHERE. Returns (bindings, rewritten); bindings empty
    * means no nesting and `c` is returned untouched.
    */
  def hoistNestedWindows(c: Column, prefix: String): (Seq[(String, Column)], Column) = {
    val bindings = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    def hoist(n: ColumnNode): ColumnNode = n match {
      case w: Window =>
        val processed = outer(w) // the inner window may itself nest
        val name = prefix + bindings.size
        bindings += name -> Column(processed)
        org.apache.spark.sql.functions.col(name).node
      case other => mapKids(other, hoist)
    }
    def outer(n: ColumnNode): ColumnNode = n match {
      case w: Window => w.copy(windowFunction = mapKids(w.windowFunction, hoist))
      case other     => mapKids(other, outer)
    }
    val out = outer(c.node)
    (bindings.toSeq, if (bindings.isEmpty) c else Column(out))
  }
}
