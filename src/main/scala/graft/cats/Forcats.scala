package graft.cats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tbl

/** forcats family (siuba/dply/forcats.py, 463 LoC). Spark has no categorical
  * type (SURVEY §7.4 decision): a factor is a StringType column plus a levels
  * table. Level-order-sensitive ops (fct_inorder/infreq/reorder) return a
  * `Factor` — the recoded column plus its ordered levels as a small
  * DataFrame usable for sorting via `array_position` against a broadcast
  * literal, or by joining the levels table.
  */
object Forcats {

  /** Ordered levels as (level, index), small enough to collect or broadcast. */
  final case class Factor(levels: Seq[String]) {
    /** Sort key for `arrange` on this factor: position in the level order.
      * Values outside the level set (array_position = 0) sort after every
      * known level, matching pandas' unknown→NaN-last; NULLs keep NULL and
      * follow the sort's null ordering.
      */
    def sortKey(c: Column): Column = {
      val pos = array_position(lit(levels.toArray), c)
      when(pos === 0, lit(levels.size + 1L)).otherwise(pos)
    }
  }

  /** Levels in first-appearance order (fct_inorder, forcats.py:29). Needs a
    * row order to be meaningful — pass the ordering column explicitly (Spark
    * frames are unordered multisets).
    */
  def fctInorder(df: DataFrame, c: Column, orderBy: Column): Factor = {
    val lv = df.select(c.as("lv"), orderBy.as("o"))
      .filter(col("lv").isNotNull) // NA is never a level (pandas categorical)
      .groupBy(col("lv")).agg(min(col("o")).as("fst"))
      .orderBy(col("fst")).select(col("lv"))
      .collect().map(_.getString(0)).toSeq
    Factor(lv)
  }

  /** Levels by descending frequency (fct_infreq, forcats.py:101). */
  def fctInfreq(df: DataFrame, c: Column): Factor = {
    val lv = df.filter(c.isNotNull).groupBy(c.as("lv")).count()
      .orderBy(desc("count"), col("lv"))
      .collect().map(_.getString(0)).toSeq
    Factor(lv)
  }

  /** Reorder levels by `fn(x)` per level (fct_reorder, forcats.py:159).
    * Default fn is the MEDIAN, matching the reference's `func=np.median`
    * (and R forcats) — pass `avg(_)` explicitly for mean ordering.
    */
  def fctReorder(df: DataFrame, c: Column, x: Column,
                 fn: Column => Column = org.apache.spark.sql.functions.median(_),
                 desc0: Boolean = false): Factor = {
    val agged = df.filter(c.isNotNull).groupBy(c.as("lv")).agg(fn(x).as("stat"))
    val ordered = agged.orderBy(if (desc0) desc("stat") else col("stat"))
    Factor(ordered.select("lv").collect().map(_.getString(0)).toSeq)
  }

  /** Rename levels: Map(new -> old*) (fct_recode, forcats.py:210). A
    * when-chain — no shuffle, codegen'd.
    */
  def fctRecode(c: Column, mapping: Map[String, Seq[String]]): Column = {
    val flat = mapping.toSeq.flatMap { case (nw, olds) => olds.map(_ -> nw) }
    flat.foldLeft(c) { case (acc, (old, nw)) =>
      when(c === old, lit(nw)).otherwise(acc)
    }
  }

  /** Collapse multiple levels into groups, others kept (fct_collapse,
    * forcats.py:255); `otherLevel` lumps the rest.
    */
  def fctCollapse(c: Column, groups: Map[String, Seq[String]],
                  otherLevel: Option[String] = None): Column = {
    val recoded = fctRecode(c, groups)
    otherLevel match {
      case Some(o) =>
        val kept = groups.keys.toSeq
        when(recoded.isin(kept: _*), recoded).otherwise(lit(o))
      case None => recoded
    }
  }

  /** Keep the n most frequent levels, lump the rest into `other`
    * (fct_lump, forcats.py:351). Frequency ranking is a window over a tiny
    * per-level aggregate; the recode joins it back — broadcast-sized.
    *
    * `ties` (the reference declares the param at forcats.py:351 but raises
    * NotImplementedError; semantics follow R forcats / rank ties.method):
    *   - "first" (default): exactly n levels kept, equal-frequency ties
    *     broken by level name — deterministic on every run;
    *   - "min":   boundary ties ALL kept (rank);
    *   - "max":   boundary ties kept only if the whole tie group fits;
    *   - "dense": n distinct frequencies kept (dense_rank).
    */
  def fctLump(df: DataFrame, c: String, n: Int, other: String = "Other",
              ties: String = "first"): DataFrame =
    lumpBy(df, c, other, None, keepRank = Some(n), keepProp = None, ties = ties)

  /** fct_lump(prop=) (forcats.py:351): keep levels holding at least `prop`
    * of the (optionally `w`-weighted) rows; lump the rest. */
  def fctLumpProp(df: DataFrame, c: String, prop: Double,
                  w: Option[org.apache.spark.sql.Column] = None,
                  other: String = "Other"): DataFrame =
    lumpBy(df, c, other, w, keepRank = None, keepProp = Some(prop))

  /** fct_lump(n=, w=): weighted frequency ranking. */
  def fctLumpWeighted(df: DataFrame, c: String, n: Int,
                      w: org.apache.spark.sql.Column,
                      other: String = "Other"): DataFrame =
    lumpBy(df, c, other, Some(w), keepRank = Some(n), keepProp = None)

  private def lumpBy(df: DataFrame, c: String, other: String,
                     w: Option[org.apache.spark.sql.Column],
                     keepRank: Option[Int], keepProp: Option[Double],
                     ties: String = "first"): DataFrame = {
    require(keepRank.nonEmpty || keepProp.nonEmpty, "need n or prop")
    val agg = w.map(x => sum(x)).getOrElse(count(lit(1))).as("__n")
    val perLevel = df.groupBy(col(c)).agg(agg)
    val wTot = Window.partitionBy()     // over the tiny per-level table only
    val rkExpr = ties match {
      case "first" => row_number().over(Window.orderBy(desc("__n"), col(c)))
      case "min"   => rank().over(Window.orderBy(desc("__n")))
      case "dense" => dense_rank().over(Window.orderBy(desc("__n")))
      // max rank of a tie group = min rank + group size - 1
      case "max"   => rank().over(Window.orderBy(desc("__n"))) +
                      count(lit(1)).over(Window.partitionBy("__n")) - 1
      case bad => throw new IllegalArgumentException(
        s"fct_lump ties must be first/min/max/dense, got '$bad'")
    }
    val scored = perLevel
      .withColumn("__rk", rkExpr)
      .withColumn("__frac", col("__n") / sum("__n").over(wTot))
    val keep = (keepRank.map(n => col("__rk") <= n).toSeq ++
                keepProp.map(p => col("__frac") >= p).toSeq).reduce(_ && _)
    val freq = scored.select(col(c).as("__lv"), keep.as("__keep"))
    df.join(broadcast(freq), df(c) === col("__lv"), "left")
      // NA stays NA (fct_lump never lumps missing into the other level)
      .withColumn(c, when(col(c).isNull, lit(null))
        .when(col("__keep"), col(c)).otherwise(lit(other)))
      .drop("__lv", "__keep")
  }

  /** Reverse level order (fct_rev, forcats.py:429). */
  def fctRev(f: Factor): Factor = Factor(f.levels.reverse)
}
