package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling with gap fill — the pandas `df.resample('D')`
  * analog (reference: siuba pipes into pandas' resample for this; here it is
  * a first-class distributed verb).
  *
  * Rows are bucketed to `date_trunc(unit, timeCol)`, aggregated per
  * (keys, bucket), and the result is completed against a per-group time
  * spine (min..max bucket stepped by one unit) so silent gaps become
  * explicit rows — `fill` supplies their values (absent columns stay NULL).
  *
  * Scale shape: one groupBy shuffle for the aggregate; the spine derives
  * from a per-group min/max aggregate (tiny — one row per group) exploded
  * by `sequence()`, then a left join back on (keys, bucket). Spine size is
  * groups x buckets regardless of input row count, so a 100 TB events table
  * with a bounded key space joins against a small spine — Catalyst
  * broadcasts it when stats allow. No driver-side collection anywhere.
  */
object Resample {

  private val units = Set("year", "quarter", "month", "week", "day",
    "hour", "minute", "second")

  def resample(df: DataFrame, timeCol: Column, unit: String,
               keys: Seq[String], aggs: Seq[(String, Column)],
               fill: Map[String, Column] = Map.empty): DataFrame = {
    require(units.contains(unit.toLowerCase), s"unsupported unit '$unit'")
    require(aggs.nonEmpty, "at least one aggregate")
    val u = unit.toLowerCase
    val bucketed = df.withColumn("__bucket", date_trunc(u, timeCol))
    val keyCols = keys.map(col)
    val agged = bucketed.groupBy((keyCols :+ col("__bucket")): _*)
      .agg(aggs.head._2.as(aggs.head._1),
           aggs.tail.map { case (n, c) => c.as(n) }: _*)
    // per-group spine: min..max bucket stepped by one unit. sequence() on
    // timestamps needs a calendar interval; month-family units use interval
    // arithmetic that sequence supports directly.
    val step = expr(s"interval 1 $u")
    val spine = agged.groupBy(keyCols: _*)
      .agg(min("__bucket").as("__lo"), max("__bucket").as("__hi"))
      .withColumn("__bucket", explode(sequence(col("__lo"), col("__hi"), step)))
      .drop("__lo", "__hi")
    val joined = spine.join(agged, keys :+ "__bucket", "left")
    val filled = fill.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), v))
    }
    filled.withColumnRenamed("__bucket", "bucket")
  }
}
