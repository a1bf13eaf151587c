package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (backward): for each left row, attach the most recent right
  * row with `r.ts <= l.ts` within the same key — the standard
  * time-series/feature-store join. Not in the reference (SURVEY §2.4 notes
  * none); built as an extension.
  *
  * Implementation is the union+window formulation, NOT a range join: tag
  * both sides, union on (key, ts, side), sort each key partition once, and
  * carry the last right payload forward (`last(..., ignoreNulls)` over a
  * cumulative frame). One shuffle on the key, one sort, zero row
  * amplification — this survives 100× scale where an inequality join
  * (BNLJ or range-bucketed) explodes. At equal ts the right row sorts
  * first, so `r.ts == l.ts` matches (ASOF >= semantics).
  */
object AsofJoin {

  def asofBackward(left: DataFrame, right: DataFrame,
                   key: String, ts: String): DataFrame = {
    val rPayCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    val rStruct = struct(col(ts).as("__rts") +: rPayCols.map(col): _*)
    val r = right.select(col(key), col(ts), rStruct.as("__r"), lit(0).as("__side"))

    val lPayCols = left.columns.filterNot(c => c == key || c == ts).toSeq
    val lStruct = struct(lPayCols.map(col): _*)
    val l = left.select(col(key), col(ts),
      lit(null).cast(r.schema("__r").dataType).as("__r"), lit(1).as("__side"),
      lStruct.as("__l"))
    val rWithL = r.withColumn("__l",
      lit(null).cast(l.schema("__l").dataType))

    val unioned = l.unionByName(rWithL)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val lOut = lPayCols.map(c => col("__l").getField(c).as(c))
    val rOut = col("__match").getField("__rts").as(s"${ts}_right") +:
      rPayCols.map(c => col("__match").getField(c).as(c))
    carried.select(col(key) +: col(ts).as(ts) +: (lOut ++ rOut): _*)
  }
}
