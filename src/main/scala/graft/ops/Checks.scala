package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations for pipeline gates (the dbt-test / dplyr
  * `validate` role; extension — the reference has no check layer). Each
  * check returns VIOLATION COUNTS, not booleans, so a gate can log, alert
  * on a threshold, or hard-fail; and each is a single aggregate (or one
  * aggregate per key set for uniqueness), never a collect of offending
  * rows — at 100 TB the offender dump is a separate filtered write the
  * caller runs only after a nonzero count.
  */
object Checks {

  /** Rows whose `cols` tuple occurs more than once (total occurrences in
    * excess of one per distinct tuple; NULL-containing tuples count like
    * any other — SQL distinctness). One groupBy pass.
    */
  def duplicateKeyCount(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
      // coalesce: sum over ZERO groups (empty input) is NULL, which would
      // make a `duplicate_rows === 0` gate fail and a `> 0` alarm silently
      // pass on empty data
      .agg(coalesce(sum("__n") - count(lit(1)), lit(0L))
        .cast("long").as("duplicate_rows"))

  /** NULL count per named column, one pass, one output row. */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      sum(when(col(cols.head).isNull, 1L).otherwise(0L)).as(s"${cols.head}_nulls"),
      cols.tail.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls")): _*)

  /** Rows where `c` falls outside [lo, hi] (NULLs are not violations —
    * pair with [[nullCounts]]). */
  def outOfRangeCount(df: DataFrame, c: Column, lo: Column, hi: Column): DataFrame =
    df.agg(sum(when(c.isNotNull && (c < lo || c > hi), 1L).otherwise(0L))
      .cast("long").as("out_of_range"))

  /** Referential integrity: rows of `child` whose `childKey` has no match
    * in `parent.parentKey` (NULL child keys are not violations, matching
    * SQL FK semantics). Plans as an aggregate over a left anti join —
    * broadcast when the parent's distinct keys are small.
    */
  def orphanCount(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame =
    child.where(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).cast("long").as("orphans"))

  /** All-in-one pipeline gate: one row with every violation count. The
    * independent aggregates stay separate jobs by design — each is a
    * map-side-combinable pass and Spark schedules them concurrently when
    * the caller collects the crossJoined row.
    */
  def gate(df: DataFrame, uniqueKey: Seq[String], notNull: Seq[String]): DataFrame =
    duplicateKeyCount(df, uniqueKey).crossJoin(nullCounts(df, notNull))
}
