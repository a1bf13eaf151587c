package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins via coarse bucketing — the scale-safe alternative
  * to an inequality theta join, which Spark can only plan as a broadcast
  * nested loop. Not in the reference (its join surface is equi/cross only);
  * built as an extension alongside [[AsofJoin]].
  *
  * Both operators replace the inequality predicate with an equi-join on a
  * coarse bucket of the range domain plus an exact post-filter: candidate
  * volume is (range length / bucketWidth + 1) replicas per interval instead
  * of |left| × |right|. Pick `bucketWidth` near the median interval length:
  * wider buckets mean fewer interval replicas but more false candidates for
  * the post-filter; either way the join stays a shuffled hash join on the
  * bucket key and survives a 100× scale-up.
  */
object RangeJoin {

  /** Exact integral bucket id. `floor(col / width)` would divide in DOUBLE:
    * epoch-nanosecond longs exceed 2^53, so values near a bucket boundary
    * could land in the wrong bucket — a silently MISSED pair (the
    * post-filter removes false positives but cannot recover false
    * negatives). `div` is 64-bit integer division; truncation (vs floor) is
    * monotone, so the interval's bucket range always covers every contained
    * point's bucket, for negative domains too. Range columns are
    * canonicalized through [[graft.functions.Fns.Dt.toNanos]]: TIMESTAMP /
    * NTZ / DATE become nanos-since-epoch (bucketWidth is then in nanos),
    * integral columns keep the caller's units.
    */
  private def ns(name: String) = graft.functions.Fns.Dt.toNanos(col(name))

  private def bucketOf(name: String, width: Long) = {
    import org.apache.spark.sql.graftshim.Shim
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    Shim.columnOf(IntegralDivide(Shim.exprOf(ns(name)), Literal(width)))
  }

  /** Covering-bucket array for an interval, guarded:
    * - NULL bounds or an inverted interval (start > end) yield no buckets —
    *   the row drops, matching "contains nothing" semantics;
    * - an interval spanning more than `maxBuckets` buckets raises at
    *   runtime instead of materializing an unbounded array (an open-ended
    *   sentinel end like Long.MaxValue would otherwise build a multi-GB
    *   array per row) — widen bucketWidth or clamp the interval.
    */
  private def bucketsFor(startCol: String, endCol: String, width: Long,
                         maxBuckets: Int) = {
    val sb = bucketOf(startCol, width)
    val eb = bucketOf(endCol, width)
    val n = eb - sb + lit(1L)
    when(coalesce(n, lit(0L)) < 1, lit(null).cast("array<bigint>"))
      .when(n <= maxBuckets, sequence(sb, eb))
      .otherwise(raise_error(concat(
        lit("range_join: interval spans "), n.cast("string"),
        lit(s" buckets (max $maxBuckets); widen bucketWidth or clamp the interval")))
        .cast("array<bigint>"))
  }

  private def checkInputs(left: DataFrame, right: DataFrame, what: String): Unit = {
    (left.columns ++ right.columns).find(_ == "__b").foreach(_ =>
      throw new IllegalArgumentException(s"$what: inputs must not contain a '__b' column"))
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    if (shared.nonEmpty)
      throw new IllegalArgumentException(
        s"$what: input column names must be disjoint; shared: ${shared.mkString(", ")}")
  }

  /** Point-in-interval join: each `points` row pairs with every `intervals`
    * row whose [startCol, endCol] contains its `ptCol` (both ends
    * inclusive). Intervals explode to their covering buckets; a point lives
    * in exactly one bucket, so each qualifying pair is emitted exactly once
    * — no dedup pass. Column names of the two inputs must be disjoint.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, startCol: String, endCol: String,
                      bucketWidth: Long, maxBuckets: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    checkInputs(points, intervals, "pointInInterval")
    val pts = points.withColumn("__b", bucketOf(ptCol, bucketWidth))
    val ivs = intervals.withColumn("__b",
      explode(bucketsFor(startCol, endCol, bucketWidth, maxBuckets)))
    pts.join(ivs, Seq("__b"))
      .where(ns(ptCol) >= ns(startCol) && ns(ptCol) <= ns(endCol))
      .drop("__b")
  }

  /** Interval-overlap join: pairs a left and right row whenever their
    * closed intervals intersect. Both sides explode to covering buckets;
    * each overlapping pair is kept only in the bucket containing the
    * overlap's start (the later of the two starts), so no pair duplicates
    * and no dedup shuffle is needed.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucketWidth: Long, maxBuckets: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    checkInputs(left, right, "intervalOverlap")
    def banded(df: DataFrame, s: String, e: String) = df.withColumn("__b",
      explode(bucketsFor(s, e, bucketWidth, maxBuckets)))
    val overlapStartBucket = {
      import org.apache.spark.sql.graftshim.Shim
      import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
      Shim.columnOf(IntegralDivide(
        Shim.exprOf(greatest(ns(lStart), ns(rStart))), Literal(bucketWidth)))
    }
    banded(left, lStart, lEnd).join(banded(right, rStart, rEnd), Seq("__b"))
      .where(ns(lStart) <= ns(rEnd) && ns(rStart) <= ns(lEnd) &&
        col("__b") === overlapStartBucket)
      .drop("__b")
  }
}
