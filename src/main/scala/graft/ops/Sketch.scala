package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms 2005)
  * as a tiny DataFrame: one row per non-empty (row, bucket) cell of the
  * depth×width counter matrix. Reference scope: siuba has none of this —
  * it belongs to the training-data curation extension layer (frequency
  * triage over token/domain/user streams too wide for an exact groupBy
  * result to be consumed downstream).
  *
  * Why a DataFrame and not an opaque binary blob: the cell table IS the
  * mergeable summary (merge = union + sum — counters are additive), it
  * survives as plain parquet between pipeline runs, and both build and
  * probe stay whole-stage-codegen DataFrame ops.
  *
  * Scale shape: the build explodes each key `depth` times map-side, but the
  * hash-aggregate partials collapse every partition to ≤ depth×width cells
  * before the ONLY shuffle — at 100 TB the exchange carries
  * O(depth×width×partitions) counter rows, never data rows. The probe
  * broadcasts the sketch (bounded by depth×width cells, a few KB) into the
  * key table: map-side only.
  *
  * Estimates are the classic one-sided guarantee: est ≥ true count, and
  * est ≤ true + εN with probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  * Hashing is the repo's portable 60-bit md5 leaf, so a DuckDB replay
  * reproduces every bucket — including collisions — exactly
  * (q_count_min's oracle regime).
  */
object Sketch {

  /** The portable 60-bit md5 hash shared with the DuckDB oracles:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)` on the other side.
    * Nonnegative (60 bits), so `%` and `pmod` agree across engines.
    */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def bucket(d: Column, k: Column, width: Int): Column =
    pmod(portableHash(concat(d.cast("string"), lit("|"), k)), lit(width))

  /** Build the sketch over `key`: one pass, one counter-row shuffle.
    * NULL keys are not counted (SQL aggregate convention). Output:
    * (d, b, cnt) — row `d`'s bucket `b` holds `cnt`.
    */
  def countMin(df: DataFrame, key: Column, width: Int, depth: Int): DataFrame = {
    require(width > 0, "width must be positive")
    require(depth > 0, "depth must be positive")
    df.select(key.cast("string").as("__k"))
      .where(col("__k").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("d"), col("__k"))
      .groupBy(col("d"), bucket(col("d"), col("__k"), width).as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query estimates for the distinct values of `key` in `keys`:
    * min over the `depth` rows of each key's bucket counters. The sketch
    * side is bounded (depth×width cells) and broadcast — the probe never
    * shuffles the key table. `width`/`depth` must match the build.
    * Output: (k, est); keys absent from the stream estimate ≥ 0 (collision
    * mass), never null.
    */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, key: Column,
                       width: Int, depth: Int): DataFrame =
    keys.select(key.cast("string").as("k"))
      .where(col("k").isNotNull).distinct()
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("b", bucket(col("d"), col("k"), width))
      .join(broadcast(sketch), Seq("d", "b"), "left")
      .groupBy("k")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Merge two sketches built with the SAME (width, depth): counters are
    * additive, so merge = cell-wise sum. The incremental-stats sibling of
    * `Search.bm25StatsMerge` — batch N's sketch folds into the standing one
    * without touching batch 1..N-1's data.
    */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("d", "b").agg(sum("cnt").as("cnt"))

  // -------------------------------------------------------------------
  // per-group HLL cardinality summaries (Apache DataSketches via Spark's
  // hll_sketch_agg family) — the distinct-count sibling of [[countMin]]:
  // one small binary sketch per group, persistable between pipeline runs
  // and mergeable across shards/batches without re-reading data. Below
  // ~2^lgK retained entries the DataSketches HLL is in its exact coupon
  // regime (estimates equal true distinct counts — the q_hll_groups
  // oracle regime); beyond that, relative error ~1.04/sqrt(2^lgK).
  // -------------------------------------------------------------------

  /** Build one HLL sketch per group over `key`: a single map-side-combined
    * aggregate pass; output (grpCols..., hll binary). */
  def hllByGroup(df: DataFrame, grpCols: Seq[String], key: Column,
                 lgK: Int = 12): DataFrame =
    df.groupBy(grpCols.map(col): _*)
      .agg(hll_sketch_agg(key, lit(lgK)).as("hll"))

  /** Merge two per-group sketch tables (same lgK): group-wise HLL union —
    * batch N's sketches fold into the standing table. */
  def hllMergeByGroup(a: DataFrame, b: DataFrame,
                      grpCols: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(grpCols.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))

  /** Read the estimates out of a per-group sketch table. */
  def hllEstimate(sketches: DataFrame, grpCols: Seq[String],
                  outCol: String = "nd"): DataFrame =
    sketches.select(
      (grpCols.map(col) :+ hll_sketch_estimate(col("hll")).as(outCol)): _*)
}
