package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * Computed straight from the digest bytes by the codegen'd
    * [[graft.plans.Md5Hash60]] (value-identical to the composed
    * conv∘substring∘md5 chain — TextFnsSpec pins the parity).
    */
  def portableHash(c: Column): Column =
    org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.Md5Hash60(org.apache.spark.sql.graftshim.Shim.exprOf(c)))

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

  /** Equi-join cardinality estimate from two count-min sketches built with
    * the SAME (width, depth) over the two join keys — the classic CM
    * inner-product estimator (Cormode & Muthukrishnan §4.2): for each
    * depth row, Σ_b cntA[b]·cntB[b] ≥ |A ⋈ B|, and the minimum over rows
    * is the estimate. One-sided like the point query: never an
    * underestimate, within εN_aN_b w.h.p. The planner-style use at scale:
    * size a prospective join (choose broadcast vs shuffle vs prefilter)
    * from two tiny standing sketches WITHOUT touching either table.
    * Output: one row (est). Exact integers — oracle-replayable including
    * the collision regime. `depth` must match the builds: a depth row
    * whose bucket sets don't intersect has inner product 0 — it vanishes
    * from the bucket equi-join, so it must force the estimate to 0 rather
    * than silently dropping out of the min.
    */
  def countMinJoinSize(a: DataFrame, b: DataFrame, depth: Int): DataFrame = {
    require(depth > 0, "depth must be positive")
    // cell products reach (rows_a/width)·(rows_b/width) per bucket and the
    // row sum approaches rows_a·rows_b — far past int64 on big tables:
    // accumulate in exact decimal(38,0), return the estimate as decimal
    // cast back to long only when it fits (cap at Long.MaxValue otherwise)
    a.join(b.withColumnsRenamed(Map("cnt" -> "__cb")), Seq("d", "b"))
      .groupBy("d")
      .agg(sum(col("cnt").cast("decimal(38,0)") * col("__cb")).as("__ip"))
      .agg(when(count(lit(1)) === depth,
          least(min("__ip"), lit(Long.MaxValue).cast("decimal(38,0)")))
        .otherwise(lit(0L)).cast("long").as("est"))
  }

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

  // -------------------------------------------------------------------
  // per-group mergeable quantile sketch — the rank/quantile sibling of
  // [[countMin]] (frequencies) and [[hllByGroup]] (cardinalities). A
  // KLL-shaped compactor sketch (Karnin, Lang & Liberty, "Optimal quantile
  // approximation in streams", FOCS 2016) with two deliberate divergences:
  // uniform per-level capacity k (the Manku/Rajagopalan/Lindsay MRL
  // variant — rank error O(log(n/k)/k) instead of KLL's O(1/k)) and
  // DETERMINISTIC halving (keep even local positions) instead of a random
  // coin, so the sketch is a pure function of its input multiset and
  // replays bit-identically under any partitioning, merge order, or
  // engine — the repo-wide determinism contract the float/randomized
  // formulations can't meet.
  //
  // Representation: plain rows (grpCols..., lvl, v, w) with w = 2^lvl —
  // the weighted-point table IS the summary: it survives as parquet
  // between pipeline runs and merge = union + recompaction, no opaque
  // blob. Scale shape: the first compaction of level 0 is one per-group
  // sort pass (what a single exact quantile costs anyway); every later
  // round touches only overfull levels (≤ k·levels rows per group), and
  // batch updates fold into the standing sketch WITHOUT re-reading prior
  // batches — that mergeability is the point at 100 TB. Below k points
  // per group no compaction fires and estimates are exact order
  // statistics (the q_qsketch oracle regime, like hll's coupon regime).
  // -------------------------------------------------------------------

  /** Build one quantile sketch per group over `value`: rows
    * (grpCols..., lvl, v, w). NULL values are not counted. `k` ≥ 2 is the
    * per-level capacity; groups with ≤ k values are represented exactly.
    */
  def quantileSketchByGroup(df: DataFrame, grpCols: Seq[String],
                            value: Column, k: Int): DataFrame = {
    require(k >= 2, "per-level capacity k must be >= 2")
    compactLevels(
      df.select((grpCols.map(col) :+ value.cast("double").as("v")): _*)
        .where(col("v").isNotNull)
        .withColumn("lvl", lit(0))
        .withColumn("w", lit(1L)),
      grpCols, k)
  }

  /** Merge two sketch tables built with the SAME k over the same group
    * columns: union + recompaction. Weights are preserved exactly, so a
    * merged sketch summarizes the union multiset; in the exact regime
    * (combined level-0 count still ≤ k) merge is lossless.
    */
  def quantileSketchMerge(a: DataFrame, b: DataFrame, grpCols: Seq[String],
                          k: Int): DataFrame =
    compactLevels(a.unionByName(b), grpCols, k)

  /** Halve every (group, lvl) holding more than k points until none does.
    * One deterministic compaction: sort the level by v (ties by arrival
    * weight — any order of equal v is the same multiset), leave the first
    * cnt%2 points in place, promote every second remaining point with
    * doubled weight. Total weight is conserved exactly. Each round is a
    * bounded driver probe + one window pass over the overfull levels only;
    * rounds ≤ ~2·log2(maxGroupN/k) (each round halves an overfull level,
    * cascades promote upward), hard-capped at 64.
    */
  private def compactLevels(sk0: DataFrame, grpCols: Seq[String],
                            k: Int): DataFrame = {
    val gl = grpCols :+ "lvl"
    var sk = sk0
    var rounds = 0
    var stale = Set.empty[Int]
    while ({
      val over = sk.groupBy(gl.map(col): _*)
        .agg(count(lit(1)).as("__cnt")).where(col("__cnt") > k)
      val any = !over.isEmpty
      if (any) {
        require(rounds < 64, "quantile sketch compaction did not converge")
        val marked = sk.join(
          over.withColumn("__over", lit(true)).drop("__cnt"),
          gl, "left")
        val keepAsIs = marked.where(col("__over").isNull).drop("__over")
        val win = Window.partitionBy(gl.map(col): _*).orderBy(col("v"))
        val halved = marked.where(col("__over").isNotNull)
          .withColumn("__rn", row_number().over(win))
          .withColumn("__cnt", count(lit(1)).over(
            Window.partitionBy(gl.map(col): _*)))
          // first cnt%2 points stay at this level (weight conservation);
          // of the rest, even local positions promote at double weight
          .withColumn("__off", col("__cnt") % 2)
          .where(col("__rn") <= col("__off") ||
            (col("__rn") - col("__off")) % 2 === 0)
          .withColumn("lvl",
            when(col("__rn") <= col("__off"), col("lvl"))
              .otherwise(col("lvl") + 1))
          .withColumn("w",
            when(col("__rn") <= col("__off"), col("w"))
              .otherwise(col("w") * 2))
          .drop("__over", "__rn", "__cnt", "__off")
        // truncate lineage each round: the loop otherwise nests a
        // join+window per round (the labelPropagation lesson)
        val sc = sk.sparkSession.sparkContext
        val pre = sc.getPersistentRDDs.keySet.toSet
        sk = keepAsIs.unionByName(halved).localCheckpoint()
        stale.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
        stale = sc.getPersistentRDDs.keySet.toSet -- pre
        rounds += 1
      }
      any
    }) ()
    if (stale.nonEmpty) {
      val sc = sk.sparkSession.sparkContext
      graft.ml.Dedup.trackRelease(() =>
        stale.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))))
    }
    sk
  }

  /** Weighted type-1 quantile estimates from a sketch table: for each
    * basis-point target q = bp/10000, the smallest v whose cumulative
    * weight reaches ⌈bp·W/10000⌉ (W = the group's total weight). The rank
    * target is computed in INTEGER arithmetic — `(bp·W + 9999) div 10000`
    * — so there is no float-rounding seam between engines, and in the
    * exact regime (all w = 1) the estimate IS the order statistic a SQL
    * oracle computes from row_number. Output: (grpCols..., q, est).
    */
  def quantileEstimate(sketch: DataFrame, grpCols: Seq[String],
                       qsBp: Seq[Int]): DataFrame = {
    require(qsBp.nonEmpty && qsBp.forall(bp => bp > 0 && bp <= 10000),
      "quantile basis points must be in (0, 10000]")
    val byV = sketch.groupBy((grpCols.map(col) :+ col("v")): _*)
      .agg(sum(col("w")).as("__wv"))
    val grpWin = Window.partitionBy(grpCols.map(col): _*)
    val cum = byV
      .withColumn("__cw", sum(col("__wv")).over(grpWin.orderBy(col("v"))))
      .withColumn("__tw", sum(col("__wv")).over(grpWin))
    cum.select((grpCols.map(col) :+ col("v") :+ col("__cw") :+
        explode(array(qsBp.map(bp => lit(bp)): _*)).as("__bp") :+
        col("__tw")): _*)
      .where(col("__cw") >= expr("(__bp * __tw + 9999L) div 10000L"))
      .groupBy((grpCols.map(col) :+
        (col("__bp") / 10000.0).as("q")): _*)
      .agg(min(col("v")).as("est"))
  }
}
