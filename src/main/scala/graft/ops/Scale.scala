package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-engineering helpers: skew mitigation and storage-level co-location.
  * None of these change results — only physical distribution. They encode the
  * three standard answers to "this shuffle is the bottleneck at 100 TB":
  * salt the hot keys, pre-bucket the join, or two-phase the aggregation.
  */
object Scale {

  /** Spread rows across the full parallelism before CPU-heavy per-row work
    * (shingling, hashing, scoring) when the input is small enough that the
    * scan can't feed every core — e.g. one small parquet row group, which
    * would otherwise pin the whole pass to a single thread. Decided from
    * Catalyst size statistics only (no `df.rdd`, which under AQE would
    * eagerly materialize upstream stages). When the input is big — the
    * 100 TB case, where an exchange of the raw rows would be the real
    * cost — this is a no-op and the source's own parallelism is trusted.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // < ~4 MB per core: the exchange is trivially cheap and the CPU win is
    // large; above that, assume the source already splits
    if (bytes < BigInt(target) * (4L << 20)) df.repartition(target) else df
  }

  /** Two-phase ("salted") aggregation for skewed group keys: rows are spread
    * over `saltFactor` sub-groups (deterministic hash of the whole row via a
    * stable column set), partially aggregated, then finally aggregated. Use
    * when one group holds a large share of all rows and a single reducer
    * would bottleneck — the partial shrinks each salt bucket map-side.
    *
    * `partials` are (name, partialAgg, finalAgg) triples, e.g.
    * (("s", sum(c), sum(col("s"))): partial sums then sum-of-sums.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                saltOn: Seq[Column])
               (partials: Seq[(String, Column, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltOn: _*), lit(saltFactor)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
           partials.tail.map { case (n, p, _) => p.as(n) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(partials.head._3.as(partials.head._1),
           partials.tail.map { case (n, _, f) => f.as(n) }: _*)
  }

  /** Skew-join by replicating the small side: the big side gets a
    * deterministic salt in [0, saltFactor); the small side is exploded
    * `saltFactor`× so every (key, salt) bucket finds its match. Turns one hot
    * reducer into `saltFactor` even ones at the cost of replicating the
    * small side. (AQE's skew-join handles moderate skew automatically; this
    * is the explicit form for pathological keys.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, how: String = "inner"): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallExploded, Seq(key, "__salt"), how).drop("__salt")
  }

  /** Write a table bucketed+sorted by join key. Two tables bucketed the same
    * way join with NO exchange and NO sort (bucket-local SMJ) — the
    * co-located-join answer for repeated large joins. Requires saveAsTable
    * (bucket metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Write partitioned by a low-cardinality column: queries filtering on it
    * prune whole directories (partition pruning, no file reads at all).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Deterministic global shuffle for training-data ordering: a total sort
    * by `xxhash64(key, seed)` (key as tie-break). Plans as a
    * range-partitioned sort — every partition sorts its slice, no single
    * reducer — and the permutation is a pure function of (key, seed), so
    * re-runs, retried stages, and resumed jobs all see the same order.
    * `orderBy(rand())` gives none of those guarantees.
    */
  def shuffleRows(df: DataFrame, idCol: String, seed: Long = 42L): DataFrame =
    df.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
}
