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

  /** Execute an equi-join with the strategy [[Checks.joinAdvisor]]
    * recommends — the advisor made actionable. One deliberate pre-flight
    * pass profiles both sides (two count aggregates + two bounded
    * count-min sketches; the advisor never joins, sorts, or collects data
    * rows), then the join runs as:
    *   - `broadcast`      — hash join with the smaller side broadcast
    *   - `salted_shuffle` — [[saltedJoin]] with the hotter side salted
    *     `saltFactor` ways (its hot key's reducer split into even ones)
    *   - `shuffle`        — the plain hash-partitioned join
    * Results are strategy-invariant (ChecksSpec pins equality against the
    * plain join on both hot-key and uniform inputs); output columns are
    * (key, a-rest, b-rest) regardless of the chosen physical shape, so
    * callers never see the strategy. Inner join only: salting swaps which
    * side replicates, which would flip outer-join semantics. Column names
    * other than `key` must be distinct across the two sides.
    */
  def adaptiveJoin(a: DataFrame, b: DataFrame, key: String,
                   saltFactor: Int = 8,
                   width: Int = 1024, depth: Int = 3,
                   broadcastRows: Long = 1000000L,
                   hotShare: Double = 0.2): DataFrame = {
    val rec = Checks.joinAdvisor(a, col(key), b, col(key),
      width, depth, broadcastRows, hotShare).head()
    adaptiveJoinWith(a, b, key, rec, saltFactor)
  }

  /** [[adaptiveJoin]] from a PRECOMPUTED advisor row — the zero-marginal-
    * scan form for repeated production joins: persist each side's
    * [[Checks.joinProfile]] once, derive the recommendation with
    * [[Checks.joinAdvisorFromProfiles]] (touches only the two one-row
    * profile tables), and every subsequent join pays no advisor scans at
    * all. Strategy choice and results are identical to the inline form by
    * construction (same thresholds, same executor — ChecksSpec pins it).
    */
  def adaptiveJoinFromStats(a: DataFrame, b: DataFrame, key: String,
                            profileA: DataFrame, profileB: DataFrame,
                            saltFactor: Int = 8, depth: Int = 3,
                            broadcastRows: Long = 1000000L,
                            hotShare: Double = 0.2): DataFrame =
    adaptiveJoinWith(a, b, key,
      Checks.joinAdvisorFromProfiles(profileA, profileB, depth,
        broadcastRows, hotShare).head(),
      saltFactor)

  /** Execute the join per an advisor row (a [[Checks.joinAdvisor]] /
    * [[Checks.joinAdvisorFromProfiles]] result — or that row persisted and
    * read back). Fails fast on NULL stats (an EMPTY input side aggregates
    * to NULL n/max_share, and silent unboxing would make the side
    * selection arbitrary) and on duplicate non-key column names (the
    * output projection would hit an ambiguous reference later, far from
    * the cause).
    */
  def adaptiveJoinWith(a: DataFrame, b: DataFrame, key: String,
                       rec: org.apache.spark.sql.Row,
                       saltFactor: Int = 8): DataFrame = {
    val dup = a.columns.filterNot(_ == key)
      .intersect(b.columns.filterNot(_ == key))
    require(dup.isEmpty,
      s"adaptiveJoin: non-key columns must be distinct across sides; " +
        s"both have: ${dup.mkString(", ")}")
    val needed = Seq("n_a", "n_b", "max_share_a", "max_share_b", "strategy")
    val nulls = needed.filter(f => rec.isNullAt(rec.fieldIndex(f)))
    require(nulls.isEmpty,
      s"adaptiveJoin: advisor stats are NULL (${nulls.mkString(", ")}) — " +
        "an input side is empty; there is nothing to adapt (join it plainly)")
    val outCols = (key +: (a.columns.filterNot(_ == key) ++
      b.columns.filterNot(_ == key)).toSeq).map(col)
    val joined = rec.getAs[String]("strategy") match {
      case "broadcast" =>
        if (rec.getAs[Long]("n_b") <= rec.getAs[Long]("n_a"))
          a.join(broadcast(b), Seq(key))
        else broadcast(a).join(b, Seq(key))
      case "salted_shuffle" =>
        if (rec.getAs[Double]("max_share_a") >= rec.getAs[Double]("max_share_b"))
          saltedJoin(a, b, key, saltFactor)
        else saltedJoin(b, a, key, saltFactor)
      case _ => a.join(b, Seq(key))
    }
    joined.select(outCols: _*)
  }

  /** Coalesce to ~`targetPartitionBytes` per output partition before a
    * write — the small-files guard: a 32-partition shuffle writing 10 MB
    * total produces 32 tiny files that poison every later scan's task
    * scheduling. Partition count comes from Catalyst size stats (no
    * `df.rdd`, which would force physical planning eagerly under AQE);
    * `coalesce` only ever narrows, so an underestimate is a no-op, never an
    * extra shuffle.
    */
  def coalesceForWrite(df: DataFrame,
                       targetPartitionBytes: Long = 128L << 20): DataFrame = {
    require(targetPartitionBytes > 0, "targetPartitionBytes must be positive")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (bytes / targetPartitionBytes) + 1
    df.coalesce(n.min(BigInt(1 << 20)).toInt)
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

  /** Corpus snapshot diff — the versioning primitive behind incremental
    * re-curation (what changed between crawl N and crawl N+1 decides what
    * re-enters the pipeline): every id is classified `added` (new only),
    * `removed` (old only), `changed` (both, content fingerprint differs),
    * or `unchanged`. The fingerprint is the portable md5 of the content
    * columns joined with a U+0001 separator (multi-column safe; the same
    * leaf the dedup oracles replay), so the diff itself is deterministic
    * and engine-reproducible. NULL content columns are skipped by
    * concat_ws on BOTH engines — identically, so the oracle agrees, but
    * it means (NULL, "x") and ("x", NULL) fingerprint equal: coalesce
    * nullable content columns to a sentinel upstream if that distinction
    * matters.
    *
    * Scale shape: two map-only fingerprint projections + ONE hash
    * full-outer equi-join on the id — each snapshot is scanned once and
    * only (id, fingerprint) shuffles, never the content.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    def fp(df: DataFrame, side: String) = df.select(col(idCol),
      md5(concat_ws("\u0001", contentCols.map(col): _*)).as(s"__fp_$side"))
    fp(oldDf, "o").join(fp(newDf, "n"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fp_o").isNull, lit("added"))
          .when(col("__fp_n").isNull, lit("removed"))
          .when(col("__fp_o") === col("__fp_n"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Exact INCLUSIVE global cumulative sum of `valueCol` in `orderCols`
    * order, without the single-reducer `Window.orderBy(...)` trap: the naive
    * unpartitioned window funnels 100 TB through one task. Standard two-phase
    * prefix sum instead:
    *   1. range-partition by the order key (every partition holds a
    *      contiguous key range; parallelism preserved),
    *   2. per-partition totals (tiny: one row per partition) → exclusive
    *      partition offsets via a window over ≤ numPartitions rows,
    *   3. broadcast the offsets back and window-cumsum WITHIN each partition.
    * Deterministic when `orderCols` is a total order (range partitioning
    * never splits equal keys).
    *
    * The ranged table is CACHED (dedup registry — releasable via
    * [[graft.ml.Dedup.unpersistIntermediates]]) before the offsets
    * aggregate and the data join consume it: RangePartitioner's boundary
    * SAMPLING is per-exchange-instance, and the two consumers prune
    * different columns, so without the shared materialization ReuseExchange
    * does not fire and each branch can draw DIFFERENT boundaries — with
    * duplicate-heavy keys they then disagree on `spark_partition_id()` and
    * ranks corrupt silently (caught by the sorted-neighborhood join, whose
    * two rank consumers amplified the divergence). A single InMemoryRelation
    * carries one fixed partitioner even across block recomputes. Pass
    * `checkpointInput=true` (an eager localCheckpoint) additionally for
    * nondeterministic SOURCES (rand()-derived columns, non-checkpointed
    * samples).
    */
  def globalCumSum(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
                   outCol: String, numPartitions: Int = 0,
                   checkpointInput: Boolean = false): DataFrame =
    globalCumSums(df, orderCols, Seq(valueCol -> outCol), numPartitions,
      checkpointInput)

  /** [[globalCumSum]] for SEVERAL value columns in ONE ranged pass: the
    * range exchange, the per-partition offset micro-table, and the
    * broadcast join are shared, each value getting its own exact prefix
    * sum — per-value arithmetic is identical to running [[globalCumSum]]
    * once per pair (exact integer sums), at one exchange instead of N
    * (the PR sweep's cum_pos/cum_neg is the canonical consumer).
    */
  def globalCumSums(df: DataFrame, orderCols: Seq[Column],
                    values: Seq[(Column, String)], numPartitions: Int = 0,
                    checkpointInput: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(values.nonEmpty, "need at least one (valueCol, outCol) pair")
    val src = if (checkpointInput) df.localCheckpoint(true) else df
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sparkContext.defaultParallelism
    // Exact-equivalence note: sum over an ordered Window uses a RANGE
    // frame (ties share one value) while the operators below are per-row —
    // under the documented total-order contract there are no ties, and
    // with ties the Window form was already partition-split-dependent.
    // Double values follow SQL SUM (NULL skipped; NULL until the first
    // non-null) and are emitted as offset + partition-local running sum —
    // the same association the two-branch form produced, with a BETTER
    // determinism story (pass-1 totals add in sorted order, not cache
    // arrival order). Only unsupported types (decimal) keep the cached
    // two-branch Window form below.
    val supported = values.forall { case (v, _) =>
      df.select(v).schema.head.dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => true
        case _ => false
      }
    }
    if (supported) {
      // ONE operator does the whole two-phase sum over ONE exchange
      // instance (GlobalRunningSumExec: per-partition totals via a
      // micro-job over the same materialized shuffle, offsets folded in
      // as initial values) — the ranged relation is not cached, there is
      // no offsets aggregate, no broadcast, no join. Boundary consistency
      // is structural: both passes read the SAME exchange.
      org.apache.spark.sql.graftshim.PartitionPrefix.globalRunningSums(
        src.repartitionByRange(n, orderCols: _*), orderCols,
        values.map { case (v, out) => (v, out) })
    } else {
      // unsupported-type path (decimal): the classic cached two-branch
      // shape — the offsets aggregate and the data join must read ONE
      // materialized partitioning (RangePartitioner sampling is
      // per-exchange-instance)
      val parted = graft.ml.Dedup.trackCache(
        src.repartitionByRange(n, orderCols: _*)
          .withColumn("__pid", spark_partition_id()))
      val psums = values.zipWithIndex.map { case ((v, _), i) =>
        sum(v).as(s"__psum$i") }
      val offs0 = parted.groupBy("__pid").agg(psums.head, psums.tail: _*)
      val offs = values.zipWithIndex.foldLeft(offs0) { case (d, (_, i)) =>
        d.withColumn(s"__off$i",
          coalesce(sum(s"__psum$i").over(
            Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
      }.drop(values.indices.map(i => s"__psum$i"): _*)
      val joined = parted.join(broadcast(offs), "__pid")
      values.zipWithIndex.foldLeft(joined) { case (d, ((v, out), i)) =>
        d.withColumn(out,
          col(s"__off$i") + sum(v).over(
            Window.partitionBy("__pid").orderBy(orderCols: _*)))
      }.drop("__pid").drop(values.indices.map(i => s"__off$i"): _*)
    }
  }

  /** Approximate distinct-set overlap of two corpora on a key column (doc
    * fingerprints, ids, domains) via Theta sketches — the set-intersection
    * sketch HLL cannot provide. One row: n_a, n_b, n_intersection, n_union,
    * jaccard.
    *
    * Scale shape: ONE map-side-combinable aggregate pass per side; the two
    * few-KB..MB sketches meet in a 1×1 cross join. This is the "how much of
    * corpus B is already in corpus A" triage that runs BEFORE committing to
    * an exact anti-join dedup of 100 TB. Theta sketches are EXACT below
    * 2^lgK retained entries (estimates equal true distinct counts — the
    * oracle regime of q_corpus_overlap); beyond that, relative error
    * ~1/sqrt(2^lgK).
    */
  def distinctOverlap(a: DataFrame, b: DataFrame, keyCol: String,
                      lgK: Int = 16): DataFrame = {
    val sa = a.agg(theta_sketch_agg(col(keyCol), lgK).as("sa"))
    val sb = b.agg(theta_sketch_agg(col(keyCol), lgK).as("sb"))
    sa.crossJoin(sb).select(
      theta_sketch_estimate(col("sa")).as("n_a"),
      theta_sketch_estimate(col("sb")).as("n_b"),
      theta_sketch_estimate(theta_intersection(col("sa"), col("sb")))
        .as("n_intersection"),
      // pass lgK through: the two-arg theta_union builds its result at the
      // DEFAULT lgK (12), silently downgrading exact inputs to estimation
      // once the union tops 4096 entries (caught by the sf0.1 oracle)
      theta_sketch_estimate(theta_union(col("sa"), col("sb"), lgK)).as("n_union"))
      .withColumn("jaccard",
        round(col("n_intersection").cast("double") / col("n_union"), 4))
  }

  /** Exact global 1-based row number in `orderCols` order — [[globalCumSum]]
    * of 1 — for stable ordinals over arbitrarily large data. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column],
                      outCol: String = "rn", numPartitions: Int = 0): DataFrame =
    globalCumSum(df, orderCols, lit(1L), outCol, numPartitions)

  /** PER-GROUP exact inclusive cumulative sum in ONE range-partition pass —
    * the grouped sibling of [[globalCumSum]]. The naive
    * `Window.partitionBy(grp).orderBy(...)` funnels each group through a
    * single reducer (fatal when a group holds a large share of 100 TB);
    * N separate [[globalCumSum]] calls (one per group) re-shuffle the data
    * N times. This does neither: range-partition ONCE by (grp, order) — each
    * partition holds a contiguous slice of one-or-more groups — then compute
    * per-(partition, group) totals (a micro-table of ≤ partitions × groups
    * rows), window them into exclusive offsets per (partition, group), and
    * broadcast back. Hot groups span many partitions; tiny groups share one.
    *
    * Same determinism contract as [[globalCumSum]]: the input subtree is
    * evaluated twice, so nondeterministic sources need
    * `checkpointInput = true`; (grp, order) should be a total order.
    */
  def groupedCumSum(df: DataFrame, grpCols: Seq[String], orderCols: Seq[Column],
                    valueCol: Column, outCol: String, numPartitions: Int = 0,
                    checkpointInput: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (grpCols.isEmpty)
      return globalCumSum(df, orderCols, valueCol, outCol, numPartitions,
        checkpointInput)
    val src = if (checkpointInput) df.localCheckpoint(true) else df
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sparkContext.defaultParallelism
    val supported = df.select(valueCol).schema.head.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => true
      case _ => false
    }
    if (supported) {
      // ONE operator over ONE range exchange (GroupedRunningSumExec): the
      // group tuple is a PREFIX of the range-partition key, so each
      // group's rows are contiguous across the partition sequence and
      // cross-partition offsets exist only for each partition's FIRST
      // group — collected as boundary-group sums (2 keys per partition,
      // not the old ≤ partitions × groups offsets micro-table) and fixed
      // up on the driver. No cache, no broadcast join; boundary
      // consistency is structural (both passes read the same exchange).
      org.apache.spark.sql.graftshim.PartitionPrefix.groupedRunningSums(
        src.repartitionByRange(n, (grpCols.map(col) ++ orderCols): _*),
        grpCols.map(col) ++ orderCols, grpCols.map(col),
        Seq((valueCol, outCol)))
        .select((df.columns.map(col) :+ col(outCol)): _*)
    } else {
      // unsupported-type path (decimal): the classic cached two-branch
      // shape — the offsets aggregate and the data join must read ONE
      // materialized partitioning
      val parted = graft.ml.Dedup.trackCache(src
        .repartitionByRange(n, (grpCols.map(col) ++ orderCols): _*)
        .withColumn("__pid", spark_partition_id()))
      // micro-table: one row per (partition, group) — the only windows
      // below run over it, never over the data
      val offs = parted.groupBy(("__pid" +: grpCols).map(col): _*)
        .agg(sum(valueCol).as("__psum"))
        .withColumn("__off",
          coalesce(sum("__psum").over(
            Window.partitionBy(grpCols.map(col): _*).orderBy("__pid")
              .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .drop("__psum")
      parted.join(broadcast(offs), "__pid" +: grpCols)
        .withColumn(outCol,
          col("__off") + sum(valueCol).over(
            Window.partitionBy(("__pid" +: grpCols).map(col): _*)
              .orderBy(orderCols: _*)))
        // the using-join hoisted the key columns to the front; restore the
        // caller's column order (same contract as globalCumSum)
        .select((df.columns.map(col) :+ col(outCol)): _*)
    }
  }

  /** Exact per-group 1-based row number — [[groupedCumSum]] of 1. */
  def globalRowNumberBy(df: DataFrame, grpCols: Seq[String],
                        orderCols: Seq[Column], outCol: String = "rn",
                        numPartitions: Int = 0): DataFrame =
    groupedCumSum(df, grpCols, orderCols, lit(1L), outCol, numPartitions)

  /** Per-group equal-depth quantile buckets at scale: bucket
    * b = ⌊(rank−1) · nBuckets / n_group⌋ over the group's `orderCols`
    * order — the deterministic, engine-replayable sibling of a per-group
    * `ntile` (same equal-depth intent; remainder rows land by the floor
    * arithmetic rather than ntile's front-loading, so the bucket of every
    * row is a pure integer function of (rank, group size)). The rank is
    * [[groupedCumSum]]'s range-partitioned two-phase prefix sum, NOT a
    * per-group window — with a handful of groups over 100 TB the naive
    * `Window.partitionBy(grp)` funnels each group through one reducer.
    * Group sizes come from one count aggregate joined back on the group
    * key. `orderCols` + group should form a total order (tie-break on a
    * key column) or bucket boundaries are nondeterministic.
    *
    * The training-data use is CCNet's head/middle/tail split: rank
    * documents by LM score within each language and keep/weight by
    * perplexity bucket (q_ccnet_buckets).
    */
  def quantileBuckets(df: DataFrame, grpCols: Seq[String],
                      orderCols: Seq[Column], nBuckets: Int,
                      outCol: String = "bucket"): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val ranked = groupedCumSum(df, grpCols, orderCols, lit(1L), "__qb_rk")
    val sizes = df.groupBy(grpCols.map(col): _*)
      .agg(count(lit(1)).as("__qb_n"))
    ranked.join(sizes, grpCols)
      .withColumn(outCol, expr(s"((__qb_rk - 1) * $nBuckets) div __qb_n"))
      // the using-join hoisted the group keys to the front; restore the
      // caller's column order (groupedCumSum's contract)
      .select((df.columns.map(col) :+ col(outCol)): _*)
  }

  /** The per-group bucket BOUNDARIES of a [[quantileBuckets]] split — the
    * train-once artifact of quantile bucketing (CCNet's serving shape:
    * perplexity cutoffs are computed once on a reference corpus, then
    * every future document is assigned by comparison, never by re-ranking
    * the corpus). One row per (group, bucket 1..nBuckets−1): the MINIMUM
    * `valueCol` among the rows the rank split put in that bucket. Assign
    * new rows with [[assignByBoundaries]]; persist the tiny relation as
    * parquet for streams and later batches. Note the one semantic seam of
    * boundary serving: the rank split breaks value ties by `orderCols`'
    * trailing tie-breakers, so tied-at-the-boundary TRAINING rows can sit
    * on both sides; assignment by comparison puts every tied future row
    * in the upper bucket. Groups smaller than nBuckets simply emit fewer
    * boundaries.
    */
  def quantileBoundaries(df: DataFrame, grpCols: Seq[String],
                         orderCols: Seq[Column], valueCol: Column,
                         nBuckets: Int): DataFrame = {
    val b = quantileBuckets(df, grpCols, orderCols, nBuckets, "__qb_b")
    b.filter(col("__qb_b") >= 1)
      .groupBy((grpCols.map(col) :+ col("__qb_b").as("bucket")): _*)
      .agg(min(valueCol).as("boundary"))
  }

  /** Assign rows to buckets against a frozen [[quantileBoundaries]]
    * relation: bucket = number of the group's boundaries ≤ the row's
    * value (0 = below every boundary). One equi-join on the group keys
    * (the boundary side is (nBuckets−1) rows per group — broadcast-sized
    * by construction) + one count aggregate; rows of groups with no
    * boundaries get bucket 0. Exact comparisons on the caller's value —
    * round it to the cross-engine precision first if it came from a
    * transcendental ([[graft.text.Lm]] scores round to 6dp).
    */
  def assignByBoundaries(df: DataFrame, grpCols: Seq[String],
                         valueCol: Column, boundaries: DataFrame,
                         outCol: String = "bucket"): DataFrame = {
    val bc = org.apache.spark.sql.functions.broadcast(
      boundaries.select((grpCols.map(col) :+ col("boundary")): _*))
    df.join(bc, grpCols, "left")
      .groupBy(df.columns.map(col): _*)
      .agg(coalesce(sum(when(col("boundary") <= valueCol, 1L)), lit(0L))
        .as(outCol))
  }

  /** Pack rows into shards of ~`budget` total `sizeCol` (token-budget shard
    * packing for pretraining corpora): shard = floor(exclusive_cumsum /
    * budget) in `orderCols` order. A row straddling a budget boundary stays
    * in the earlier shard (shards can overflow by at most one row — the
    * contiguous-greedy packing every sequential writer uses). Scales via the
    * two-phase prefix sum; no global window.
    */
  def packByBudget(df: DataFrame, orderCols: Seq[Column], sizeCol: Column,
                   budget: Long, shardCol: String = "shard"): DataFrame = {
    require(budget > 0, "budget must be positive")
    globalCumSum(df, orderCols, sizeCol, "__cum")
      .withColumn(shardCol,
        floor((col("__cum") - sizeCol).cast("double") / budget).cast("long"))
      .drop("__cum")
  }

  /** Pack tokenized documents into fixed-length training sequences
    * (concat-and-split: tokens are laid end to end in `orderCols` order and
    * cut every `seqLen`). One output row per (document, sequence) segment:
    *   - `seq_id`: which training sequence the segment lands in,
    *   - `tok_start`/`tok_end`: the [start, end) token span WITHIN the doc,
    *   - `seq_off`: where the segment begins inside the sequence.
    * A document crossing a cut contributes one row per sequence it touches
    * (ceil(len/seqLen)+1 worst case), so every sequence is exactly full and
    * segment spans reconstruct each document — the standard pretraining
    * data layout. All arithmetic is exact integer (div, not float floor).
    * Scales via the two-phase prefix sum; no global window.
    */
  def packSequences(df: DataFrame, orderCols: Seq[Column], nTokCol: Column,
                    seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    globalCumSum(df, orderCols, nTokCol, "__cum")
      .withColumn("__start", col("__cum") - nTokCol)
      .where(nTokCol > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"__start div $seqLen"),
        expr(s"(__cum - 1) div $seqLen"))))
      .withColumn("tok_start",
        greatest(col("seq_id") * seqLen, col("__start")) - col("__start"))
      .withColumn("tok_end",
        least((col("seq_id") + 1) * seqLen, col("__cum")) - col("__start"))
      .withColumn("seq_off",
        greatest(col("seq_id") * seqLen, col("__start")) - col("seq_id") * seqLen)
      .drop("__cum", "__start")
  }

  /** Per-shard MANIFEST of a packed corpus ([[packByBudget]] output) —
    * the artifact a training run's dataloader reads instead of listing
    * files: one row per shard with row and token counts, the id range
    * (shards are contiguous in pack order, so [min_id, max_id] IS the
    * shard's key interval), and an order-free content fingerprint —
    * BIT_XOR of per-row 60-bit md5 leaves (`fpCol`, typically
    * [[graft.ops.Sketch.portableHash]] of the content column), exact and
    * engine-replayable, so two manifests diff shard-by-shard without
    * reading data (the snapshot-diff idea applied at shard granularity).
    * One hash aggregate over the packed relation; nothing else.
    */
  def shardManifest(packed: DataFrame, shardCol: String, idCol: String,
                    sizeCol: Column, fpCol: Column): DataFrame =
    packed
      .select(col(shardCol), col(idCol), sizeCol.as("__sz"),
        fpCol.cast("long").as("__fp"))
      .groupBy(shardCol)
      .agg(count(lit(1)).as("n_rows"),
        sum("__sz").as("n_tokens"),
        min(idCol).as("min_id"), max(idCol).as("max_id"),
        expr("bit_xor(__fp)").as("fingerprint"))

  /** Merge [[shardManifest]] parts built over disjoint row sets into the
    * manifest of their union — every column is a mergeable sufficient
    * statistic (sums, min/max, XOR), so manifests maintain INCREMENTALLY:
    * manifest(old ∪ batch) = merge(manifest(old), manifest(batch)) with
    * no re-read of old data (ScaleSpec pins bit-equality with the
    * one-shot build). Micro-table work: inputs are one row per shard.
    */
  def mergeShardManifests(parts: Seq[DataFrame],
                          shardCol: String = "shard"): DataFrame = {
    require(parts.nonEmpty, "need at least one manifest part")
    parts.reduce(_.unionByName(_))
      .groupBy(shardCol)
      .agg(sum("n_rows").as("n_rows"), sum("n_tokens").as("n_tokens"),
        min("min_id").as("min_id"), max("max_id").as("max_id"),
        expr("bit_xor(fingerprint)").as("fingerprint"))
  }

  /** Diff two corpus versions from their [[shardManifest]]s ALONE — the
    * "manifests diff shard-by-shard without reading data" claim as a
    * verb: a full outer join of the two micro-tables classifies every
    * shard as `added` (absent from the old manifest), `removed` (absent
    * from the new), `changed` (content fingerprint, row count, or token
    * total moved — the XOR digest is order-free and exact, the row count
    * guards the XOR's one blind spot, paired duplicate insertions, and
    * the token total closes a second: an XOR collision with equal row
    * counts but different sizes), or `unchanged`. This is the [[snapshotDiff]] idea lifted to shard
    * granularity: deciding WHICH shards re-enter a curation pipeline
    * costs two manifest scans (one row per shard), not a pass over
    * 100 TB of corpus. Output: (shardCol, status, n_rows_old,
    * n_rows_new, n_tokens_old, n_tokens_new) — counts NULL on the
    * missing side, exactly [[snapshotDiff]]'s outer-join convention.
    * Oracled end to end (q_manifest_diff); ScaleSpec pins all four
    * statuses plus the row-count guard.
    */
  def manifestDiff(old: DataFrame, cur: DataFrame,
                   shardCol: String = "shard"): DataFrame = {
    def side(df: DataFrame, s: String) = df.select(col(shardCol),
      col("n_rows").as(s"n_rows_$s"), col("n_tokens").as(s"n_tokens_$s"),
      col("fingerprint").as(s"__fp_$s"))
    side(old, "old").join(side(cur, "new"), Seq(shardCol), "full_outer")
      .withColumn("status",
        when(col("__fp_old").isNull, lit("added"))
          .when(col("__fp_new").isNull, lit("removed"))
          .when(col("__fp_old") === col("__fp_new") &&
            col("n_rows_old") === col("n_rows_new") &&
            col("n_tokens_old") <=> col("n_tokens_new"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col(shardCol), col("status"), col("n_rows_old"),
        col("n_rows_new"), col("n_tokens_old"), col("n_tokens_new"))
  }

  /** Deterministic RESUMABLE epoch schedule over a [[shardManifest]] —
    * the artifact that turns "shards on disk" into "what each worker
    * reads, in what order, starting where": shards are permuted by the
    * portable md5 hash of (shard, seed) (a pure function — the same
    * seed always yields the same epoch order, on any cluster, any
    * partitioning, any engine), dealt round-robin to `nWorkers`
    * data-loader workers, and each worker's shards are numbered by
    * `step` with an exact cumulative `tok_offset` (tokens that worker
    * consumed BEFORE this shard). Resuming a crashed run at step k is a
    * FILTER (`step >= k`), not a replay: the schedule is derived, never
    * stored, so there is no state to lose — and `tok_offset` is the
    * exact sample-count skip a deterministic dataloader needs.
    * Output: (shardCol, n_tokens, worker, step, tok_offset).
    *
    * Scale shapes: one [[globalRowNumber]] two-phase rank over the
    * MANIFEST (one row per shard — micro next to the data) and one
    * per-worker [[groupedCumSum]]; nothing touches the packed corpus.
    * Oracled end to end (q_epoch_plan); ScaleSpec pins partition-count
    * bit-stability, seed sensitivity, and worker balance (round-robin:
    * per-worker shard counts differ by at most one).
    */
  def epochPlan(manifest: DataFrame, shardCol: String, seed: String,
                nWorkers: Int): DataFrame = {
    require(nWorkers >= 1, "nWorkers must be >= 1")
    val h = Sketch.portableHash(concat(col(shardCol).cast("string"),
      lit("|" + seed)))
    val ranked = globalRowNumber(
        manifest.select(col(shardCol), col("n_tokens")).withColumn("__h", h),
        Seq(col("__h"), col(shardCol)), "__rk")
      .withColumn("worker", expr(s"(__rk - 1) % $nWorkers"))
      .withColumn("step", expr(s"(__rk - 1) div $nWorkers"))
    groupedCumSum(ranked, Seq("worker"), Seq(col("step")),
        col("n_tokens"), "__cum")
      .select(col(shardCol), col("n_tokens"), col("worker"), col("step"),
        (col("__cum") - col("n_tokens")).as("tok_offset"))
  }

  /** INTEGRITY-CHECKED shard export — the terminal write of a packing
    * run, shipped WITH its own verification artifact: the packed
    * relation lands partitioned by shard under `<path>/data` and its
    * [[shardManifest]] (row/token counts, id ranges, XOR content
    * digests) under `<path>/manifest`, so any later reader can prove
    * the bytes on disk are the bytes the pipeline emitted without
    * trusting anything but the data itself — [[verifyShards]]
    * recomputes the manifest FROM the exported files and
    * [[manifestDiff]]s it against the stored one: all-`unchanged` is
    * the integrity proof; a truncated shard surfaces as `changed`
    * (count) or `removed`, a corrupted row as `changed` (digest). This
    * is the dataloader-side checksum discipline (WebDataset/tfrecord
    * shard hashing) with the manifest doing double duty as the
    * [[epochPlan]]/[[epochSchedule]] input.
    *
    * Scale shapes: the data write is the job's output (partitioned by
    * shard — shard-pruned reads for [[epochSchedule]] consumers); the
    * manifest is one aggregate; verification re-scans the export ONCE
    * and shuffles only (shard, counts, digests).
    */
  def writeShardsWithManifest(packed: DataFrame, path: String,
                              shardCol: String, idCol: String,
                              sizeCol: Column, fpCol: Column): Unit =
    // single-writer, machine-enforced: a concurrent resync interleaving
    // dynamic overwrites with this full export would silently mix two
    // corpus versions — the heartbeated lease refuses it loudly instead
    graft.ops.Lease.withLease(packed.sparkSession, path,
      "writeShardsWithManifest") {
      // manifest FIRST from the in-memory relation, then the data write:
      // both derive from `packed`, so a reader that sees both sees them
      // consistent; a crash between the two leaves a manifest with no
      // data — verifyShards reports every shard `removed`, loudly
      coalesceForWrite(shardManifest(packed, shardCol, idCol, sizeCol,
          fpCol))
        .write.mode("overwrite").parquet(s"$path/manifest")
      packed.write.partitionBy(shardCol).mode("overwrite")
        .parquet(s"$path/data")
    }

  /** INCREMENTAL re-export — bring a [[writeShardsWithManifest]] export
    * in line with a NEW corpus version by rewriting ONLY the shards
    * whose content moved: the new packed relation's [[shardManifest]]
    * diffs against the stored one ([[manifestDiff]] — two micro-table
    * scans), `added`/`changed` shards rewrite via DYNAMIC partition
    * overwrite (only the touched `shard=` partitions are replaced;
    * unchanged shard files are never opened, never rewritten), `removed`
    * shards' partitions are deleted, and the stored manifest is replaced
    * by the new one — data FIRST, manifest LAST (the opposite of
    * [[writeShardsWithManifest]], deliberately): a crash anywhere before
    * the manifest replace leaves the OLD manifest authoritative, so
    * re-running the same resync recomputes the same old-vs-new diff and
    * completes via the naturally idempotent dynamic partition overwrite.
    * (Were the manifest replaced first, a crashed rerun would diff the
    * new manifest against itself, see all-`unchanged`, rewrite nothing,
    * and report success over stale data.) Returns the diff relation —
    * the re-export's receipt: which shards were rewritten, removed, or
    * left untouched — computed against the PRE-resync manifest.
    *
    * This is incremental materialization at corpus scale: a 100 TB
    * export where one crawl slice changed rewrites that slice's shards,
    * not the corpus. The write cost is O(changed shards); the decision
    * cost is two manifest scans. ScaleSpec pins that untouched shard
    * FILES are byte-identical (not merely equivalent) and that the
    * resynced export verifies all-`unchanged` against the new corpus.
    */
  def resyncShards(spark: org.apache.spark.sql.SparkSession,
                   packed: DataFrame, path: String, shardCol: String,
                   idCol: String, sizeCol: Column, fpCol: Column): DataFrame =
    // single-writer, machine-enforced (graft.ops.Lease): two concurrent
    // resyncs interleaving dynamic partition overwrites would silently
    // mix two corpus versions shard by shard — refused loudly instead,
    // with heartbeat so a long resync is never mistaken for a crash
    graft.ops.Lease.withLease(spark, path, "resyncShards") {
      resyncShardsLocked(spark, packed, path, shardCol, idCol, sizeCol,
        fpCol)
    }

  private def resyncShardsLocked(spark: org.apache.spark.sql.SparkSession,
                   packed: DataFrame, path: String, shardCol: String,
                   idCol: String, sizeCol: Column, fpCol: Column): DataFrame = {
    val stored = spark.read.parquet(s"$path/manifest")
    val newMan = shardManifest(packed, shardCol, idCol, sizeCol, fpCol)
      .localCheckpoint(true)
    val diff = manifestDiff(stored, newMan, shardCol).localCheckpoint(true)
    // DATA first: rewrite only the touched partitions — dynamic overwrite
    // replaces exactly the shard= dirs present in the written frame, and
    // is idempotent under rerun
    val touched = diff.filter(col("status").isin("added", "changed"))
      .select(col(shardCol))
    packed.join(touched, Seq(shardCol), "left_semi")
      .write.partitionBy(shardCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$path/data")
    // removed shards: drop their partitions (driver list — removals are
    // the exception path and bounded by the diff)
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    diff.filter(col("status") === "removed").select(col(shardCol))
      .collect().foreach { r =>
        fs.delete(new Path(s"$path/data/$shardCol=${r.get(0)}"), true)
      }
    // manifest LAST — the commit point. A crash before this line leaves
    // the old manifest authoritative and a rerun completes the resync;
    // newMan is checkpointed, so overwriting its own source dir is safe.
    coalesceForWrite(newMan).write.mode("overwrite")
      .parquet(s"$path/manifest")
    diff
  }

  /** O(delta) re-export for GROWTH-ONLY maintained exports — the
    * [[resyncShards]] contract restricted to the shards the caller KNOWS
    * may have moved, so a 100 TB export whose last ingest window touched
    * two tail shards reads and writes two tail shards, not the corpus.
    * `touched` must be the FULL new content of every shard it mentions;
    * every shard it does NOT mention is unchanged BY CONTRACT and is
    * never read, diffed, or rewritten (its stored manifest row carries
    * forward verbatim — one micro-table anti-join). Removals cannot be
    * expressed (a shard whose full new content is empty has no rows to
    * mention) — use [[resyncShards]] for shrinking corpora.
    *
    * Commit order is [[resyncShards]]'s, deliberately: data FIRST
    * (dynamic overwrite of exactly the `added`/`changed` shards —
    * idempotent under rerun), manifest LAST (the commit point — a crash
    * leaves the old manifest, or for a bootstrap NO manifest,
    * authoritative, and the rerun recomputes the same touched diff and
    * completes). Bootstrapping a missing export through this verb is
    * therefore data-first — the opposite of [[writeShardsWithManifest]],
    * and the RIGHT order for a MAINTAINED export: a bootstrap crash
    * between a manifest-first write and its data would leave a manifest
    * exactly matching the replayed packed set, so the replay's diff
    * would report all-`unchanged` over missing shard data and the export
    * would silently serve a hole forever (the round-17 advisory's
    * window). Returns the [[manifestDiff]] receipt restricted to the
    * touched shards. Single-writer via the heartbeated
    * [[graft.ops.Lease]], like every shard-export writer.
    */
  def resyncShardsDelta(spark: org.apache.spark.sql.SparkSession,
                        touched: DataFrame, path: String, shardCol: String,
                        idCol: String, sizeCol: Column,
                        fpCol: Column): DataFrame =
    graft.ops.Lease.withLease(spark, path, "resyncShardsDelta") {
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val touchedMan = shardManifest(touched, shardCol, idCol, sizeCol,
        fpCol).localCheckpoint(true)
      val stored = if (fs.exists(
          new org.apache.hadoop.fs.Path(s"$path/manifest")))
        spark.read.parquet(s"$path/manifest")
      else touchedMan.limit(0)
      // diff ONLY the touched shards' stored rows against their recomputed
      // manifest — `removed` is impossible by construction (the stored
      // side is semi-joined to the touched keys)
      val diff = manifestDiff(
        stored.join(touchedMan.select(shardCol), Seq(shardCol),
          "left_semi"),
        touchedMan, shardCol).localCheckpoint(true)
      val toWrite = diff.filter(col("status").isin("added", "changed"))
        .select(col(shardCol))
      touched.join(toWrite, Seq(shardCol), "left_semi")
        .write.partitionBy(shardCol)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$path/data")
      // untouched manifest rows carry forward verbatim; checkpointed
      // before the overwrite of their own source dir
      val newMan = stored.join(touchedMan.select(shardCol), Seq(shardCol),
          "left_anti")
        .unionByName(touchedMan).localCheckpoint(true)
      coalesceForWrite(newMan).write.mode("overwrite")
        .parquet(s"$path/manifest")
      diff
    }

  /** COMPACT a `batch_seq=`-partitioned standing store (the streaming
    * lifecycle's admitted export buffer, or any store maintained by
    * per-batch dynamic partition overwrite): every partition with
    * `batch_seq` in [0, upToSeq] collapses into the base partition
    * `batch_seq=-1` (merging with any existing base), bounding the
    * partition count that otherwise grows +1 per micro-batch at
    * streaming cadence. Plain data with NO evidence contract — the
    * replay discipline of these stores is "a redelivered batch replaces
    * its OWN partition with identical content", which constrains the
    * CALLER: never pass an `upToSeq` covering a batch that can still
    * redeliver (the foreachBatch window is the latest batch, so
    * `currentBatchId - 1` is always safe, intersected with any export
    * cursor so un-exported partitions stay individually addressable).
    * The swap rides [[CarryState.replaceDir]] (staging + marker +
    * rename) under the heartbeated [[graft.ops.Lease]]: a crashed
    * compaction never corrupts the store, and concurrent writers are
    * refused loudly. The lease lives at the SIBLING root `<path>.maint`
    * (the `.staging` sibling precedent) because the swap replaces the
    * store dir wholesale — a lease inside it would vanish mid-hold;
    * writers guarding against this compaction check the same root. */
  def compactBatchStore(spark: org.apache.spark.sql.SparkSession,
                        path: String, upToSeq: Long): Unit =
    graft.ops.Lease.withLease(spark, s"$path.maint", "compactBatchStore") {
      CarryState.recoverDir(spark, path)
      val df = spark.read.parquet(path)
      val foldable = df.filter(col("batch_seq") >= 0 &&
          col("batch_seq") <= upToSeq)
        .select("batch_seq").distinct().count()
      if (foldable > 0)
        // the staging write materializes the fold before the old dir is
        // deleted (it reads the old files)
        CarryState.replaceDir(spark, path) { staging =>
          df.withColumn("batch_seq",
              when(col("batch_seq") <= upToSeq, lit(-1L))
                .otherwise(col("batch_seq").cast("long")))
            .write.partitionBy("batch_seq").mode("overwrite")
            .parquet(staging)
        }
    }

  /** Verify a [[writeShardsWithManifest]] export by recomputing the
    * manifest from the files on disk and diffing against the stored
    * one. Returns the [[manifestDiff]] relation: every row `unchanged`
    * is the integrity proof, anything else names the damaged shard and
    * how it diverged. `sizeCol`/`fpCol` must be the same expressions
    * the export used (they are recomputed from the read-back columns).
    */
  def verifyShards(spark: org.apache.spark.sql.SparkSession, path: String,
                   shardCol: String, idCol: String, sizeCol: Column,
                   fpCol: Column): DataFrame = {
    val stored = spark.read.parquet(s"$path/manifest")
    // partition-column type inference narrows a BIGINT shard to int on
    // read-back — re-align to the stored manifest's type before the diff
    val data = spark.read.parquet(s"$path/data")
      .withColumn(shardCol,
        col(shardCol).cast(stored.schema(shardCol).dataType))
    manifestDiff(stored,
      shardManifest(data, shardCol, idCol, sizeCol, fpCol), shardCol)
  }

  /** [[epochPlan]] straight off a [[shardManifestIngest]] standing
    * state — the dataloader's one-call path from "what has been
    * ingested so far" to "what do my workers read next": the
    * `<statePath>/carry/manifest` snapshot is consistent at every
    * commit point, so the derived schedule is too. */
  def epochPlanFromState(spark: org.apache.spark.sql.SparkSession,
                         statePath: String, shardCol: String, seed: String,
                         nWorkers: Int): DataFrame =
    epochPlan(spark.read.parquet(s"$statePath/carry/manifest"), shardCol,
      seed, nWorkers)

  /** [[epochPlan]] over a [[writeShardsWithManifest]] export, restricted
    * to shards that VERIFY — the resilient-dataloader handshake:
    * [[verifyShards]] recomputes the manifest from the files on disk,
    * and only shards whose stored and recomputed rows agree enter the
    * schedule; every shard that does NOT verify is reported in the same
    * relation with its diff status (`changed`/`removed`/`added`) and
    * NULL schedule columns, so the caller decides whether to re-export
    * or proceed degraded — but can never silently train on a truncated
    * or corrupted shard. Output: (shardCol, n_tokens, worker, step,
    * tok_offset, status) with `status = 'verified'` on planned rows.
    *
    * Scale shapes: the verification re-scan is the only data pass
    * (shuffles just (shard, counts, digests)); the plan itself is the
    * micro-manifest rank. Excluded shards keep their stored token count
    * (recomputed when the stored side is missing) for the report.
    */
  def epochPlanVerified(spark: org.apache.spark.sql.SparkSession,
                        path: String, shardCol: String, idCol: String,
                        sizeCol: Column, fpCol: Column, seed: String,
                        nWorkers: Int): DataFrame = {
    val diff = verifyShards(spark, path, shardCol, idCol, sizeCol, fpCol)
    val ok = diff.filter(col("status") === "unchanged").select(col(shardCol))
    val stored = spark.read.parquet(s"$path/manifest")
    val plan = epochPlan(stored.join(ok, Seq(shardCol), "left_semi"),
        shardCol, seed, nWorkers)
      .withColumn("status", lit("verified"))
    val excluded = diff.filter(col("status") =!= "unchanged")
      .select(col(shardCol),
        coalesce(col("n_tokens_old"), col("n_tokens_new"))
          .cast("long").as("n_tokens"),
        lit(null).cast("long").as("worker"),
        lit(null).cast("long").as("step"),
        lit(null).cast("long").as("tok_offset"),
        col("status"))
    plan.unionByName(excluded)
  }

  /** [[epochPlan]] for a WHOLE TRAINING RUN — `nEpochs` epochs, each
    * with its own derived permutation (the per-epoch hash key is
    * (shard, seed#epoch), so epoch orders differ but the run is still a
    * pure function of (manifest, seed)), workers dealt round-robin
    * within each epoch, and `tok_offset` cumulative ACROSS epochs per
    * worker — the exact token count a worker consumed before this
    * (epoch, step), which is the resume point a crashed multi-epoch run
    * actually needs. Resume at (epoch e, step k) is again a filter:
    * `epoch > e OR (epoch = e AND step >= k)`. Output: (shardCol,
    * n_tokens, epoch, worker, step, tok_offset).
    *
    * Scale shapes: the manifest × epochs explode is shards·epochs rows
    * (micro — the corpus is never touched), the per-epoch rank is
    * [[globalRowNumberBy]]'s range-partitioned two-phase pass (no
    * per-epoch window funnel), and the cross-epoch offset is one
    * per-worker [[groupedCumSum]]. Oracled end to end (q_epoch_schedule);
    * ScaleSpec pins per-epoch permutation divergence, consecutive
    * per-worker steps, and cross-epoch offset continuity.
    */
  def epochSchedule(manifest: DataFrame, shardCol: String, seed: String,
                    nWorkers: Int, nEpochs: Int): DataFrame = {
    require(nWorkers >= 1, "nWorkers must be >= 1")
    require(nEpochs >= 1, "nEpochs must be >= 1")
    val ex = manifest.select(col(shardCol), col("n_tokens"))
      .withColumn("epoch", explode(sequence(lit(0L), lit(nEpochs - 1L))))
    val h = Sketch.portableHash(concat(col(shardCol).cast("string"),
      lit("|" + seed + "#"), col("epoch").cast("string")))
    val ranked = globalRowNumberBy(ex.withColumn("__h", h), Seq("epoch"),
        Seq(col("__h"), col(shardCol)), "__rk")
      .withColumn("worker", expr(s"(__rk - 1) % $nWorkers"))
      .withColumn("step", expr(s"(__rk - 1) div $nWorkers"))
    groupedCumSum(ranked, Seq("worker"),
        Seq(col("epoch"), col("step")), col("n_tokens"), "__cum")
      .select(col(shardCol), col("n_tokens"), col("epoch"), col("worker"),
        col("step"), (col("__cum") - col("n_tokens")).as("tok_offset"))
  }

  /** ONE INGEST STEP of standing-manifest maintenance — the
    * [[mergeShardManifests]] mergeability claim running as state: the
    * arriving batch's [[shardManifest]] merges into the persisted
    * standing manifest (every column a sum/min/max/XOR — order-free, so
    * batches may touch any shard, including partially-filled ones from
    * earlier batches), and the sink receives the merged manifest —
    * the manifest of everything ingested so far, bit-identical to the
    * one-shot [[shardManifest]] over the union (StreamingSpec pins it).
    * A dataloader can read `<statePath>/carry/manifest` at any commit
    * point and see a consistent snapshot.
    *
    * State is one row per SHARD — micro-scale next to the data but not
    * driver-trivial at 10⁶ shards, so the merge runs AS A PLAN (one
    * micro hash aggregate over standing ∪ batch) and the result is
    * eagerly localCheckpointed before the swap: the returned frame
    * depends on the checkpoint, never on the files the swap replaces.
    * Same hardening as the other ingest verbs: marker-swap crash
    * consistency, batchId + content-fingerprint replay detection (a
    * replay re-emits the CURRENT standing manifest — for cumulative
    * state the post-merge snapshot of the original delivery IS the
    * replay's correct output).
    */
  def shardManifestIngest(spark: org.apache.spark.sql.SparkSession,
                          statePath: String, batch: DataFrame,
                          shardCol: String, idCol: String,
                          sizeCol: Column, fpCol: Column,
                          batchId: Long = -1L): DataFrame = {
    val cs = CarryState.open(spark, statePath)
    val hasState = cs.exists
    val meta: Option[org.apache.spark.sql.Row] = if (hasState)
      Some(spark.read.parquet(s"$statePath/carry/meta").head()) else None
    val part = shardManifest(batch, shardCol, idCol, sizeCol, fpCol)
    // content fingerprint of the batch's manifest CONTRIBUTION: XOR of
    // its per-shard digests + row/shard counts — effect-equality, the
    // cumulative-monitor replay convention
    val st = part.agg(count(lit(1)).as("ns"),
      coalesce(sum("n_rows"), lit(0L)).as("n"),
      coalesce(expr("bit_xor(fingerprint)"), lit(0L)).as("fp")).head()
    val (ns, n, fp) = (st.getAs[Long]("ns"), st.getAs[Long]("n"),
      st.getAs[Long]("fp"))
    if (CarryState.isReplay("shardManifestIngest", batchId, fp, n, meta))
      return spark.read.parquet(s"$statePath/carry/manifest")
        .localCheckpoint(true)
    val merged = (if (hasState)
        mergeShardManifests(Seq(
          spark.read.parquet(s"$statePath/carry/manifest"), part), shardCol)
      else part).localCheckpoint(true)
    CarryState.commit(cs) { dir =>
      coalesceForWrite(merged).write.mode("overwrite")
        .parquet(s"$dir/manifest")
      spark.range(1).select(lit(batchId).as("last_batch_id"),
          lit(fp).as("last_fp"), lit(n).as("last_n"))
        .write.mode("overwrite").parquet(s"$dir/meta")
    }
    merged
  }

  /** One-row packing-efficiency report over a [[packSequences]] relation —
    * the dataloader-health numbers a packing run ships with: sequence and
    * segment counts, packed token total, boundary crossings (segments
    * continuing a document from the previous sequence, `tok_start > 0` —
    * each is a cross-document attention boundary the collator must mask),
    * fill rate n_tokens/(n_seqs·seqLen) (< 1 only from the final partial
    * sequence) and mean segments per sequence. Exact integer counts +
    * two guarded divisions — replays verbatim in the oracle
    * (q_pack_stats). One aggregate pass; nothing scales past the packed
    * relation scan.
    */
  def packStats(packed: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    packed.agg(
        count_distinct(col("seq_id")).as("n_seqs"),
        count(lit(1)).as("n_segments"),
        coalesce(sum(col("tok_end") - col("tok_start")), lit(0L))
          .as("n_tokens"),
        coalesce(sum(when(col("tok_start") > 0, 1L).otherwise(0L)),
          lit(0L)).as("n_crossings"))
      .select(col("n_seqs"), col("n_segments"), col("n_tokens"),
        col("n_crossings"),
        when(col("n_seqs") > 0, round(
          col("n_tokens") / (col("n_seqs") * lit(seqLen.toLong)), 6))
          .as("fill_rate"),
        when(col("n_seqs") > 0,
          round(col("n_segments") / col("n_seqs"), 6)).as("segs_per_seq"))
  }

  /** Deterministic weighted interleave of several sources (training-mixture
    * scheduling): source i's k-th row lands at position (k - 0.5) / weight_i,
    * so a weight-2 source appears twice as often, uniformly spread — the
    * standard stride-scheduling mix. Inputs must share a schema. Output adds
    * `tag` (source name) and `mix_ord` (1-based global order). Exactly TWO
    * two-phase prefix-sum passes over the union regardless of source count —
    * union first, then ONE [[globalRowNumberBy]] keyed by tag for every
    * source's ordinals at once, then one [[globalRowNumber]] for the final
    * order. No global window anywhere; no per-source shuffle fan-out.
    */
  def interleaveWeighted(sources: Seq[(String, DataFrame, Double)],
                         orderCols: DataFrame => Seq[Column]): DataFrame = {
    require(sources.nonEmpty && sources.forall(_._3 > 0),
      "need at least one source; weights must be positive")
    require(sources.map(_._1).distinct.size == sources.size,
      "source tags must be unique")
    val unioned = sources
      .map { case (tag, df, _) => df.withColumn("tag", lit(tag)) }
      .reduce(_.unionByName(_))
    // per-tag weight as a small CASE expression (sources are few by nature)
    val weightOf = sources.tail.foldLeft(
        when(col("tag") === sources.head._1, lit(sources.head._3))) {
      case (acc, (tag, _, w)) => acc.when(col("tag") === tag, lit(w))
    }
    val positioned =
      globalRowNumberBy(unioned, Seq("tag"), orderCols(unioned), "__rn")
        .withColumn("__pos", (col("__rn") - 0.5) / weightOf)
        .drop("__rn")
    // ties (equal weights) break on tag then the source's own order key
    globalRowNumber(positioned,
        Seq(col("__pos"), col("tag")) ++ orderCols(positioned), "mix_ord")
      .drop("__pos")
  }

  /** Temperature-scaled mixture interleave: source weights are
    * size_i^alpha (alpha in (0, 1] — the standard multilingual/multi-source
    * schedule: alpha = 1 is proportional sampling, alpha -> 0 approaches
    * uniform, 0.3 is the common multilingual choice). Sizes come from one
    * count() per source (a cheap metadata aggregate — at 100 TB these are
    * parquet row-group counts, not scans); weights are then exact doubles
    * (pow is correctly rounded for these magnitudes), so the interleave
    * stays deterministic and engine-reproducible.
    */
  def interleaveByTemperature(sources: Seq[(String, DataFrame)], alpha: Double,
                              orderCols: DataFrame => Seq[Column]): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val weighted = sources.map { case (tag, df) =>
      (tag, df, math.pow(df.count().toDouble, alpha))
    }
    interleaveWeighted(weighted, orderCols)
  }

  /** Deterministic global shuffle for training-data ordering: a total sort
    * by `xxhash64(key, seed)` (key as tie-break). Plans as a
    * range-partitioned sort — every partition sorts its slice, no single
    * reducer — and the permutation is a pure function of (key, seed), so
    * re-runs, retried stages, and resumed jobs all see the same order.
    * `orderBy(rand())` gives none of those guarantees.
    */
  def shuffleRows(df: DataFrame, idCol: String, seed: Long = 42L): DataFrame =
    df.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))

  /** Deterministic weighted sampling WITHOUT replacement, k per group
    * (Efraimidis & Spirakis, "Weighted random sampling with a reservoir",
    * IPL 2006): each row draws u ∈ (0,1] from the portable 60-bit md5 hash
    * of (id, seed) and keeps priority u^(1/w); the k largest priorities per
    * group are the sample — provably the same distribution as sequential
    * weighted draws without replacement. Ranking uses the monotone
    * equivalent ln(u)/w (w > 0 required; ties break on id).
    *
    * Scale shape: priorities are map-side scalars; the per-group top-k is a
    * rank-filtered window that Spark 4 turns into a partial
    * WindowGroupLimit — ≤ k rows per group survive each map task before the
    * one group-key shuffle. Hash-derived u makes the sample a pure function
    * of (id, seed): re-runs, retried stages, and other engines (the DuckDB
    * oracle) draw the identical sample — `sample(fraction)` gives none of
    * those guarantees. The training-data use: quality-weighted corpus
    * subsampling with an auditable, replayable selection.
    */
  def weightedSampleBy(df: DataFrame, grpCols: Seq[String], idCol: String,
                       weight: Column, k: Int, seed: String = "42"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    val u = (Sketch.portableHash(concat(col(idCol).cast("string"),
        lit("|" + seed))) + lit(1L)).cast("double") / lit(math.pow(2, 60))
    val priority = log(u) / weight
    val w = Window.partitionBy(grpCols.map(col): _*)
      .orderBy(priority.desc, col(idCol))
    df.withColumn("__es_rk", row_number().over(w))
      .filter(col("__es_rk") <= k).drop("__es_rk")
  }

  /** Temperature-scaled per-domain sampling quotas — the data-mixing
    * recipe behind multi-corpus training sets (Pile/LLaMA-style: sample
    * domain d with probability ∝ n_d^(1/T); T = 1 reproduces natural
    * proportions, T → ∞ approaches uniform over domains, 1 < T < ∞
    * upweights small high-quality domains without discarding the big
    * ones). Output: one row per domain — (domainCol, n_rows, share,
    * quota) with quota = ⌊share · totalN⌋ (⌊·⌋, so Σ quota ≤ totalN — the
    * honest floor; callers wanting exact totals top up the largest
    * remainders themselves). The domain table is tiny by construction
    * (domains, not rows), so everything here is one count aggregate plus
    * arithmetic over it.
    */
  def temperatureQuotas(df: DataFrame, domainCol: String, totalN: Long,
                        temperature: Double): DataFrame = {
    require(totalN > 0, "totalN must be positive")
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("n_rows"))
    val w = counts.withColumn("__w",
      pow(col("n_rows").cast("double"), 1.0 / temperature))
    // total via a broadcast 1-row aggregate, not a global window — the
    // domain table is tiny, but plan shape should not need the auditor to
    // know that. The weights fold in DOMAIN order (sorted collect + left
    // fold), not sum()'s partition-combine order: quota = floor(share·N)
    // sits a float ulp from an integer flip, so the total must be a pure
    // function of the domain table, invariant under partitioning and
    // replayable by the oracle's ORDER BY fold.
    val tot = w.agg(aggregate(
      transform(array_sort(collect_list(struct(col(domainCol), col("__w")))),
        s => s.getField("__w")),
      lit(0.0), (a, x) => a + x).as("__tw"))
    w.crossJoin(broadcast(tot))
      .withColumn("share", col("__w") / col("__tw"))
      .withColumn("quota",
        floor(col("share") * totalN).cast("long"))
      .drop("__w", "__tw")
  }

  /** Draw the [[temperatureQuotas]] sample: per domain, the quota-many
    * rows with the smallest portable id-hash (a deterministic uniform
    * draw — the weight-1 case of [[weightedSampleBy]]'s ES priorities,
    * where -ln(u)/1 ranks identically to the hash itself). The per-domain
    * rank is [[groupedCumSum]]'s range-partitioned two-phase prefix sum,
    * NOT a `Window.partitionBy(domain)` — with a handful of domains over
    * 100 TB the naive window funnels each domain through one reducer,
    * while quotas here are routinely millions of rows (unlike
    * [[weightedSampleBy]]'s small-k regime, where the per-group window's
    * partial WindowGroupLimit keeps the shuffle slim). The quota table is
    * broadcast-joined (bounded by the domain count). Deterministic and
    * engine-replayable: the q_temp_mix oracle re-derives quotas and the
    * draw from the same md5 leaf.
    */
  def temperatureMix(df: DataFrame, domainCol: String, idCol: String,
                     totalN: Long, temperature: Double,
                     seed: String = "42"): DataFrame = {
    val quotas = temperatureQuotas(df, domainCol, totalN, temperature)
      .select(col(domainCol), col("quota"))
    val h = Sketch.portableHash(concat(col(idCol).cast("string"),
      lit("|" + seed)))
    groupedCumSum(df.withColumn("__h", h), Seq(domainCol),
        Seq(col("__h"), col(idCol)), lit(1L), "__rk")
      .join(broadcast(quotas), Seq(domainCol))
      .filter(col("__rk") <= col("quota"))
      .drop("__rk", "__h", "quota")
  }

  /** [[temperatureQuotas]] with EPOCH semantics (the LLaMA-recipe table:
    * small upweighted domains are repeated past one epoch rather than
    * silently capped at their row count): adds
    *   epochs_full = quota div n_rows   (whole passes over the domain),
    *   remainder   = quota mod n_rows   (rows drawn in the partial pass),
    *   epochs      = quota / n_rows     (the fractional epoch count the
    *                                     mixing tables report).
    * quota = epochs_full · n_rows + remainder exactly — integer identities
    * the oracle replays verbatim.
    */
  def temperatureQuotasEpochs(df: DataFrame, domainCol: String, totalN: Long,
                              temperature: Double): DataFrame =
    temperatureQuotas(df, domainCol, totalN, temperature)
      .withColumn("epochs_full", expr("quota div n_rows"))
      .withColumn("remainder", col("quota") % col("n_rows"))
      .withColumn("epochs", col("quota") / col("n_rows"))

  /** Draw the [[temperatureQuotasEpochs]] sample WITH repetition: each
    * domain's rows appear once per full epoch (epoch = 0 .. epochs_full−1
    * — every row), plus a partial epoch `epochs_full` holding the
    * `remainder`-many smallest-hash rows (the SAME deterministic draw as
    * [[temperatureMix]] — when no quota exceeds its domain, this verb
    * degenerates to exactly temperatureMix with epoch 0 everywhere).
    * Output: the input columns + `epoch`; Σ rows = Σ quota.
    *
    * Scale shape: the per-domain rank is computed ONCE via
    * [[groupedCumSum]]'s range-partitioned two-phase prefix sum (the
    * [[temperatureMix]] argument: a handful of domains over 100 TB must
    * not funnel through per-domain window reducers), the tiny epoch-quota
    * table broadcast-joins, and the repetition is a per-row
    * `explode(sequence)` — map-side fan-out exactly where the output
    * legitimately is epochs× the input, with no shuffle carrying the
    * duplication.
    */
  def temperatureMixEpochs(df: DataFrame, domainCol: String, idCol: String,
                           totalN: Long, temperature: Double,
                           seed: String = "42"): DataFrame = {
    val quotas = temperatureQuotasEpochs(df, domainCol, totalN, temperature)
      .select(col(domainCol), col("epochs_full"), col("remainder"))
    val h = Sketch.portableHash(concat(col(idCol).cast("string"),
      lit("|" + seed)))
    groupedCumSum(df.withColumn("__h", h), Seq(domainCol),
        Seq(col("__h"), col(idCol)), lit(1L), "__rk")
      .join(broadcast(quotas), Seq(domainCol))
      .withColumn("__nc", col("epochs_full") +
        when(col("__rk") <= col("remainder"), lit(1L)).otherwise(lit(0L)))
      // guarded explode: sequence(0, -1) would run DESCENDING (Spark
      // defaults step to -1 when start > stop), so 0-copy rows are
      // filtered before the sequence is ever built
      .where(col("__nc") > 0)
      .select(df.columns.map(col) :+
        explode(sequence(lit(0L), col("__nc") - 1)).as("epoch"): _*)
  }

  /** [[temperatureQuotas]] in WEIGHT units — the form mixing recipes
    * actually budget in: a domain's mass is Σ weight (token counts, byte
    * sizes) rather than its row count, shares go ∝ (Σw_d)^(1/T), and
    * quota = ⌊share · totalBudget⌋ is a WEIGHT budget (e.g. tokens), not
    * a row count. A 10-row domain of book-length documents and a
    * 10k-row domain of tweets weigh what they actually cost the token
    * budget. Same determinism discipline as [[temperatureQuotas]]: the
    * per-domain weight totals are exact integer sums (pass an integral
    * `weightCol`), and the weight-total fold runs in DOMAIN order so the
    * floor sits on a partition-invariant float. Output: (domainCol,
    * n_weight, share, quota).
    */
  def temperatureQuotasByWeight(df: DataFrame, domainCol: String,
                                weightCol: Column, totalBudget: Long,
                                temperature: Double): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(domainCol)
      .agg(sum(weightCol.cast("long")).as("n_weight"))
    val w = counts.withColumn("__w",
      pow(col("n_weight").cast("double"), 1.0 / temperature))
    val tot = w.agg(aggregate(
      transform(array_sort(collect_list(struct(col(domainCol), col("__w")))),
        s => s.getField("__w")),
      lit(0.0), (a, x) => a + x).as("__tw"))
    w.crossJoin(broadcast(tot))
      .withColumn("share", col("__w") / col("__tw"))
      .withColumn("quota",
        floor(col("share") * totalBudget).cast("long"))
      .drop("__w", "__tw")
  }

  /** Draw the [[temperatureQuotasByWeight]] sample: per domain, the
    * greedy prefix of smallest-hash rows whose CUMULATIVE weight fits the
    * domain's quota — rows admit while Σ weight-so-far ≤ quota, so the
    * draw under-fills by at most one document per domain (the honest
    * floor; no row is split). Deterministic: the admission order is the
    * same portable id-hash as [[temperatureMix]], the running weight is
    * an exact integer prefix sum, and the rank comes from
    * [[groupedCumSum]]'s range-partitioned two-phase machinery — a
    * handful of domains over 100 TB never funnels through per-domain
    * window reducers. Output: the input columns (quota columns dropped).
    */
  def temperatureMixByWeight(df: DataFrame, domainCol: String,
                             idCol: String, weightCol: Column,
                             totalBudget: Long, temperature: Double,
                             seed: String = "42"): DataFrame = {
    val quotas = temperatureQuotasByWeight(df, domainCol, weightCol,
        totalBudget, temperature)
      .select(col(domainCol), col("quota"))
    val h = Sketch.portableHash(concat(col(idCol).cast("string"),
      lit("|" + seed)))
    groupedCumSum(
        df.withColumn("__h", h).withColumn("__wt", weightCol.cast("long")),
        Seq(domainCol), Seq(col("__h"), col(idCol)), col("__wt"), "__cw")
      .join(broadcast(quotas), Seq(domainCol))
      .filter(col("__cw") <= col("quota"))
      // the using-join hoisted the domain key to the front; restore the
      // caller's column order
      .select(df.columns.map(col): _*)
  }

  /** GPT-style concat-and-chunk context windows: concatenate every
    * document's token-id array in `orderCol` order into one virtual
    * corpus stream and cut it into fixed `windowLen`-token windows —
    * the final packing step that turns a tokenized corpus
    * ([[graft.text.Bpe.idsFromTokens]]) into the equal-length training
    * sequences a dataloader consumes (documents cross window boundaries;
    * the alternative boundary-respecting greedy form is `packByBudget`).
    * Output: (window_id, n_filled, n_docs, ids, spans) — ids in stream
    * order, every window exactly `windowLen` long except the final
    * partial one, `n_docs` the number of documents contributing to the
    * window, and `spans` the per-document provenance a masked-attention
    * collator consumes: array of (doc_id, start, len) structs in window
    * order, `start` the 0-based position of the document's first token
    * inside THIS window, `len` how many of its tokens land here (a
    * document crossing a boundary contributes one span to each side).
    * Since documents are contiguous in the stream, each document is one
    * span per window — (doc, window) groups are runs, so min/count
    * reconstruct them exactly.
    *
    * `insertSep` (GPT-2's `<|endoftext|>` convention) appends that token
    * id to every document's id array before packing, so document
    * boundaries exist IN the id stream; pair it with a tokenizer artifact
    * that reserved the id ([[graft.text.Bpe.buildTokenizer]] with
    * `sepToken=true` reserves 0 and shifts the vocab up by one). The sep
    * belongs to its document's span (a doc's segment is text-ids + sep).
    *
    * Shapes at 100 TB: each document's absolute offset is ONE
    * range-partitioned two-phase prefix sum over doc rows ([[globalCumSum]]
    * — no global window), each document is sliced MAP-SIDE into its
    * per-window runs (a doc occupying stream positions [off, off+n)
    * intersects windows off div L .. (off+n−1) div L; start/len/token
    * slice are pure integer arithmetic on the offsets — no per-token
    * rows ever exist), and window assembly is ONE hash aggregate over
    * run rows (≈ n_docs + n_tokens/L rows, each carrying its token
    * slice as one array cell) with per-group state bounded by
    * `windowLen` — the whole packing
    * replays exactly in the oracle (q_context_windows, q_context_spans).
    * `orderCol` must be unique per row (a document id) so the stream
    * order — and therefore every window — is deterministic.
    */
  def contextWindows(df: DataFrame, orderCol: String, idsCol: String,
                     windowLen: Int,
                     insertSep: Option[Long] = None): DataFrame =
    contextWindowsImpl(df, orderCol, orderCol, idsCol, windowLen, insertSep)

  /** [[contextWindows]] over a SEEDED DETERMINISTIC SHUFFLE of the
    * corpus — the missing knob between "file order" and a real
    * pretraining run (adjacent documents in crawl order are correlated;
    * training wants them spread): the stream position is the PORTABLE
    * md5-hash permutation of (idCol, seed) — [[shuffleRows]]' idea with
    * the engine-replayable leaf (xxhash64 does not exist in the oracle)
    * — realized as one [[globalRowNumber]] two-phase rank that feeds
    * the packer as its stream order. Spans still carry the REAL
    * document ids. The permutation is a pure function of (id, seed):
    * bit-stable across partitionings, re-runs, and engines (ScaleSpec
    * pins both; q_context_shuffled replays it in DuckDB). Cost over
    * id-order packing: exactly one extra range exchange (the rank).
    */
  def contextWindowsShuffled(df: DataFrame, idCol: String, idsCol: String,
                             windowLen: Int, seed: String = "42",
                             insertSep: Option[Long] = None): DataFrame = {
    val h = Sketch.portableHash(concat(col(idCol).cast("string"),
      lit("|" + seed)))
    val ranked = globalRowNumber(
      df.select(col(idCol), col(idsCol)).withColumn("__h", h),
      Seq(col("__h"), col(idCol)), "__ord").drop("__h")
    contextWindowsImpl(ranked, "__ord", idCol, idsCol, windowLen, insertSep)
  }

  /** Shared packer behind [[contextWindows]] / [[contextWindowsShuffled]]:
    * `orderCol` is the unique stream position, `docCol` the id spans
    * report (the same column in the id-ordered verb; the rank vs the
    * real id in the shuffled one). */
  private def contextWindowsImpl(df: DataFrame, orderCol: String,
                                 docCol: String, idsCol: String,
                                 windowLen: Int,
                                 insertSep: Option[Long]): DataFrame = {
    require(windowLen > 0, "windowLen must be positive")
    val src = insertSep match {
      case Some(sep) => df.withColumn(idsCol,
        concat(col(idsCol), array(lit(sep))))
      case None => df
    }
    val c = globalCumSum(
      src.withColumn("__n", size(col(idsCol)).cast("long")),
      Seq(col(orderCol)), col("__n"), "__cum")
    val L = windowLen.toLong
    // map-side run slicing: a doc at stream positions [__off, __cum)
    // intersects windows __off div L .. (__cum−1) div L; its run in
    // window w starts at greatest(__off, w·L) and ends at
    // least(__cum, (w+1)·L). One row per (doc, window) run — the
    // per-token rows the old two-level aggregate shuffled never exist,
    // and the single window_id exchange carries each token once, inside
    // its run's array slice.
    c.withColumn("__off", col("__cum") - col("__n"))
      .filter(col("__n") > 0)
      .select(col(docCol).as("__doc"),
        explode(expr(
          s"""transform(sequence(__off div ${L}L, (__cum - 1) div ${L}L),
             |  w -> named_struct(
             |    'window_id', w,
             |    'start', greatest(__off, w * ${L}L) - w * ${L}L,
             |    'len', least(__cum, (w + 1) * ${L}L)
             |             - greatest(__off, w * ${L}L),
             |    'toks', slice(`$idsCol`,
             |      CAST(greatest(__off, w * ${L}L) - __off + 1 AS INT),
             |      CAST(least(__cum, (w + 1) * ${L}L)
             |             - greatest(__off, w * ${L}L) AS INT))))"""
            .stripMargin)).as("__run"))
      // assemble windows from their document runs (one aggregate; the
      // struct field order (start, doc_id, len, toks) is the array_sort
      // key and matches the old two-level form bit for bit)
      .groupBy(col("__run.window_id").as("window_id"))
      .agg(sum(col("__run.len")).as("n_filled"), count(lit(1)).as("n_docs"),
        collect_list(struct(col("__run.start").as("start"),
          col("__doc").as("doc_id"), col("__run.len").as("len"),
          col("__run.toks").as("toks"))).as("__ss"))
      .withColumn("__ss", expr("array_sort(__ss)"))
      .select(col("window_id"), col("n_filled"), col("n_docs"),
        expr("flatten(transform(__ss, s -> s.toks))").as("ids"),
        expr("transform(__ss, s -> struct(s.doc_id AS doc_id, " +
          "s.start AS start, s.len AS len))").as("spans"))
  }

  /** ONE INGEST STEP of concat-and-chunk packing against standing carry
    * state — [[contextWindows]] running incrementally, so the LAST
    * packing step can run on ingest instead of as a terminal batch job:
    * the arriving docs' id arrays are appended to the carried partial
    * window (`<statePath>/remainder`: the per-document tail segments of
    * the stream's uncut suffix, < windowLen tokens total;
    * `<statePath>/meta`: the next global window id), FULL windows are
    * returned with GLOBAL window ids (same (window_id, n_filled, n_docs,
    * ids, spans) shape as [[contextWindows]]), and the new partial
    * becomes the new remainder. Bit-parity claim (StreamingSpec):
    * feeding batches in order emits exactly the full-window prefix of
    * the one-shot [[contextWindows]] over the concatenated corpus, and
    * the remainder equals the final partial window.
    *
    * Contract — ENFORCED, not just documented: `idCol` values must be
    * unique within a batch and ARRIVE IN ASCENDING ORDER across batches
    * (file-ordered ingest) — the stream position of a document is its id
    * rank, exactly [[contextWindows]]' `orderCol` rule. The carried
    * `max_id` is persisted in meta and a batch whose min id does not
    * exceed it FAILS LOUDLY instead of silently corrupting window order.
    *
    * Exactly-once under retries: the state records the last applied
    * batch (its `batchId` when the caller passes one — the foreachBatch
    * recipe — plus an order-free content fingerprint and row count for
    * callers without ids), and keeps the PREVIOUS remainder + window
    * base alongside the current one (both < windowLen tokens — state
    * stays bounded). A replayed batch (same batchId, or same
    * fingerprint+count when no id is given) is detected after a
    * completed swap and its output is RECOMPUTED from the previous
    * state and re-emitted bit-identically — never double-packed; a
    * batchId reused for DIFFERENT content fails loudly.
    *
    * Crash consistency: state is tiny by construction (each remainder
    * is < windowLen tokens), so it is a driver read + fresh write per
    * batch — the read is materialized BEFORE the write, and the
    * returned plan depends only on the batch and a driver-local literal
    * relation, never on the replaced files. The whole
    * `<statePath>/carry` directory is replaced by a staged swap with a
    * COMMIT MARKER: staging is fully written, then `_COMMITTED` is
    * created inside it, then the old carry is deleted and staging
    * renamed into place. On entry a leftover staging WITH the marker
    * and NO carry is a completed-but-unpromoted swap and is promoted
    * (closing the delete→rename crash window that would otherwise reset
    * the counter and drop the remainder); a marker-less or shadowed
    * staging is discarded. Per-batch work = one [[contextWindows]] over
    * (remainder ∪ batch) plus one bounded stats aggregate.
    */
  def contextWindowsIngest(spark: org.apache.spark.sql.SparkSession,
                           statePath: String, batch: DataFrame,
                           idCol: String, idsCol: String,
                           windowLen: Int, batchId: Long = -1L,
                           insertSep: Option[Long] = None): DataFrame = {
    import scala.jdk.CollectionConverters._
    val cs = CarryState.open(spark, statePath)
    val hasState = cs.exists
    val meta: Option[org.apache.spark.sql.Row] = if (hasState) {
      val m = spark.read.parquet(s"$statePath/carry/meta")
      require(m.columns.contains("max_id"),
        "legacy contextWindowsIngest state (pre-contract-check format): " +
          "no max_id in meta — repack from scratch or backfill " +
          "(max_id, last_batch_id, last_fp, last_n, prev_next_window_id) " +
          "per the README migration note")
      Some(m.head())
    } else None
    val base: Long = meta.map(_.getAs[Long]("next_window_id")).getOrElse(0L)
    val maxSeen: Long = meta.map(_.getAs[Long]("max_id"))
      .getOrElse(Long.MinValue)
    val rem: Seq[org.apache.spark.sql.Row] = if (hasState)
      spark.read.parquet(s"$statePath/carry/remainder").collect().toSeq
      else Seq.empty
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(idsCol,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType))))
    // insertSep applies to the ARRIVING docs only: the carried remainder
    // is tail slices of already-packed (sep-included) stream, exactly
    // [[contextWindows]]' per-document append
    val src = insertSep.foldLeft(
        batch.select(col(idCol).cast("long"), col(idsCol)))((d, s) =>
      d.withColumn(idsCol, concat(col(idsCol), array(lit(s)))))
    // one bounded aggregate: row count, id range, distinct-id count and
    // an order-free content fingerprint (bit_xor of portable id hashes —
    // the shardManifest digest) — the replay/ordering evidence
    val st = src.agg(count(lit(1)).as("n"),
      min(col(idCol)).as("mn"), max(col(idCol)).as("mx"),
      count_distinct(col(idCol)).as("nd"),
      coalesce(expr(s"bit_xor(${bitXorFpSql(idCol)})"), lit(0L)).as("fp"))
      .head()
    val (n, nd, fp) = (st.getAs[Long]("n"), st.getAs[Long]("nd"),
      st.getAs[Long]("fp"))
    require(n == nd, s"contextWindowsIngest: $idCol must be unique within " +
      s"a batch ($n rows, $nd distinct ids)")
    if (CarryState.isReplay("contextWindowsIngest", batchId, fp, n, meta)) {
      // completed swap, replayed batch: re-emit the SAME output from the
      // PREVIOUS state (kept exactly for this) — never advance the carry
      val m = meta.get
      val prevBase = m.getAs[Long]("prev_next_window_id")
      val prevRem = spark.read
        .parquet(s"$statePath/carry/prev").collect().toSeq
      val all = spark.createDataFrame(prevRem.asJava, schema)
        .unionByName(src)
      return contextWindows(all, idCol, idsCol, windowLen)
        .filter(col("n_filled") === windowLen)
        .select((col("window_id") + prevBase).as("window_id"),
          col("n_filled"), col("n_docs"), col("ids"), col("spans"))
    }
    if (n > 0L)
      require(st.getAs[Long]("mn") > maxSeen,
        s"contextWindowsIngest: ids must ascend across batches — batch " +
          s"min ${st.getAs[Long]("mn")} <= carried max $maxSeen (an " +
          "out-of-order or partially-replayed batch would pack documents " +
          "twice or out of stream order)")
    val remDf = spark.createDataFrame(rem.asJava, schema)
    val all = remDf.unionByName(src)
    val w = graft.ml.Dedup.trackCache(
      contextWindows(all, idCol, idsCol, windowLen))
    val nFull = w.filter(col("n_filled") === windowLen).count()
    // the new remainder: the (single, trailing) partial window sliced
    // back into per-document tail segments via its own spans
    val partial = w.filter(col("n_filled") < windowLen)
      .select(explode(col("spans")).as("sp"), col("ids"))
      .select(col("sp.doc_id").as(idCol),
        expr("slice(ids, sp.start + 1, sp.len)").as(idsCol))
      .collect().toSeq
    // full windows: computed from remDf (driver-local) + batch, so the
    // state overwrite below cannot invalidate the returned plan
    val full = w.filter(col("n_filled") === windowLen)
      .select((col("window_id") + base).as("window_id"), col("n_filled"),
        col("n_docs"), col("ids"), col("spans"))
    CarryState.commit(cs) { dir =>
      spark.createDataFrame(partial.asJava, schema)
        .repartition(1).write.mode("overwrite")
        .parquet(s"$dir/remainder")
      // the PREVIOUS remainder rides along so a replay of THIS batch
      // can re-derive its exact output (bounded: < windowLen tokens)
      remDf.repartition(1).write.mode("overwrite").parquet(s"$dir/prev")
      spark.range(1).select(lit(base + nFull).as("next_window_id"),
          lit(math.max(maxSeen,
            if (n > 0L) st.getAs[Long]("mx") else Long.MinValue))
            .as("max_id"),
          lit(batchId).as("last_batch_id"), lit(fp).as("last_fp"),
          lit(n).as("last_n"), lit(base).as("prev_next_window_id"))
        .write.mode("overwrite").parquet(s"$dir/meta")
    }
    full
  }

  /** The portable 60-bit id-hash leaf the ingest fingerprint XORs —
    * [[Sketch.portableHash]] of the id string, as SQL text so it can sit
    * inside the `bit_xor` aggregate. */
  private[graft] def bitXorFpSql(idCol: String): String =
    s"CAST(conv(substring(md5(CAST(`$idCol` AS STRING)), 1, 15), " +
      "16, 10) AS LONG)"

  /** [[bitXorFpSql]] over (id, content) — the replay-evidence leaf for
    * verbs whose exactly-once claim covers CONTENT, not just the id set:
    * a batch id redelivered with the same ids and row count but MUTATED
    * text must fail loudly, not silently pass as a replay and re-emit a
    * stale survivor set. The encoding is UNAMBIGUOUS by construction:
    * the id is length-prefixed (so (id="1|a", text="b") and (id="1",
    * text="a|b") cannot alias — no delimiter can be smuggled across the
    * boundary), and NULL content is a tagged case distinct from the
    * empty string (so a text mutated to NULL moves the fingerprint
    * instead of nulling the concat and erasing the row's id from the
    * XOR, where a paired mutation could cancel). */
  private[graft] def contentFpSql(idCol: String, contentCol: String): String =
    s"CAST(conv(substring(md5(concat(" +
      s"CAST(length(CAST(`$idCol` AS STRING)) AS STRING), ':', " +
      s"CAST(`$idCol` AS STRING), " +
      s"IF(`$contentCol` IS NULL, '|0:', '|1:'), " +
      s"coalesce(CAST(`$contentCol` AS STRING), ''))), 1, 15), 16, 10) " +
      "AS LONG)"

  /** ENCODING-VERSION TAG for aggregated [[contentFpSql]] fingerprints.
    * The leaves are 60-bit (15 hex chars), so any `bit_xor` of them
    * leaves bits 60..63 ZERO — the top nibble is free, and every
    * fingerprint recorded by pre-tag versions (the r16 `md5(id|text)`
    * and r17 length-prefixed encodings alike) reads back as version 0.
    * Tagging the AGGREGATED value (never the leaves — a per-leaf tag
    * would XOR-cancel on even row counts) makes a cross-version replay
    * DIAGNOSABLE for id-less callers: the one batch at risk is the LAST
    * pre-upgrade batch redelivered after an upgrade, whose re-encoded
    * fingerprint mismatches the recorded one while its row count
    * matches — [[CarryState.isReplay]] sees the version nibbles differ
    * and fails loudly naming the boundary, while a genuinely fresh
    * same-version batch that happens to repeat the last row count (the
    * NORMAL shape under uniform chunking) passes as fresh. Bump this
    * when (and only when) the [[contentFpSql]] encoding changes. */
  private[graft] val ContentFpVersion: Long = 1L

  /** Tag an aggregated 60-bit content fingerprint with
    * [[ContentFpVersion]] in the top nibble. */
  private[graft] def tagContentFp(xor60: Long): Long =
    (ContentFpVersion << 60) | (xor60 & ((1L << 60) - 1))

  /** LENGTH-GROUPED batching (the padding-minimizing dynamic batcher —
    * HuggingFace's `group_by_length` / the bucketed-batching idea of
    * sequence-to-sequence training): documents land in `nBuckets`
    * equal-depth LENGTH buckets (global rank over (length, id) — the
    * two-phase ordinal, no global window), and each bucket packs
    * greedily into batches of ≤ `batchBudget` total tokens in length
    * order. Batching similar lengths together is what shrinks padding:
    * a batch pads every member to its max length, so the waste
    * max·n − Σlen collapses when lengths are close (ScaleSpec pins
    * bucketed waste < unbucketed waste on the skewed corpus). Output:
    * one row per document — (idCol, len, bucket, batch) with `batch`
    * numbered within its bucket; aggregate (bucket, batch) for the
    * padding report (exact integers end to end, q_length_batches).
    *
    * Scale shapes: one global rank + one per-bucket prefix sum, both
    * range-partitioned two-phase passes; the count rides as a broadcast
    * 1-row total. A row longer than `batchBudget` still lands in a batch
    * (the packByBudget straddler rule).
    */
  def lengthGroupedBatches(df: DataFrame, idCol: String, sizeCol: Column,
                           nBuckets: Int, batchBudget: Long): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    require(batchBudget > 0, "batchBudget must be positive")
    val sized = df.select(col(idCol), sizeCol.cast("long").as("len"))
    val ranked = globalRowNumber(sized, Seq(col("len"), col(idCol)), "__rk")
    val tot = sized.agg(count(lit(1)).as("__n"))
    val bucketed = ranked.crossJoin(broadcast(tot))
      .withColumn("bucket", expr(s"((__rk - 1) * $nBuckets) div __n"))
      .drop("__rk", "__n")
    groupedCumSum(bucketed, Seq("bucket"), Seq(col("len"), col(idCol)),
        col("len"), "__cum")
      .withColumn("batch", expr(s"(__cum - len) div $batchBudget"))
      .select(col(idCol), col("len"), col("bucket"), col("batch"))
  }

  /** [[lengthGroupedBatches]] against FROZEN length-bucket boundaries —
    * the serving form of the padding-minimizing batcher (the
    * [[quantileBoundaries]]/[[assignByBoundaries]] split applied to
    * batching): bucket cutoffs were trained ONCE on a reference corpus
    * (`boundaries`: rows of (bucket, boundary) — [[quantileBoundaries]]
    * with no group columns), every document lands in the bucket counting
    * the boundaries ≤ its length, and each bucket packs greedily into
    * ≤ `batchBudget`-token batches in `idCol` ORDER (arrival order — the
    * property that lets [[lengthBatchesIngest]] reproduce this exactly
    * on a stream; the self-calibrating [[lengthGroupedBatches]] packs in
    * length order instead, so the two verbs differ by design, not by
    * accident). Output: (idCol, len, bucket, batch).
    *
    * Scale shapes: the boundary table is broadcast on a constant key
    * (hash join + count aggregate, never a non-equi nested loop); the
    * per-bucket running total is [[groupedCumSum]]'s range-partitioned
    * two-phase prefix sum. The straddler rule is [[packByBudget]]'s.
    */
  def lengthBatchesByBoundaries(df: DataFrame, idCol: String,
                                sizeCol: Column, boundaries: DataFrame,
                                batchBudget: Long): DataFrame = {
    require(batchBudget > 0, "batchBudget must be positive")
    val sized = df.select(col(idCol), sizeCol.cast("long").as("len"))
      .withColumn("__g", lit(1))
    val bc = broadcast(boundaries
      .select(lit(1).as("__g"), col("boundary").cast("long").as("boundary")))
    val assigned = sized.join(bc, Seq("__g"), "left")
      .groupBy(col(idCol), col("len"))
      .agg(coalesce(sum(when(col("boundary") <= col("len"), 1L)), lit(0L))
        .as("bucket"))
    groupedCumSum(assigned, Seq("bucket"), Seq(col(idCol)), col("len"),
        "__cum")
      .withColumn("batch", expr(s"(__cum - len) div $batchBudget"))
      .select(col(idCol), col("len"), col("bucket"), col("batch"))
  }

  /** ONE INGEST STEP of [[lengthBatchesByBoundaries]] against standing
    * carry state — length-grouped batching running on the stream, the
    * batcher sibling of [[contextWindowsIngest]]: bucket boundaries are
    * FROZEN (trained once), and the only state is each bucket's
    * cumulative packed-token total (≤ nBuckets+1 rows — the open
    * batch's fill is `cum mod budget`), so an arriving document's batch
    * id is (carried + in-batch prefix − len) div budget, globally
    * consistent across micro-batches. Bit-parity (StreamingSpec):
    * feeding batches in ascending-id order emits exactly the one-shot
    * [[lengthBatchesByBoundaries]] rows over the concatenated corpus.
    *
    * Same hardening as [[contextWindowsIngest]]: ascending-id contract
    * enforced against the persisted max_id, in-batch id uniqueness
    * checked, replays detected (foreachBatch `batchId` or content
    * fingerprint) and RE-EMITTED from the retained previous totals
    * instead of double-counted, and the whole carry directory swaps via
    * the staged rename + `_COMMITTED` marker (a crash between delete
    * and rename recovers by promotion).
    */
  def lengthBatchesIngest(spark: org.apache.spark.sql.SparkSession,
                          statePath: String, batch: DataFrame,
                          idCol: String, sizeCol: Column,
                          boundaries: DataFrame, batchBudget: Long,
                          batchId: Long = -1L): DataFrame = {
    require(batchBudget > 0, "batchBudget must be positive")
    val cs = CarryState.open(spark, statePath)
    val hasState = cs.exists
    val meta: Option[org.apache.spark.sql.Row] = if (hasState)
      Some(spark.read.parquet(s"$statePath/carry/meta").head()) else None
    val maxSeen = meta.map(_.getAs[Long]("max_id")).getOrElse(Long.MinValue)
    def readTotals(rel: String): Map[Long, Long] =
      if (hasState) spark.read.parquet(s"$statePath/carry/$rel").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      else Map.empty
    val totals = readTotals("totals")
    val src = batch.select(col(idCol).cast("long"),
      sizeCol.cast("long").as("len"))
    val st = src.agg(count(lit(1)).as("n"),
      min(col(idCol)).as("mn"), max(col(idCol)).as("mx"),
      count_distinct(col(idCol)).as("nd"),
      coalesce(expr(s"bit_xor(${bitXorFpSql(idCol)})"), lit(0L)).as("fp"))
      .head()
    val (n, nd, fp) = (st.getAs[Long]("n"), st.getAs[Long]("nd"),
      st.getAs[Long]("fp"))
    require(n == nd, s"lengthBatchesIngest: $idCol must be unique within " +
      s"a batch ($n rows, $nd distinct ids)")
    val replayed = CarryState.isReplay("lengthBatchesIngest", batchId,
      fp, n, meta)
    // assign + per-bucket in-batch prefix against a CHOSEN offset map
    def emit(offsets: Map[Long, Long]): DataFrame = {
      import spark.implicits._
      val offDf = broadcast(
        offsets.toSeq.toDF("bucket", "__off"))
      val sized = src.withColumn("__g", lit(1))
      val bc = broadcast(boundaries
        .select(lit(1).as("__g"), col("boundary").cast("long").as("boundary")))
      val assigned = sized.join(bc, Seq("__g"), "left")
        .groupBy(col(idCol), col("len"))
        .agg(coalesce(sum(when(col("boundary") <= col("len"), 1L)), lit(0L))
          .as("bucket"))
      groupedCumSum(assigned, Seq("bucket"), Seq(col(idCol)), col("len"),
          "__cum")
        .join(offDf, Seq("bucket"), "left")
        .withColumn("__o", coalesce(col("__off"), lit(0L)))
        .withColumn("batch",
          expr(s"(__o + __cum - len) div $batchBudget"))
        .select(col(idCol), col("len"), col("bucket"), col("batch"))
    }
    if (replayed) {
      val prev = if (hasState)
        spark.read.parquet(s"$statePath/carry/prev").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        else Map.empty[Long, Long]
      return emit(prev)
    }
    if (n > 0L)
      require(st.getAs[Long]("mn") > maxSeen,
        s"lengthBatchesIngest: ids must ascend across batches — batch " +
          s"min ${st.getAs[Long]("mn")} <= carried max $maxSeen")
    val out = emit(totals)
    // per-bucket batch sums fold into the standing totals
    val sums = out.groupBy("bucket").agg(sum("len").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = (totals.keySet ++ sums.keySet).map(b =>
      b -> (totals.getOrElse(b, 0L) + sums.getOrElse(b, 0L))).toSeq
    import spark.implicits._
    CarryState.commit(cs) { dir =>
      merged.toDF("bucket", "cum").repartition(1)
        .write.mode("overwrite").parquet(s"$dir/totals")
      totals.toSeq.toDF("bucket", "cum").repartition(1)
        .write.mode("overwrite").parquet(s"$dir/prev")
      spark.range(1).select(
          lit(math.max(maxSeen,
            if (n > 0L) st.getAs[Long]("mx") else Long.MinValue))
            .as("max_id"),
          lit(batchId).as("last_batch_id"), lit(fp).as("last_fp"),
          lit(n).as("last_n"))
        .write.mode("overwrite").parquet(s"$dir/meta")
    }
    out
  }

  /** T5-style SPAN-CORRUPTION pairs (Raffel et al. 2020 §3.1.4; the
    * UL2/denoising pretraining objective's data-prep step): each
    * document's id sequence is split into (input, target) — masked spans
    * are replaced in the INPUT by one sentinel id each
    * (sentinelBase + run index, position order), and the TARGET lists
    * each sentinel followed by the tokens it hid, closed by the final
    * sentinel (sentinelBase + n_runs) — the seq2seq denoising pair
    * exactly as T5 feeds it. Token selection is a DETERMINISTIC
    * hash-derived Bernoulli (portable md5 leaf of (doc, position) mod
    * 100 < noisePct), so the corruption replays bitwise in the oracle
    * and across runs/partitionings — reproducible noise is a feature,
    * not a simplification (rerunning the pipeline yields the same
    * pairs); adjacent selected tokens merge into one span, as in T5.
    *
    * Shapes at 100 TB: MAP-ONLY, like [[mlmPairs]] — run bookkeeping
    * (start detection, run index, both output arrays) is ONE Catalyst
    * `aggregate` fold per document over its own array: the previous
    * element's mask bit rides the fold state, so no explode, no
    * shuffle, no window — the whole op rides whatever scan feeds it.
    * Token ids are VALIDATED against `sentinelBase` map-side
    * (`assert_true`): an id ≥ sentinelBase would collide with a
    * sentinel and make the pair ambiguous (T5 places sentinels above
    * the vocabulary for exactly this reason), so the job fails loudly
    * instead. Output: (idCol, n_masked, n_runs, input_ids, target_ids)
    * — id-less docs keep a row (empty input, the bare final sentinel
    * as target).
    */
  def spanCorruptionPairs(ids: DataFrame, idCol: String, idsCol: String,
                          noisePct: Int = 15,
                          sentinelBase: Long = 1000L): DataFrame = {
    require(noisePct > 0 && noisePct < 100, "noisePct must be in (0, 100)")
    val sb = sentinelBase
    // the deterministic Bernoulli leaf: portable 60-bit md5 hash of
    // (doc id, position) mod 100 — Sketch.portableHash as SQL text so it
    // can reference the fold's lambda index
    val m = s"pmod(CAST(conv(substring(md5(concat(" +
      s"CAST(`$idCol` AS STRING), '|', CAST(i AS STRING))), 1, 15), " +
      s"16, 10) AS LONG), 100) < $noisePct"
    // one fold per document: state = (input acc, target acc, run count,
    // masked count, previous position's mask bit); sequence(0, -1) would
    // run DESCENDING (Spark defaults step to -1), so the empty/NULL
    // array case is guarded out front
    val fold =
      s"""IF(`$idsCol` IS NULL OR size(`$idsCol`) < 1,
         |  named_struct('inp', CAST(array() AS array<long>),
         |               'tgt', CAST(array() AS array<long>),
         |               'runs', 0L, 'masked', 0L, 'prev', false),
         |  aggregate(sequence(0, size(`$idsCol`) - 1),
         |    named_struct('inp', CAST(array() AS array<long>),
         |                 'tgt', CAST(array() AS array<long>),
         |                 'runs', 0L, 'masked', 0L, 'prev', false),
         |    (st, i) -> IF(NOT ($m),
         |      named_struct('inp', array_append(st.inp, `$idsCol`[i]),
         |                   'tgt', st.tgt, 'runs', st.runs,
         |                   'masked', st.masked, 'prev', false),
         |      IF(NOT st.prev,
         |        named_struct('inp', array_append(st.inp, ${sb}L + st.runs),
         |                     'tgt', concat(st.tgt,
         |                       array(${sb}L + st.runs, `$idsCol`[i])),
         |                     'runs', st.runs + 1L,
         |                     'masked', st.masked + 1L, 'prev', true),
         |        named_struct('inp', st.inp,
         |                     'tgt', array_append(st.tgt, `$idsCol`[i]),
         |                     'runs', st.runs,
         |                     'masked', st.masked + 1L, 'prev', true))),
         |    st -> st))""".stripMargin
    ids
      // sentinel-collision guard: map-side, fails the job with the
      // offending id instead of emitting ambiguous pairs
      .withColumn("__ck", assert_true(
        coalesce(expr(s"array_max(`$idsCol`)"), lit(Long.MinValue))
          < lit(sb),
        concat(lit("spanCorruptionPairs: token id "),
          expr(s"array_max(`$idsCol`)"),
          lit(s" >= sentinelBase $sb — sentinels would collide with " +
            "real ids; pass sentinelBase >= vocab size"))))
      .filter(col("__ck").isNull)
      .withColumn("__st", expr(fold))
      .select(col(idCol),
        col("__st.masked").as("n_masked"),
        col("__st.runs").as("n_runs"),
        concat_ws(" ", col("__st.inp")).as("input_ids"),
        concat_ws(" ", concat(col("__st.tgt"),
          array(lit(sb) + col("__st.runs")))).as("target_ids"))
  }

  /** BERT-style MASKED-LM pairs (Devlin et al. 2019 §3.1): each token is
    * selected with probability `noisePct`/100; a selected token becomes
    * `maskId` 80% of the time, a random vocabulary id 10%, and stays
    * itself 10% — labels carry the ORIGINAL id at selected positions and
    * `ignoreLabel` (the −100 convention) elsewhere. Every draw is a
    * DETERMINISTIC hash-derived integer (portable md5 leaves of
    * (doc, position, salt) — 'm' selects, 'r' picks the 80/10/10 branch,
    * 'v' picks the random id), so the corruption replays bitwise in the
    * oracle and across runs.
    *
    * Shapes at 100 TB: MAP-ONLY — both output arrays are per-document
    * `transform`s with the element index, no explode, no shuffle, no
    * window; the whole op rides whatever scan feeds it. Output:
    * (idCol, n_masked, input_ids, labels).
    */
  def mlmPairs(ids: DataFrame, idCol: String, idsCol: String,
               noisePct: Int = 15, maskId: Long, vocabSize: Long,
               ignoreLabel: Long = -100L): DataFrame = {
    require(noisePct > 0 && noisePct < 100, "noisePct must be in (0, 100)")
    require(vocabSize > 0, "vocabSize must be positive")
    def leaf(i: Column, salt: String): Column =
      graft.ops.Sketch.portableHash(concat(col(idCol).cast("string"),
        lit("|"), i.cast("string"), lit("|" + salt)))
    def sel(i: Column): Column = pmod(leaf(i, "m"), lit(100L)) < noisePct
    val input = transform(col(idsCol), (t, i) =>
      when(!sel(i), t).otherwise({
        val r = pmod(leaf(i, "r"), lit(100L))
        when(r < 80, lit(maskId))
          .when(r < 90, pmod(leaf(i, "v"), lit(vocabSize)))
          .otherwise(t)
      }))
    val labels = transform(col(idsCol), (t, i) =>
      when(sel(i), t).otherwise(lit(ignoreLabel)))
    ids.select(col(idCol),
      size(filter(transform(col(idsCol), (_, i) => sel(i)),
        x => x)).cast("long").as("n_masked"),
      concat_ws(" ", input).as("input_ids"),
      concat_ws(" ", labels).as("labels"))
  }

  /** Morton (Z-order) key: interleave the low `bits` bits of each column —
    * bit j of column i lands at output bit j·n + i. Inputs must already be
    * nonnegative longs < 2^bits (see [[zorderQuantize]]); n·bits ≤ 63. The
    * expression is a flat OR-chain of shift/mask terms: pure codegen, no
    * UDF.
    */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "z-order needs at least 2 columns")
    require(bits > 0 && n * bits <= 63, "need 0 < n*bits <= 63")
    cols.zipWithIndex.flatMap { case (c, i) =>
      (0 until bits).map { j =>
        shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Quantize a numeric column to [0, 2^bits) for [[zorderValue]] by linear
    * scaling over [lo, hi] (values clamped). */
  def zorderQuantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, "need hi > lo")
    val m = (1L << bits) - 1
    least(greatest(
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(1L << bits))
        .cast("long"), lit(0L)), lit(m))
  }

  /** Cluster data on the Z-order curve of several columns — the
    * data-layout answer to "my scans filter on BOTH x and y": a range
    * partition + partition-local sort on the interleaved key gives every
    * output file a tight min/max envelope in EVERY dimension, so parquet
    * row-group statistics prune multi-column predicates that a single-column
    * sort could only prune on its leading column. (The same layout trick
    * behind Delta/Iceberg `OPTIMIZE ZORDER BY`.) No global sort: the range
    * exchange samples boundaries and each partition sorts its slice.
    */
  def zorderBy(df: DataFrame, cols: Seq[Column], bits: Int = 16,
               numPartitions: Int = 0): DataFrame = {
    val z = zorderValue(cols, bits)
    val parted = if (numPartitions > 0) df.repartitionByRange(numPartitions, z)
                 else df.repartitionByRange(z)
    parted.sortWithinPartitions(z)
  }

  /** Per-zone (count, min, max) statistics over a layout order — the
    * zone-map / parquet-row-group-statistics model, materialized as a table
    * so layout quality is MEASURABLE before committing a 100 TB rewrite:
    * lay `df` out in `orderCols` order, cut the order into `nZones`
    * equal-depth contiguous zones, and record each zone's envelope per stat
    * column. `orderCols` must be a total order (add a key tiebreak) or zone
    * boundaries are nondeterministic. Pair with [[zorderBy]]'s interleaved
    * key: tight envelopes in EVERY dimension instead of only the leading
    * sort column.
    *
    * Scale shape: the global row number is the two-phase range prefix sum
    * ([[globalRowNumber]] — no single-reducer window); the zone cut
    * `((rn−1)·nZones) div N` is exact integer arithmetic (engine-portable),
    * and the stats pass is one hash aggregate on zone id.
    */
  def zoneMaps(df: DataFrame, orderCols: Seq[Column], nZones: Int,
               statCols: Seq[String]): DataFrame = {
    require(nZones > 0, "nZones must be positive")
    require(statCols.nonEmpty, "need at least one stat column")
    val rn = globalRowNumber(df, orderCols, "__rn")
    val aggs = count(lit(1)).as("cnt") +: statCols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    // N = plain count(*) over the INPUT — max(__rn) gives the same number
    // but would re-evaluate the whole globalRowNumber subtree (itself a
    // two-consumer plan) just to read the row count
    rn.crossJoin(broadcast(df.agg(count(lit(1)).as("__n"))))
      .withColumn("__zone", expr(s"((__rn - 1) * $nZones) div __n"))
      .groupBy(col("__zone").as("zone"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Planning-time skip estimate from a [[zoneMaps]] table: a zone is
    * skippable for `lo <= c <= hi` when its [min, max] envelope misses the
    * range entirely — the arithmetic engines run against row-group stats,
    * as a one-row (n_zones, n_skipped) report. NULL envelopes (all-NULL
    * zones) are conservatively unskippable. The estimate is not just a
    * model: ScaleSpec's "z-order layout ON DISK" test writes a
    * [[zorderBy]] layout to parquet and shows the scan's own
    * numOutputRows shrink under the pushed range filter (row groups
    * skipped by their min/max stats) while the hash layout prunes nothing
    * — the same arithmetic, executed by the parquet reader. */
  def skipEstimate(zm: DataFrame, statCol: String, lo: Column,
                   hi: Column): DataFrame =
    zm.agg(count(lit(1)).as("n_zones"),
      coalesce(sum(when(col(s"${statCol}_max") < lo ||
          col(s"${statCol}_min") > hi, 1L).otherwise(0L)), lit(0L))
        .as("n_skipped"))
}
