package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding compression (Jégou, Douze & Schmid,
  * "Product quantization for nearest neighbor search", IEEE TPAMI 2011):
  * split each d-dim vector into `m` contiguous subvectors, learn a
  * k-centroid codebook per subspace (independent deterministic Lloyd runs,
  * [[Clustering.kmeansFit]]), store each vector as `m` small codes, and
  * answer queries by asymmetric distance computation (ADC): a per-query
  * lookup table of exact query-subvector→centroid distances, summed across
  * the code columns. Reference scope: siuba has none of this — it is the
  * compression leg of the similarity-search extension layer
  * ([[Similarity]] holds the brute-force / LSH / IVF legs).
  *
  * Why this matters at 100 TB: an encoded corpus costs m·⌈log2 k⌉ bits per
  * vector instead of 32·d (d=64 floats → 4 bytes at m=4, k=256 — 64×), so
  * the scan side of a retrieval join carries codes, not vectors.
  * Codebooks are tiny (m·k·(d/m) floats) and BROADCAST everywhere they are
  * used: training update is the only shuffle (k·d partial sums per
  * partition), encoding is map-side argmin, and the ADC probe is a
  * broadcast LUT join + one (query, item) aggregate — no all-pairs
  * vector math anywhere. In practice codebooks train on a hash-sample
  * (standard PQ practice) and the full corpus only ever streams through
  * the map-side encode.
  *
  * Determinism: with integer-quantized inputs and the portable init hash,
  * every distance is computed by the same left-to-right [[Similarity.dot]]
  * on both engines, per-code distances combine in FIXED order (an explicit
  * per-subspace pivot, not an unordered float sum), and all argmins break
  * ties on (distance, code) — so codes and rankings replay bit-for-bit in
  * the q_pq_topk DuckDB oracle, like q_kmeans.
  */
object Pq {

  /** (id, sub, subv) relation: subspace `sub` holds dims
    * [sub·d/m, (sub+1)·d/m). `d` must be divisible by m (slice truncates
    * the tail otherwise — validated in the spec, not re-scanned here).
    */
  def subVectors(df: DataFrame, idCol: String, vecCol: String,
                 m: Int): DataFrame = {
    require(m >= 1, "m must be >= 1")
    graft.ops.Scale.spread(df)
      .select(col(idCol),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col(vecCol).as("__v"))
      .withColumn("subv",
        expr(s"slice(__v, sub * (size(__v) div $m) + 1, size(__v) div $m)"))
      .drop("__v")
  }

  /** Train the per-subspace codebooks: `m` Lloyd runs FUSED into one
    * grouped program — `sub` rides every key, so each iteration is ONE
    * broadcast-assign pass and ONE (sub, centroid, dim) partial-sum
    * shuffle over the whole subvector relation instead of m sequential
    * scans (the per-subspace math is identical to m independent
    * [[Clustering.kmeansFit]] runs: same init sample — the hash depends
    * only on the id, so the same k vectors seed every subspace — same
    * argmin tie-breaks, same mean updates). Output (sub, code, cvec) with
    * codes densely renumbered 0..k−1 per subspace in init-hash order —
    * the compact ids the encoded corpus stores.
    */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
            iters: Int, initHash: Option[Column] = None): DataFrame = {
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be nonnegative")
    val sv = Dedup.trackCache(subVectors(df, idCol, vecCol, m)
      .select(col(idCol).as("__pqid"), col("sub"), col("subv")))
    val ch = initHash.getOrElse(xxhash64(col(idCol)))
    // init: the k smallest-hash VECTORS seed every subspace — one
    // TakeOrdered over ids, then their m subvectors via an equi-join
    val seedIds = df.select(ch.as("cid"), col(idCol).as("__pqid"))
      .orderBy("cid").limit(k)
    var cents = sv.join(broadcast(seedIds), "__pqid")
      .select(col("sub"), col("cid"), col("subv").as("cvec"))

    def assignTo(cs: DataFrame): DataFrame = {
      val scored = sv.join(broadcast(cs), Seq("sub"))
        .withColumn("__d",
          Similarity.dot(col("cvec"), col("cvec")) -
            lit(2.0) * Similarity.dot(col("subv"), col("cvec")))
      val w = Window.partitionBy("__pqid", "sub")
        .orderBy(col("__d"), col("cid"))
      scored.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select("__pqid", "sub", "subv", "cid")
    }

    var assigned = assignTo(cents)
    for (_ <- 1 to iters) {
      cents = assigned
        .select(col("sub"), col("cid"),
          posexplode(col("subv")).as(Seq("pos", "x")))
        .groupBy("sub", "cid", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .groupBy("sub", "cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("s") / col("n")).as("m")))),
          e => e.getField("m")).as("cvec"))
      assigned = assignTo(cents)
    }
    cents
      .withColumn("code",
        row_number().over(Window.partitionBy("sub").orderBy("cid")) - 1)
      .select("sub", "code", "cvec")
  }

  private def sqdistToCentroid: Column =
    Similarity.dot(col("cvec"), col("cvec")) -
      lit(2.0) * Similarity.dot(col("subv"), col("cvec"))

  /** Encode a corpus against fixed codebooks: per (vector, subspace) the
    * nearest centroid's code (ties → smaller code), assembled into an
    * m-element code array. Map-side scoring (broadcast codebooks); the
    * only exchange is the per-id argmin + assembly, reduced map-side by
    * the partial WindowGroupLimit. Output: (idCol, codes).
    */
  def encode(df: DataFrame, codebooks: DataFrame, idCol: String,
             vecCol: String, m: Int): DataFrame = {
    val scored = subVectors(df, idCol, vecCol, m)
      .join(broadcast(codebooks), Seq("sub"))
      .withColumn("__d", sqdistToCentroid)
    val w = Window.partitionBy(idCol, "sub").orderBy(col("__d"), col("code"))
    scored.withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1)
      .groupBy(idCol)
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code").as("c")))),
        e => e.getField("c")).as("codes"))
  }

  /** ADC top-k: for each query, the k nearest encoded items by the summed
    * per-subspace query→centroid distances (the ‖q‖² term is constant per
    * query and dropped — rankings are unaffected). The LUT (one row per
    * query × subspace × code, exact distances to the REAL query subvector)
    * is broadcast into the exploded code table; per-item distances combine
    * through an explicit fixed-order per-subspace pivot so float addition
    * order can never perturb a rank. Scores every (query, item) code pair —
    * the right tool for RERANKING a pre-routed candidate set; for a
    * full-corpus probe use [[adcTopKRouted]], which puts IVF coarse
    * routing in front. Output: (query_id, item_id, rk).
    */
  def adcTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, m: Int, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val lut = subVectors(queries, idCol, vecCol, m)
      .join(codebooks, Seq("sub"))
      .select(col(idCol).as("query_id"), col("sub"), col("code"),
        sqdistToCentroid.as("__pd"))
    val ex = codes.select(col(idCol).as("item_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    // fixed-order combine: sum(sub==0) + sum(sub==1) + ... — each term
    // aggregates exactly one row, so the total is an ordered scalar sum
    val adist = (0 until m).map(s =>
        sum(when(col("sub") === s, col("__pd")))).reduce(_ + _)
    val byPair = ex.join(broadcast(lut), Seq("sub", "code"))
      .groupBy("query_id", "item_id")
      .agg(adist.as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("item_id"))
    byPair.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("item_id"), col("rk").cast("long").as("rk"))
  }

  /** IVF-routed ADC — the full IVF-PQ serving shape (Jégou et al. §V):
    * [[Similarity.ivfTopK]]'s coarse routing in front of [[adcTopK]]'s
    * compressed scoring. Each query ranks the tiny broadcast coarse-centroid
    * table (deterministic id-hash sample, same as ivfTopK), probes its
    * `nProbe` nearest centroids, and ADC-scores ONLY items assigned to those
    * centroids — the flat ADC's query × corpus code enumeration shrinks to
    * query × (nProbe/nCentroids · corpus), which is what makes a
    * full-corpus probe tractable at 100 TB (flat [[adcTopK]] remains the
    * right tool for RERANKING a pre-routed candidate set).
    *
    * Scale shape: centroids and the per-query LUT are broadcast; item
    * routing is map-side argmin; the only data-sized exchanges are the
    * candidate equi-join on `centroid_id` and the per-(query, item) combine.
    * Same fixed-order per-subspace ADC sum and (distance, id) tie-breaks as
    * [[adcTopK]], and routing reuses ivfTopK's exact-cosine argmin — with
    * quantized vectors and a portable hash the whole route→encode→probe
    * chain replays bit-for-bit (q_pq_ivf's spliced DuckDB oracle);
    * PipelineSpec pins full-probe == flat ADC (the routing is pure
    * candidate pruning) and recall@k ≥ 0.9 at quarter-probe on a planted
    * clustered corpus — the geometry IVF assumes; on isotropic noise any
    * routing loses neighbors. Output: (query_id, item_id, rk).
    */
  /** The IVF coarse-routing candidate relation [[adcTopKRouted]] scores:
    * items routed to their 1 nearest hash-sampled centroid, joined to each
    * query's `nProbe` probed centroids — (query_id, item_id), distinct.
    * Exposed as a seam so the ScalingSpec growth gate can count THIS
    * relation's rows (must scale ~linearly in corpus size for a fixed
    * query set — the pruning contract) without duplicating the routing.
    */
  private[graft] def routedCandidates(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, nCentroids: Int, nProbe: Int,
      centroidHash: Option[Column] = None): DataFrame = {
    require(nProbe >= 1 && nCentroids >= nProbe, "need 1 <= nProbe <= nCentroids")
    val ch = centroidHash.getOrElse(xxhash64(col(idCol)))
    val centroids = Dedup.trackCache(corpus
      .select(ch.as("centroid_id"), col(vecCol).as("cvec"))
      .orderBy("centroid_id").limit(nCentroids))
    def route(df: DataFrame, name: String, nNearest: Int) = {
      val scored = graft.ops.Scale.spread(df)
        .select(col(idCol).as(name + "_id"), col(vecCol).as(name + "_vec"))
        .crossJoin(broadcast(centroids))
        .withColumn("cdist", Similarity.cosine(col(name + "_vec"), col("cvec")))
      val w = Window.partitionBy(name + "_id")
        .orderBy(desc("cdist"), col("centroid_id"))
      scored.withColumn("crk", row_number().over(w))
        .filter(col("crk") <= nNearest)
        .select(col(name + "_id"), col("centroid_id"))
    }
    route(corpus, "item", 1)
      .join(route(queries, "query", nProbe), Seq("centroid_id"))
      .select("query_id", "item_id").dropDuplicates("query_id", "item_id")
  }

  def adcTopKRouted(corpus: DataFrame, codes: DataFrame, codebooks: DataFrame,
                    queries: DataFrame, idCol: String, vecCol: String,
                    m: Int, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
                    centroidHash: Option[Column] = None): DataFrame = {
    val cand = routedCandidates(corpus, queries, idCol, vecCol,
      nCentroids, nProbe, centroidHash)
    val lut = subVectors(queries, idCol, vecCol, m)
      .join(codebooks, Seq("sub"))
      .select(col(idCol).as("query_id"), col("sub"), col("code"),
        sqdistToCentroid.as("__pd"))
    val ex = codes.select(col(idCol).as("item_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val adist = (0 until m).map(s =>
        sum(when(col("sub") === s, col("__pd")))).reduce(_ + _)
    val byPair = cand.join(ex, Seq("item_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy("query_id", "item_id")
      .agg(adist.as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("item_id"))
    byPair.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("item_id"), col("rk").cast("long").as("rk"))
  }

  /** Persist an IVF-PQ index — the build-once/probe-many form of
    * [[adcTopKRouted]], and the layout a 100 TB retrieval corpus actually
    * ships: `<path>/centroids` (coarse quantizer, nCentroids rows),
    * `<path>/codebooks` (m·k rows), and `<path>/codes` — the corpus stored
    * as m PQ CODES per vector instead of d floats, written PARTITIONED BY
    * the coarse `centroid_id`. [[adcTopKFromIndex]] then composes the two
    * savings: a probe batch reads ONLY its routed `centroid_id=`
    * directories (dynamic partition pruning against the broadcast probe
    * table), and what it reads is codes, not vectors (m·⌈log2 k⌉ bits per
    * item). Same deterministic centroid sample as
    * [[Similarity.buildIvfIndex]] and the same codebook training as
    * [[train]], so index answers equal the inline [[adcTopKRouted]]
    * exactly (MiscSpec pins equality and the DPP filter).
    */
  def buildIvfPqIndex(corpus: DataFrame, path: String, idCol: String,
                      vecCol: String, m: Int, k: Int, iters: Int,
                      nCentroids: Int = 16,
                      initHash: Option[Column] = None,
                      centroidHash: Option[Column] = None): Unit = {
    val ch = centroidHash.getOrElse(xxhash64(col(idCol)))
    corpus.select(ch.as("centroid_id"), col(vecCol).as("cvec"))
      .orderBy("centroid_id").limit(nCentroids)
      .write.mode("overwrite").parquet(s"$path/centroids")
    train(corpus, idCol, vecCol, m, k, iters, initHash)
      .write.mode("overwrite").parquet(s"$path/codebooks")
    val spark = corpus.sparkSession
    val centroids = broadcast(spark.read.parquet(s"$path/centroids"))
    val scored = graft.ops.Scale.spread(corpus)
      .select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
      .crossJoin(centroids)
      .withColumn("cdist", Similarity.cosine(col("item_vec"), col("cvec")))
    val w = Window.partitionBy("item_id")
      .orderBy(desc("cdist"), col("centroid_id"))
    val assigned = scored.withColumn("crk", row_number().over(w))
      .filter(col("crk") === 1).select("item_id", "centroid_id")
    encode(corpus, spark.read.parquet(s"$path/codebooks"), idCol, vecCol, m)
      .select(col(idCol).as("item_id"), col("codes"))
      .join(assigned, "item_id")
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/codes")
    // baseline drift row (batch_seq 0): the training corpus' own
    // quantization residual — what appended batches are measured against
    writeStatsRow(spark, path, corpus,
      spark.read.parquet(s"$path/codebooks"), idCol, vecCol, m, 0L)
  }

  /** Per-vector TRUE squared quantization error under frozen codebooks:
    * Σ over subspaces of ‖subv − nearest codeword‖². [[sqdistToCentroid]]
    * drops the ‖subv‖² term (constant per argmin); adding it back here
    * makes the residual an absolute, batch-comparable number — the drift
    * statistic of [[appendToIvfPqIndex]]. Map-side scoring against the
    * broadcast codebooks + two bounded aggregates: O(rows · m · k), no
    * joins against the corpus. Output: (idCol, resid).
    */
  def quantizationResiduals(df: DataFrame, codebooks: DataFrame,
                            idCol: String, vecCol: String,
                            m: Int): DataFrame =
    subVectors(df, idCol, vecCol, m)
      .withColumn("__sn", Similarity.dot(col("subv"), col("subv")))
      .join(broadcast(codebooks), Seq("sub"))
      .withColumn("__d", sqdistToCentroid)
      .groupBy(col(idCol), col("sub"))
      .agg((min(col("__d")) + max(col("__sn"))).as("__r"))
      .groupBy(idCol)
      .agg(sum("__r").as("resid"))

  /** One `<path>/stats` drift row for a batch: (batch_seq, n_rows,
    * mean_resid, max_resid) of the [[quantizationResiduals]] under the
    * index's frozen codebooks. batch_seq 0 is the BASELINE (the corpus the
    * codebooks were trained on, written by [[buildIvfPqIndex]]); appends
    * record 1, 2, … — making the re-train policy the index documents
    * operational: [[rebuildAdvised]] compares appended batches against the
    * baseline instead of asking the operator to guess.
    */
  private def writeStatsRow(spark: org.apache.spark.sql.SparkSession,
                            path: String, batch: DataFrame,
                            codebooks: DataFrame, idCol: String,
                            vecCol: String, m: Int, seq: Long): Unit = {
    quantizationResiduals(batch, codebooks, idCol, vecCol, m)
      .agg(count(lit(1)).as("n_rows"),
        avg("resid").as("mean_resid"),
        max("resid").as("max_resid"))
      .select(lit(seq).as("batch_seq"), col("n_rows"),
        col("mean_resid"), col("max_resid"))
      .write.mode("append").parquet(s"$path/stats")
  }

  /** The per-append drift ledger of an index, with each batch's
    * mean residual as a ratio of the build-time baseline:
    * (batch_seq, n_rows, mean_resid, max_resid, drift_ratio) —
    * drift_ratio NULL for the baseline row itself (and everywhere when
    * the baseline mean is 0: a degenerate corpus that IS its codebook has
    * nothing to drift from). Tiny relation (one row per append).
    */
  def driftStats(spark: org.apache.spark.sql.SparkSession,
                 path: String): DataFrame = {
    val stats = spark.read.parquet(s"$path/stats")
    val base = stats.filter(col("batch_seq") === 0)
      .select(col("mean_resid").as("__base"))
    stats.crossJoin(broadcast(base))
      .withColumn("drift_ratio",
        when(col("batch_seq") > 0 && col("__base") > 0,
          col("mean_resid") / col("__base")))
      .drop("__base")
  }

  /** The operational re-train signal: true when the LATEST appended
    * batch's mean quantization residual exceeds `threshold ×` the
    * build-time baseline — the frozen codebooks are fitting arriving data
    * that much worse than the corpus they were trained on, and the
    * documented IVF re-train policy ("rebuild when drift passes a
    * threshold", [[appendToIvfPqIndex]]) should fire. False when nothing
    * has been appended yet. Reads the tiny stats relation only — O(1),
    * never touches codes or vectors.
    */
  def rebuildAdvised(spark: org.apache.spark.sql.SparkSession, path: String,
                     threshold: Double = 2.0): Boolean = {
    require(threshold > 0, "threshold must be positive")
    val latest = driftStats(spark, path)
      .filter(col("batch_seq") > 0)
      .orderBy(desc("batch_seq")).limit(1)
      .select("drift_ratio").collect()
    latest.nonEmpty && !latest(0).isNullAt(0) &&
      latest(0).getDouble(0) > threshold
  }

  /** Append a vector batch into a persisted IVF-PQ index UNDER FROZEN
    * QUANTIZERS — the retrieval twin of [[Dedup.dedupeAgainstCorpus]]'s
    * O(batch) ingest shape: the standing corpus' codes are never re-read,
    * re-encoded, or rewritten. The batch is routed to its nearest
    * persisted coarse centroid (broadcast, map-side argmin — the same
    * (cdist desc, centroid_id) tie-break as [[buildIvfPqIndex]]), encoded
    * against the persisted codebooks (same argmin as [[encode]]), and
    * appended to `<path>/codes` in append-mode partitioned-by-centroid_id
    * writes — new files land inside the existing `centroid_id=` directory
    * layout, so [[adcTopKFromIndex]]'s dynamic partition pruning keeps
    * skipping unprobed directories, old and new files alike.
    *
    * Because centroids and codebooks are read from the index (frozen), the
    * appended index is BIT-IDENTICAL to rebuilding the codes leg over
    * corpus ∪ batch with the same quantizers — MiscSpec pins
    * probe(append) == probe(rebuild) exactly. That is the deliberate
    * trade at 100 TB: appends are O(batch) forever, while quantizer drift
    * (a batch distribution the frozen codebooks fit poorly) accumulates as
    * ADC error, not as wrong plumbing — the standard IVF re-train policy
    * (rebuild when drift passes a threshold) applies on top, and is
    * OPERATIONAL here: every append writes its quantization-residual
    * stats to the `<path>/stats` ledger and [[rebuildAdvised]] reads the
    * ledger against the build-time baseline (MiscSpec pins that an
    * out-of-distribution batch trips the flag and an in-distribution one
    * does not).
    *
    * Caller contract: batch ids must be disjoint from the corpus' (the
    * index stores ids as given; a duplicate id would surface twice).
    */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, batch: DataFrame, idCol: String,
                         vecCol: String): Unit = {
    val centroids = broadcast(spark.read.parquet(s"$path/centroids"))
    val codebooks = spark.read.parquet(s"$path/codebooks")
    val m = codebooks.agg(max("sub")).head().getInt(0) + 1
    val scored = graft.ops.Scale.spread(batch)
      .select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
      .crossJoin(centroids)
      .withColumn("cdist", Similarity.cosine(col("item_vec"), col("cvec")))
    val w = Window.partitionBy("item_id")
      .orderBy(desc("cdist"), col("centroid_id"))
    val assigned = scored.withColumn("crk", row_number().over(w))
      .filter(col("crk") === 1).select("item_id", "centroid_id")
    encode(batch, codebooks, idCol, vecCol, m)
      .select(col(idCol).as("item_id"), col("codes"))
      .join(assigned, "item_id")
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$path/codes")
    // drift row for this batch: next sequence number after whatever the
    // stats ledger holds (1-row driver read — the self-describing-index
    // pattern). Indexes built before the monitor existed have no ledger;
    // their first append starts one at seq 1 (no baseline row — driftStats
    // then reports NULL ratios until the index is rebuilt).
    val seq =
      try spark.read.parquet(s"$path/stats")
        .agg(coalesce(max("batch_seq"), lit(0L))).head().getLong(0) + 1
      catch { case _: org.apache.spark.sql.AnalysisException => 1L }
    writeStatsRow(spark, path, batch, codebooks, idCol, vecCol, m, seq)
  }

  /** Probe a persisted IVF-PQ index (see [[buildIvfPqIndex]]): rank the
    * nProbe nearest coarse centroids per query against the tiny persisted
    * centroid table, then ADC-score only the probed partitions' codes —
    * the probe keys reach the codes scan as a dynamic-partition-pruning
    * filter, so unprobed `centroid_id=` directories are never read. `m`
    * is read off the persisted codebooks (the index is self-describing).
    * Output: (query_id, item_id, rk) — identical to [[adcTopKRouted]]
    * with the same parameters.
    */
  def adcTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int, nProbe: Int = 4,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val centroids = broadcast(spark.read.parquet(s"$path/centroids"))
    val codebooks = spark.read.parquet(s"$path/codebooks")
    val m = codebooks.agg(max("sub")).head().getInt(0) + 1
    val scored = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .crossJoin(centroids)
      .withColumn("cdist", Similarity.cosine(col("query_vec"), col("cvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cdist"), col("centroid_id"))
    val probes = scored.withColumn("crk", row_number().over(w))
      .filter(col("crk") <= nProbe).select("query_id", "centroid_id")
    val lut = subVectors(queries, idCol, vecCol, m)
      .join(codebooks, Seq("sub"))
      .select(col(idCol).as("query_id"), col("sub"), col("code"),
        sqdistToCentroid.as("__pd"))
    val cand = spark.read.parquet(s"$path/codes")
      .join(broadcast(probes), Seq("centroid_id"))
      .select(col("query_id"), col("item_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val adist = (0 until m).map(s =>
        sum(when(col("sub") === s, col("__pd")))).reduce(_ + _)
    val byPair = cand.join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy("query_id", "item_id")
      .agg(adist.as("adist"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("item_id"))
    byPair.withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select(col("query_id"), col("item_id"), col("rk").cast("long").as("rk"))
  }
}
