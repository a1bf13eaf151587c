package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float/double>`).
  * Brute-force cosine top-k as the exact baseline; random-hyperplane LSH and
  * IVF (coarse-quantizer probing) as the sublinear scale paths. The inner
  * vector math is a custom codegen'd Catalyst expression
  * (graft.plans.DotProduct) — no UDFs, no interpreted lambda dispatch in the
  * dims × planes × rows hot loop.
  */
object Similarity {

  /** Dot product of two array columns (codegen'd custom expression). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.DotProduct(
        org.apache.spark.sql.graftshim.Shim.exprOf(a),
        org.apache.spark.sql.graftshim.Shim.exprOf(b)))

  /** Composed-builtins formulation — the differential oracle for DotProduct. */
  private[graft] def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random unit-ish hyperplanes from a seed.
    * private[graft]: the oracle generator interpolates these as SQL
    * literals to reproduce signatures outside Spark.
    */
  private[graft] def planes(dim: Int, nPlanes: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** All `nTables` hyperplane signatures of a vector in ONE codegen'd pass
    * (graft.plans.HyperplaneSigs) — `array<long>`, table t at index t+1.
    * The planes for table t are drawn from `seed + t`, bit-equal with the
    * composed per-plane formulation (differential-tested).
    */
  def hyperplaneSigsCol(vec: Column, dim: Int, nPlanes: Int, nTables: Int,
                        seed: Long = 42L): Column =
    org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.HyperplaneSigs(
        org.apache.spark.sql.graftshim.Shim.exprOf(vec),
        dim, nPlanes, nTables, seed))

  /** Sign-of-projection signature: nPlanes bits packed into a long. Rows with
    * equal signatures are cosine-similar candidates.
    */
  def hyperplaneSignature(df: DataFrame, idCol: String, vecCol: String,
                          dim: Int, nPlanes: Int = 16, seed: Long = 42L): DataFrame = {
    require(nPlanes <= 63, "signature packs into one long")
    graft.ops.Scale.spread(df).select(col(idCol).as("id"), col(vecCol).as("vec"),
      element_at(hyperplaneSigsCol(col(vecCol), dim, nPlanes, 1, seed), 1).as("sig"))
  }

  /** Johnson–Lindenstrauss-style random projection: reduce `vecCol` from
    * `dim` to `outDim` dimensions with the deterministic Gaussian planes
    * ([[planes]] — the same generator the LSH signatures interpolate), so
    * downstream ANN/dedup passes pay `outDim/dim` of the dot-product cost
    * while cosines distort by the JL bound. rvec[j] = ⟨vec, plane_j⟩, one
    * codegen'd map-only pass, no shuffle; every dot folds left-to-right
    * (the DotProduct discipline), so the reduced vectors — and everything
    * ranked on them — replay bitwise in DuckDB (q_rand_proj).
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, outDim: Int, seed: Long = 42L): DataFrame = {
    require(outDim >= 1 && outDim <= dim,
      "need 1 <= outDim <= dim (projection reduces)")
    val ps = planes(dim, outDim, seed)
    val rv = array(ps.map(p => dot(col(vecCol), lit(p.toArray))): _*)
    df.select(col(idCol), rv.as("rvec"))
  }

  /** Exact top-k by cosine for each query against the whole corpus.
    * Queries are broadcast (small side); the corpus streams — one pass, no
    * shuffle of the corpus. O(|corpus| * |queries|) compute: the ground
    * truth to grade approximate indexes against.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = graft.ops.Scale.spread(corpus)
      .select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.join(broadcast(q), col("item_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("item_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "item_id", "cosine", "rk")
  }

  /** LSH-bucketed approximate top-k: multi-probe over `nTables` independent
    * signatures. Candidates = corpus rows sharing any table's signature with
    * the query; exact cosine ranks candidates. Bucket join replaces the
    * all-pairs product — the scale path when queries aren't broadcastable.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              nPlanes: Int = 12, nTables: Int = 4, seed: Long = 42L): DataFrame = {
    def sigTable(df: DataFrame, name: String) = {
      // one HyperplaneSigs evaluation per row; the explode projection only
      // element_at's the materialized array (CollapseProject keeps the
      // expensive producer in its own projection)
      val withSigs = graft.ops.Scale.spread(df)
        .select(col(idCol).as(name + "_id"), col(vecCol).as(name + "_vec"),
          hyperplaneSigsCol(col(vecCol), dim, nPlanes, nTables, seed).as("__sigs"))
      val sigs = (0 until nTables).map { t =>
        struct(lit(t).as("table"), element_at(col("__sigs"), t + 1).as("sig"))
      }
      withSigs
        .select(col(name + "_id"), col(name + "_vec"),
          explode(array(sigs: _*)).as("ts"))
        .select(col(name + "_id"), col(name + "_vec"),
          col("ts.table").as("table"), col("ts.sig").as("sig"))
    }
    val c = sigTable(corpus, "item")
    val q = sigTable(queries, "query")
    val cand = c.join(q, Seq("table", "sig"))
      .where(col("item_id") =!= col("query_id"))
      .select("query_id", "query_vec", "item_id", "item_vec")
      .dropDuplicates("query_id", "item_id")
      .withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("item_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "item_id", "cosine", "rk")
  }

  /** KNN all-pairs join: for every row of `left`, the approximate top-k most
    * cosine-similar rows of `right` — corpus-to-corpus linking (retrieval
    * dedup, eval-set attribution), where NEITHER side is broadcast-small.
    * LSH-routed: both sides hash into `nTables` independent signature
    * tables, candidates come from an equi-join on (table, sig) — never a
    * cartesian. The bucket tables are slim (id, table, sig); vectors join
    * back once per unique candidate pair, so the nTables-wide candidate
    * shuffle never carries embeddings (same layout as the banded near-dup
    * cache). Asymmetric sizes are fine: each side shuffles once on its own
    * bucket keys, and if one side ends up broadcast-small AQE picks a BHJ on
    * its own. Left rows sharing no bucket with any right row are absent
    * (standard ANN semantics) — raise nTables or lower nPlanes for recall.
    * `excludeSelf` drops id-equal pairs for self-join dedup use.
    *
    * Multi-probe (`probeBits=1`, the default): the query side also emits
    * every signature within Hamming distance 1 — nPlanes extra slim rows per
    * (query, table), raising per-table collision probability several-fold
    * (Lv et al., VLDB'07). The corpus side stays single-sig, so the big
    * side's shuffle volume is unchanged.
    */
  def knnJoin(left: DataFrame, right: DataFrame, k: Int, dim: Int,
              leftIdCol: String = "vec_id", rightIdCol: String = "vec_id",
              vecCol: String = "embedding",
              nPlanes: Int = 12, nTables: Int = 4, seed: Long = 42L,
              excludeSelf: Boolean = false, probeBits: Int = 1,
              maxBucket: Int = 100000): DataFrame = {
    require(probeBits >= 0 && probeBits <= 1,
      "probeBits > 1 is a combinatorial blowup; compose more tables instead")
    def sigTable(df: DataFrame, id: String, outId: String, probe: Boolean) =
      knnSigTable(df, id, outId, probe, vecCol, dim, nPlanes, nTables, seed)
    val lb = sigTable(left, leftIdCol, "query_id", probe = probeBits == 1)
    val rb0 = sigTable(right, rightIdCol, "item_id", probe = false)
    // hot-bucket guard: a degenerate corpus bucket (duplicated/zero vectors
    // sharing one signature) would emit |bucket| rows per probing query —
    // the quadratic failure mode at corpus scale. Dedup.dropHotBuckets
    // rides the candidate join's own (table, sig) exchange of the corpus
    // side, so the guard adds no extra scan or shuffle.
    val rb = graft.ml.Dedup.dropHotBuckets(rb0, Seq("table", "sig"), maxBucket)
    val pairs0 = lb.join(rb, Seq("table", "sig"))
      .select("query_id", "item_id").dropDuplicates("query_id", "item_id")
    val pairs = if (excludeSelf) pairs0.where(col("query_id") =!= col("item_id"))
                else pairs0
    val lv = left.select(col(leftIdCol).as("query_id"), col(vecCol).as("query_vec"))
    val rv = right.select(col(rightIdCol).as("item_id"), col(vecCol).as("item_vec"))
    val scored = pairs.join(lv, Seq("query_id")).join(rv, Seq("item_id"))
      .withColumn("cosine", cosine(col("query_vec"), col("item_vec")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("item_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "item_id", "cosine", "rk")
  }

  /** The (id, table, sig) bucket relation [[knnJoin]]'s candidate join keys
    * on — one row per exact signature, plus (when `probe`) one per
    * Hamming-1 probe variant. Extracted so [[knnJoinCandidateVolume]]
    * counts the SAME relation the join consumes. The signature is
    * materialized once per table in its own projection; probe variants are
    * bit-flips of the materialized column (inlining the signature into
    * every probe struct would re-evaluate nPlanes dim-wide dot products
    * per probe — codegen does not CSE across the struct array; measured
    * 1.6x slower end-to-end. CollapseProject keeps the two projections
    * apart because the signature column is referenced nPlanes+1 times by
    * non-cheap expressions).
    */
  private def knnSigTable(df: DataFrame, id: String, outId: String,
                          probe: Boolean, vecCol: String, dim: Int,
                          nPlanes: Int, nTables: Int, seed: Long): DataFrame = {
    val withSigs = graft.ops.Scale.spread(df).select(col(id).as(outId),
      hyperplaneSigsCol(col(vecCol), dim, nPlanes, nTables, seed).as("__sigs"))
    val sigs = (0 until nTables).flatMap { t =>
      val base = element_at(col("__sigs"), t + 1)
      val exact = struct(lit(t).as("table"), base.as("sig"))
      val probes =
        if (probe) (0 until nPlanes).map(i =>
          struct(lit(t).as("table"), base.bitwiseXOR(lit(1L << i)).as("sig")))
        else Nil
      exact +: probes
    }
    withSigs
      .select(col(outId), explode(array(sigs: _*)).as("ts"))
      .select(col(outId), col("ts.table").as("table"), col("ts.sig").as("sig"))
  }

  /** [[knnJoin]]'s candidate volume after the hot-bucket guard — Σ per
    * (table, sig) bucket of |query probes| × |guarded corpus rows|, the
    * exact number of (query, item) rows the bucket equi-join emits before
    * dedup/verification, computed from the two sides' bucket sizes only
    * (see [[graft.ml.Dedup.lshCandidateVolume]] for the gate's rationale).
    * For a FIXED query set this must grow ∝ corpus rows — ScalingSpec
    * gates it. One row: (n_candidates).
    */
  private[graft] def knnJoinCandidateVolume(left: DataFrame, right: DataFrame,
      dim: Int, leftIdCol: String = "vec_id", rightIdCol: String = "vec_id",
      vecCol: String = "embedding", nPlanes: Int = 12, nTables: Int = 4,
      seed: Long = 42L, probeBits: Int = 1,
      maxBucket: Int = 100000): DataFrame = {
    require(probeBits >= 0 && probeBits <= 1,
      "probeBits > 1 is a combinatorial blowup; compose more tables instead")
    val lb = knnSigTable(left, leftIdCol, "query_id", probeBits == 1,
      vecCol, dim, nPlanes, nTables, seed)
    val rb = graft.ml.Dedup.dropHotBuckets(
      knnSigTable(right, rightIdCol, "item_id", probe = false,
        vecCol, dim, nPlanes, nTables, seed),
      Seq("table", "sig"), maxBucket)
    lb.groupBy("table", "sig").agg(count(lit(1)).as("__nl"))
      .join(rb.groupBy("table", "sig").agg(count(lit(1)).as("__nr")),
        Seq("table", "sig"))
      .agg(coalesce(sum(col("__nl") * col("__nr")), lit(0L))
        .cast("long").as("n_candidates"))
  }

  /** Composed per-plane formulation — the differential oracle for
    * HyperplaneSigs (bit-equality pinned in PipelineSpec). Not used on the
    * hot path: each plane is a separate DotProduct against a literal array.
    */
  private[graft] def hyperplaneSigColComposed(vec: Column, dim: Int,
                                              nPlanes: Int, seed: Long): Column = {
    val ps = planes(dim, nPlanes, seed)
    ps.zipWithIndex.map { case (p, i) =>
      when(dot(vec, array(p.map(lit): _*)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact-cosine re-rank of a (query_id, item_id) candidate relation —
    * the FAISS-style `refine` stage of two-stage retrieval: an index
    * answers from compressed codes ([[graft.ml.Pq.adcTopK]] /
    * `adcTopKRouted` / `adcTopKFromIndex`) or buckets ([[knnJoin]]),
    * then only the k'-per-query surviving candidates pay an exact
    * distance against the ORIGINAL vectors. Composes with any candidate
    * generator that emits (query_id, item_id). Scale shape: the vector
    * fetch is two hash equi-joins keyed by id — k' point lookups per
    * query against the vector store, never a scan — and the final top-k
    * is a per-query rank over ≤ k' rows. Ties break on (cosine desc,
    * item_id), the [[bruteForceTopK]] convention, and the cosine is the
    * exact left-to-right [[dot]], so with quantized vectors the refined
    * ranking replays bit-for-bit (q_pq_refine's oracle).
    * Output: (query_id, item_id, cosine, rk).
    */
  def refineTopK(candidates: DataFrame, queries: DataFrame,
                 corpus: DataFrame, k: Int,
                 queryIdCol: String = "vec_id",
                 corpusIdCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val qv = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("__qv"))
    val iv = corpus.select(col(corpusIdCol).as("item_id"),
      col(vecCol).as("__iv"))
    // defensively dedup: a multi-band/multi-table generator may surface a
    // pair once per collision, and a duplicated pair must not occupy two
    // of the k result slots (no-op shuffle-wise for already-distinct
    // inputs like the ADC rankers — the slim pair relation is the cheap
    // thing to exchange here)
    val scored = candidates.select("query_id", "item_id")
      .dropDuplicates("query_id", "item_id")
      .join(qv, Seq("query_id"))
      .join(iv, Seq("item_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__iv")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), col("item_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("item_id"), col("cosine"),
        col("rk").cast("long").as("rk"))
  }

  /** Hard-negative mining for contrastive training data (the DPR /
    * sentence-transformers recipe: the best negatives are the most
    * similar NON-positives, not random draws): from ANY scored candidate
    * relation (query_id, item_id, cosine) — a [[bruteForceTopK]] /
    * [[lshTopK]] / [[graft.ml.Sq.sqTopK]] / [[graft.ml.Pq.adcTopKRouted]]
    * output, over-fetched to k + |positives per query| — drop each
    * query's positive items (one left-anti hash join against the
    * (query_id, item_id) positives relation) and re-rank what remains to
    * the top `k` hardest negatives. Output: (query_id, item_id, cosine,
    * rk), ties on item_id. The per-query window runs over candidate rows
    * only (bounded by the generator's k', never the corpus) — the
    * [[refineTopK]] shape.
    */
  def hardNegatives(candidates: DataFrame, positives: DataFrame,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val pos = positives.select(col("query_id"), col("item_id"))
    val neg = candidates
      .select(col("query_id"), col("item_id"), col("cosine"))
      .join(pos, Seq("query_id", "item_id"), "left_anti")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), col("item_id"))
    neg.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Recall@k of an approximate ranker against the exact one: per query,
    * |truth ∩ approx| / |truth| over the two (query_id, item_id) top-k sets,
    * plus a corpus-level macro average row with query_id NULL. The standard
    * ANN evaluation harness, as an operator — one inner join + two small
    * aggregates, usable at any corpus size (both inputs are already top-k).
    */
  def recallAtK(truth: DataFrame, approx: DataFrame): DataFrame = {
    val t = truth.select(col("query_id"), col("item_id"))
    val a = approx.select(col("query_id"), col("item_id"))
    val hits = t.join(a, Seq("query_id", "item_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    val per = t.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("query_id"), "left")
      .withColumn("recall",
        round(coalesce(col("hits"), lit(0L)).cast("double") / col("n_truth"), 4))
      .select(col("query_id"), col("recall"))
    // macro row's NULL query_id typed from the input schema: a hardcoded
    // long cast would silently coerce a string-keyed truth table's whole
    // column through union type coercion
    val qidType = truth.schema(truth.schema.fieldIndex("query_id")).dataType
    val macroAvg = per.agg(round(avg("recall"), 4).as("recall"))
      .withColumn("query_id", lit(null).cast(qidType))
      .select(col("query_id"), col("recall"))
    per.unionByName(macroAvg)
  }

  /** Persist an IVF index: `<path>/centroids` (nCentroids rows — tiny) and
    * `<path>/assignments`, the corpus re-written ONCE partitioned by
    * `centroid_id`. [[ivfTopKFromIndex]] then probes the persisted layout
    * repeatedly without re-deriving anything — the build-once/probe-many
    * shape real ANN serving needs. At 100 TB the partitioned layout is the
    * point: a probe batch touching `nProbe` centroids per query reads ONLY
    * those directories (dynamic partition pruning against the broadcast
    * probe table); unprobed partitions are never scanned.
    * Centroid choice matches [[ivfTopK]] (same deterministic id-hash
    * sample), so index and inline answers agree exactly.
    */
  def buildIvfIndex(corpus: DataFrame, path: String, nCentroids: Int = 16,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    centroidHash: Option[Column] = None): Unit = {
    val ch = centroidHash.getOrElse(xxhash64(col(idCol)))
    corpus.select(ch.as("centroid_id"), col(vecCol).as("cvec"))
      .orderBy("centroid_id").limit(nCentroids)
      .write.mode("overwrite").parquet(s"$path/centroids")
    val spark = corpus.sparkSession
    val centroids = broadcast(spark.read.parquet(s"$path/centroids"))
    val scored = graft.ops.Scale.spread(corpus)
      .select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
      .crossJoin(centroids)
      .withColumn("cdist", cosine(col("item_vec"), col("cvec")))
    val w = Window.partitionBy("item_id").orderBy(desc("cdist"), col("centroid_id"))
    scored.withColumn("crk", row_number().over(w)).filter(col("crk") === 1)
      .select(col("item_id"), col("item_vec"), col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/assignments")
  }

  /** Probe a persisted IVF index (see [[buildIvfIndex]]): rank the nProbe
    * nearest centroids per query against the tiny centroid table, then join
    * the broadcast probe set against the partitioned assignment table —
    * the probe keys reach the scan as a dynamic-partition-pruning filter,
    * so only probed `centroid_id=` directories are read. Same candidate
    * ranking as [[ivfTopK]].
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int, nProbe: Int = 4,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val centroids = broadcast(spark.read.parquet(s"$path/centroids"))
    val scored = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .crossJoin(centroids)
      .withColumn("cdist", cosine(col("query_vec"), col("cvec")))
    val w = Window.partitionBy("query_id").orderBy(desc("cdist"), col("centroid_id"))
    val probes = scored.withColumn("crk", row_number().over(w))
      .filter(col("crk") <= nProbe)
      .select(col("query_id"), col("query_vec"), col("centroid_id"))
    val assignments = spark.read.parquet(s"$path/assignments")
    val cand = assignments.join(broadcast(probes), Seq("centroid_id"))
      .where(col("item_id") =!= col("query_id"))
      .dropDuplicates("query_id", "item_id")
      .withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w2 = Window.partitionBy("query_id").orderBy(desc("cosine"), col("item_id"))
    cand.withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select("query_id", "item_id", "cosine", "rk")
  }

  /** IVF (inverted-file) index: a deterministic sample of corpus vectors acts
    * as the coarse quantizer; every vector is assigned to its nearest
    * centroid partition. Queries probe the `nProbe` nearest centroids and
    * rank only those partitions — the classic sublinear ANN layout. At
    * cluster scale the assignment table would be written bucketed by
    * `centroid_id` so probes are partition-pruned scans.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              centroidHash: Option[Column] = None): DataFrame = {
    // deterministic pseudo-random centroid sample: the nCentroids smallest
    // id-hashes (centroidHash overrides the hash, e.g. portableHash64 for
    // engine-reproducible centroid choice). orderBy+limit plans as
    // TakeOrderedAndProject — each partition keeps its local top-N, one
    // tiny merge — no global sort, no driver-side count() pass over the
    // corpus.
    // registered with Dedup's intermediate registry: nCentroids vectors is
    // tiny, but long-lived sessions sweeping k/nProbe would otherwise
    // accumulate one pinned centroid table per call
    val ch = centroidHash.getOrElse(xxhash64(col(idCol)))
    val centroids = Dedup.trackCache(corpus
      .select(ch.as("centroid_id"), col(vecCol).as("cvec"))
      .orderBy("centroid_id").limit(nCentroids))

    def assign(df: DataFrame, name: String, nNearest: Int) = {
      val scored = graft.ops.Scale.spread(df)
        .select(col(idCol).as(name + "_id"), col(vecCol).as(name + "_vec"))
        .crossJoin(broadcast(centroids))
        .withColumn("cdist", cosine(col(name + "_vec"), col("cvec")))
      // centroid_id tie-break: equal-distance (or NaN) centroids must pick
      // the same winner on every run for deterministic assignment
      val w = Window.partitionBy(name + "_id").orderBy(desc("cdist"), col("centroid_id"))
      scored.withColumn("crk", row_number().over(w)).filter(col("crk") <= nNearest)
        .select(col(name + "_id"), col(name + "_vec"), col("centroid_id"))
    }
    val items = assign(corpus, "item", 1)
    val probes = assign(queries, "query", nProbe)
    val cand = items.join(probes, Seq("centroid_id"))
      .where(col("item_id") =!= col("query_id"))
      .dropDuplicates("query_id", "item_id")
      .withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("item_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "item_id", "cosine", "rk")
  }
}
