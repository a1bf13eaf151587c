package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFns

/** Deduplication for large-scale corpus pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup. Everything is
  * expressed as joins/aggregations over exploded keys — the standard
  * shuffle-bounded formulation that scales horizontally; nothing collects to
  * the driver.
  *
  * Caching note: pair generators cache small per-call intermediates (the
  * shingle / signature / chunk tables) because each feeds multiple
  * consumers within the call. They are not unpersisted — the result is
  * lazy. For repeated sweeps (thresholds, band/row grids), persist
  * signatures once and re-band via `lshPairsFromSignatures`, and
  * `spark.catalog.clearCache()` between sweeps.
  */
object Dedup {

  /** See [[graft.ops.Scale.spread]] — parallelism guard for the CPU-heavy
    * shingling/hashing passes below.
    */
  private[ml] def spread(df: DataFrame): DataFrame = graft.ops.Scale.spread(df)

  /** Exact dedup on a canonicalized text hash: one hash-aggregate.
    * Output: one row per distinct content (hash, kept id = min id, dupe count).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(TextFns.fingerprint(col(textCol)).as("h"), col(idCol))
      .groupBy("h")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** doc → exploded distinct shingle rows, the base relation for set-overlap
    * dedup. `maxDf` drops shingles appearing in more than that many docs
    * (stop-shingles): they contribute little discrimination but quadratic
    * join blowup — the standard skew guard for content-key self-joins.
    */
  private def shingleTable(df: DataFrame, idCol: String, textCol: String,
                           n: Int, maxDf: Int): DataFrame = {
    // join on the 64-bit shingle hash, not the string: same partitioning
    // semantics, ~4x smaller shuffle payload and cheaper equi-compare
    // (collision odds across ~1e9 distinct shingles are ~1e-1 per *corpus*
    // for one pair, and a collision merely perturbs one overlap count).
    // shingleHashes never materializes the shingle strings at all.
    val sh = spread(df).select(col(idCol).as("id"),
        explode(TextFns.shingleHashes(col(textCol), n)).as("g"))
    if (maxDf <= 0) sh
    else {
      // one windowed count over g — a single shuffle that the downstream
      // self-join (also keyed on g) reuses, instead of a second full
      // shingle pass + aggregate + anti-join for the stop-shingle probe
      val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      sh.withColumn("__df", count(lit(1)).over(w))
        .filter(col("__df") <= maxDf).drop("__df")
    }
  }

  /** N-gram Jaccard similarity pairs (id_a < id_b, jaccard >= threshold).
    * Self-join on shingle → common counts; set sizes joined back. `maxDf`
    * (default 1000) drops stop-shingles before the self-join — without it
    * one shingle in d docs emits d² candidate rows. With maxDf > 0 the
    * jaccard is computed over the FILTERED shingle sets (numerator and
    * denominators consistently), a principled stop-word approximation; pass
    * maxDf <= 0 for exact brute-force Jaccard — the ground truth MinHash is
    * graded against in PipelineSpec.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.8,
                        maxDf: Int = 1000): DataFrame = {
    val sh = shingleTable(df, idCol, textCol, n, maxDf).cache()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = sh.as("a").join(sh.as("b"), Seq("g"))
      .where(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "sz" -> "sz_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "sz" -> "sz_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures via the custom single-buffer Catalyst aggregate
    * (graft.plans.MinHashAgg): one tight-loop pass over the shingle table,
    * map-side combinable, shuffling one k-long signature per doc partition.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, k: Int = 32, seed: Long = 42L): DataFrame = {
    val sh = spread(df).select(col(idCol).as("id"),
      explode(TextFns.shingleHashes(col(textCol), n)).as("hx"))
    val agg = org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.MinHashAgg(
        org.apache.spark.sql.graftshim.Shim.exprOf(col("hx")), k, seed)
        .toAggregateExpression())
    sh.groupBy("id").agg(agg.as("sig"))
  }

  /** Reference formulation of the signature (k separate min-aggregates) —
    * kept as the differential oracle for MinHashAgg.
    */
  private[graft] def minhashSignaturesComposed(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, seed: Long = 42L): DataFrame = {
    // 2^31 - 1 (Mersenne prime): keeps a*h+b < 2^62, no int64 overflow
    // under ANSI arithmetic while leaving collision odds ~n²/2p ≈ 1e-4 at
    // a 1M-shingle partition — fine for signature mins.
    val p = 2147483647L
    val rnd = new scala.util.Random(seed)
    val coeffs = Seq.fill(k)((math.abs(rnd.nextLong()) % (p - 1) + 1,
                              math.abs(rnd.nextLong()) % p))
    val sh = spread(df).select(col(idCol).as("id"),
      explode(TextFns.shingleHashes(col(textCol), n)).as("g"))
      .withColumn("hx", pmod(col("g"), lit(p)))
    val minExprs = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("hx") * lit(a) + lit(b), lit(p))).as(s"m$i")
    }
    sh.groupBy("id").agg(minExprs.head, minExprs.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash + LSH banding: B bands of R rows (K = B*R); docs sharing any
    * band bucket become candidates; candidates are verified by exact
    * signature agreement fraction (estimates Jaccard). Candidate generation
    * is an equi-join on (band, bucketHash) — shuffle-bounded, no n² pass.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 8, rows: Int = 4,
                      threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, n, bands * rows, seed).cache()
    lshPairsFromSignatures(sigs, bands, rows, threshold)
  }

  /** LSH banding over an existing `(id, sig)` signature table. At 100 TB the
    * signatures are the expensive pass — compute them once, persist bucketed
    * by id (Scale.writeBucketed), and re-band from storage for each threshold
    * or band/row sweep; downstream id-keyed joins (labels, docs) are then
    * exchange-free bucket-local joins.
    */
  def lshPairsFromSignatures(sigs: DataFrame, bands: Int = 8, rows: Int = 4,
                             threshold: Double = 0.8): DataFrame = {
    val k = bands * rows
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    // est_jaccard is identical for every duplicate of a pair (one per
    // colliding band), so score and filter BEFORE dropDuplicates: the
    // k-long signature arrays never enter the dedup shuffle, and only
    // above-threshold pairs do. Agreement is the codegen'd ArrayEqCount —
    // it runs once per candidate pair, the pipeline's biggest intermediate.
    val agree = org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.ArrayEqCount(
        org.apache.spark.sql.graftshim.Shim.exprOf(col("a.sig")),
        org.apache.spark.sql.graftshim.Shim.exprOf(col("b.sig"))))
    banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (agree.cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** SimHash: 64-bit locality-sensitive content hash. Per doc, each token
    * votes ±1 on each bit of its 64-bit hash; the sign of the per-bit sum is
    * the fingerprint bit. Computed as 64 conditional sums in ONE aggregate
    * over the exploded token table (map-side combinable).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = spread(df).select(col(idCol).as("id"),
      explode(array_distinct(TextFns.tokens(col(textCol)))).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(col("th").bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist. Candidates via
    * 4×16-bit chunk banding (pigeonhole: distance <=3 guarantees one equal
    * chunk), then exact popcount filter — no n² comparison. `maxBucket`
    * drops chunk buckets holding more than that many docs: one hot chunk
    * value (short/templated docs collapsing to similar fingerprints) emits
    * bucket² candidate rows, the quadratic failure mode at corpus scale.
    * Unlike Jaccard stop-shingles this CAN lose guaranteed candidates (a
    * pair's only shared chunk may be the dropped one), so the default is
    * generous; set <= 0 to disable.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, maxBucket: Int = 10000): DataFrame = {
    // one cache, at the chunk level: it feeds the hot-bucket probe and both
    // self-join sides; an additional signature-level cache would only pay
    // a second materialization for a single consumer
    val chunked0 = simhash(df, idCol, textCol).select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "ckey"))
      .cache()
    val chunked =
      if (maxBucket <= 0) chunked0
      else {
        // hot buckets (count > maxBucket) are few by construction — a tiny
        // aggregate + broadcast anti-join, NOT a window, which would
        // shuffle and sort the full chunk table once per self-join side
        val hot = chunked0.groupBy("chunk", "ckey")
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
          .select("chunk", "ckey")
        chunked0.join(broadcast(hot), Seq("chunk", "ckey"), "left_anti")
      }
    // hamming is identical for every duplicate of a pair (one per shared
    // chunk), so filter FIRST: the popcount is a codegen'd scalar while
    // dropDuplicates is a shuffle — dedup only the survivors, not the full
    // candidate set
    chunked.as("a").join(chunked.as("b"), Seq("chunk", "ckey"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }

  /** Connected components over a near-dup pair table ((id_a, id_b) edges):
    * iterative min-label propagation until fixpoint. Each iteration is one
    * join + aggregate (shuffle on vertex id); `localCheckpoint` truncates
    * lineage so plans stay bounded. Converges in O(diameter) iterations —
    * near-dup clusters are shallow (typically 2-5 hops), so this beats the
    * constant-factor-heavy large-star/small-star variant at realistic skew.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // both edge orientations in ONE pass over `pairs` (explode, not a
    // two-branch union, which would evaluate the — often expensive —
    // upstream pair computation twice). No distinct: every pair generator
    // here emits unique (id_a, id_b) rows already, and the per-iteration
    // min() aggregate is idempotent under duplicate edges anyway — the
    // distinct was a full extra shuffle of the edge table for nothing.
    val edges0 = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    // size the iteration to the graph: near-dup edge tables are usually a
    // tiny fraction of the corpus, and running O(diameter) join+agg rounds
    // at full parallelism is pure scheduling overhead. The count is one
    // cheap job over the already-materialized checkpoint blocks; coalesce
    // (not repartition) merges without a shuffle. Big graphs keep their
    // partitioning — this only ever narrows.
    val target = edges0.sparkSession.sparkContext.defaultParallelism
    val nPart = math.max(1L, math.min(target.toLong, edges0.count() / 250000L + 1)).toInt
    val edges = edges0.coalesce(nPart)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val t0 = if (dbg) System.nanoTime() else 0L
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_label")).as("nbr_label"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          coalesce(col("nbr_label") < col("label"), lit(false)).as("__chg"))
      // one real job per iteration: the localCheckpoint materialization.
      // The convergence probe is an aggregate over the checkpointed blocks —
      // a scan of the (tiny) cached labels, no recompute of the iteration.
      // (An Observation would fuse it into the checkpoint job itself, but
      // Observation.get blocks on the async listener bus, which under a
      // busy session adds SECONDS of wait per iteration — measured worse
      // than the extra micro-job.)
      val updated = next.localCheckpoint()
      converged = updated.agg(max(col("__chg"))).head() match {
        case r if r.isNullAt(0) => true // empty label table: nothing to do
        case r                  => !r.getBoolean(0)
      }
      labels = updated.drop("__chg")
      if (dbg) println(f"[cc] iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s converged=$converged")
      i += 1
    }
    labels // (id, label = cluster min id)
  }

  /** Resolve near-dup clusters to canonical rows: every row whose id is NOT
    * the minimum of its duplicate cluster is dropped. `pairs` is any
    * near-dup pair table (from exact/Jaccard/MinHash/SimHash/embedding).
    */
  def keepCanonical(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val dupes = connectedComponents(pairs)
      .filter(col("id") =!= col("label"))
      .select(col("id").as("__dup_id"))
    // no broadcast hint: at corpus scale the dupe set is unbounded (billions
    // of ids on a web crawl) — let AQE pick broadcast vs shuffle at runtime
    df.join(dupes, df(idCol) === col("__dup_id"), "left_anti")
  }

  /** Embedding near-dup pairs: cosine >= threshold via random-hyperplane LSH
    * bucketing + exact cosine verify. `planes` deterministic from seed.
    *
    * Requires ALL nPlanes bits to agree — the right recall/candidate
    * trade-off only for very tight thresholds (~0.99+), where the bit-flip
    * probability θ/π is tiny. For looser thresholds use
    * [[embeddingNearDupPairsBanded]].
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            dim: Int, threshold: Double = 0.95,
                            nPlanes: Int = 16, seed: Long = 42L): DataFrame = {
    val sigs = Similarity.hyperplaneSignature(df, idCol, vecCol, dim, nPlanes, seed)
      .select(col("id"), col("sig"), col("vec")).cache()
    sigs.as("a").join(sigs.as("b"), Seq("sig"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Banded hyperplane LSH for looser cosine thresholds (0.8–0.95): the
    * signature's `bands * rowsPerBand` bits are split into bands of
    * `rowsPerBand` bits; docs sharing ANY band's bits become candidates
    * (OR-amplification, same construction as MinHash banding), then exact
    * cosine verifies. P(candidate) = 1 - (1 - (1-θ/π)^r)^b — at cosine 0.9
    * (θ/π ≈ 0.144) a 7-bit band agrees with p ≈ 0.34, and 8 such bands
    * amplify to ≈96% recall, while near-orthogonal pairs almost never
    * collide. Candidate generation stays an equi-join on (band, key) —
    * shuffle-bounded, no n² pass, hot buckets bounded by `maxBucket` like
    * [[simhashPairs]].
    */
  def embeddingNearDupPairsBanded(df: DataFrame, idCol: String, vecCol: String,
                                  dim: Int, threshold: Double = 0.9,
                                  bands: Int = 8, rowsPerBand: Int = 7,
                                  seed: Long = 42L,
                                  maxBucket: Int = 100000): DataFrame = {
    require(bands * rowsPerBand <= 63, "signature packs into one long")
    val nPlanes = bands * rowsPerBand
    val sigs = Similarity.hyperplaneSignature(df, idCol, vecCol, dim, nPlanes, seed)
    val mask = (1L << rowsPerBand) - 1
    val banded0 = sigs.select(col("id"), col("vec"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("sig"), b * rowsPerBand).bitwiseAND(lit(mask))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey"))
      .cache()
    val banded =
      if (maxBucket <= 0) banded0
      else {
        val hot = banded0.groupBy("band", "bkey")
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
          .select("band", "bkey")
        banded0.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
      }
    // cosine is identical for every duplicate of a pair (one per colliding
    // band): score + threshold-filter first, dedup only the survivors
    banded.as("a").join(banded.as("b"), Seq("band", "bkey"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}
