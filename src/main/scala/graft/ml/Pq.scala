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
    * order can never perturb a rank. Output: (query_id, item_id, rk).
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
}
