package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalar (per-dimension uniform 8-bit) vector quantization — the SQ8
  * tier of a retrieval stack (Jégou et al.'s product-quantization paper
  * frames SQ as the baseline; FAISS ships it as `ScalarQuantizer` with
  * `QT_8bit`): each dimension is linearly bucketed into 256 levels
  * between its corpus-wide min and max, so a d-dim float vector becomes d
  * bytes — 4× smaller than float32, 8× smaller than the double arrays the
  * exact rankers scan — while reconstruction stays within half a level
  * per dimension. Reference scope: siuba has nothing like this; it
  * belongs to the training-data extension layer between
  * [[Similarity.bruteForceTopK]] (exact, full-width) and [[Pq]] (PQ
  * codes, coarsest): SQ8 is what you reach for when the corpus no longer
  * fits in memory as floats but PQ's distortion is too much for the
  * recall target.
  *
  * Determinism contract: training is two exact aggregates (per-dimension
  * min/max — the bounds ARE corpus values, no estimation), encoding is
  * one clamp+floor expression, reconstruction one affine expression, and
  * ranking reuses the [[Similarity.dot]] codegen (fixed left-to-right
  * summation), so the whole train → encode → probe pipeline replays in
  * DuckDB and hash-matches (q_sq8_topk / q_sq8_recall).
  *
  * Shapes at 100 TB: bounds are a dim-row relation (one map-side-combined
  * aggregate over the exploded corpus — the only corpus-wide pass);
  * encoding is map-only; the probe scans CODES (¼ the bytes of a float
  * scan — at 100 TB of vectors that is the difference between a 25 TB
  * and a 100 TB read), reconstructing rows on the fly inside whole-stage
  * codegen against dim-bounded literal bound arrays (no join, no
  * broadcast table). Codes persist as parquet int arrays whose values
  * fit 8 bits — parquet's RLE/bit-pack dictionary encoding stores them
  * at ~1 byte each, so the on-disk artifact keeps SQ8's 4× advantage.
  */
object Sq {

  /** Per-dimension corpus bounds: (d, mn, mx) — `dim` rows, 0-based `d`.
    * One posexplode + one map-side-combined min/max aggregate; this is
    * SQ8's entire training pass. Cast `vecCol` to `array<double>` first
    * (the family convention — the oracle replays on DOUBLE[]).
    */
  def sqBounds(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("mn"), max("x").as("mx"))

  /** Driver-collected bounds arrays, ordered by dimension — dim-bounded
    * (the [[Pq]] codebook / k-means centroid read pattern: tens of rows,
    * never data). Requires a dense 0..dim−1 dimension set (a bounds
    * relation from [[sqBounds]] always is).
    */
  def boundsArrays(bounds: DataFrame): (Seq[Double], Seq[Double]) = {
    val rows = bounds.select("d", "mn", "mx").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    require(rows.nonEmpty, "bounds relation is empty")
    require(rows.map(_._1) == rows.indices.map(identity),
      "bounds must cover dimensions 0..dim-1 exactly once")
    (rows.map(_._2), rows.map(_._3))
  }

  /** Encode vectors against frozen bounds:
    *   code[d] = clamp(floor((x[d] − mn[d]) · 255 / (mx[d] − mn[d])), 0, 255)
    * (degenerate dimensions — mx = mn — encode 0). Values outside the
    * trained bounds clamp, so appending out-of-distribution batches stays
    * well-defined (they saturate; re-train bounds when that matters — the
    * [[Pq.rebuildAdvised]] drift argument applies verbatim). Map-only,
    * pure codegen: the bounds ride as dim-length literal arrays, never a
    * join. Output: (idCol, codes array&lt;int&gt; with 8-bit values).
    */
  def sqEncode(df: DataFrame, idCol: String, vecCol: String,
               mns: Seq[Double], mxs: Seq[Double]): DataFrame = {
    require(mns.size == mxs.size && mns.nonEmpty, "bounds arrays mismatch")
    df.select(col(idCol), encodeExpr(col(vecCol), mns, mxs).as("codes"))
  }

  /** The encode expression itself — [[sqEncode]]'s kernel, exposed so
    * composite builders ([[buildIvfSqIndex]]) can encode alongside other
    * columns in one projection. */
  private[graft] def encodeExpr(vec: Column, mns: Seq[Double],
                                mxs: Seq[Double]): Column = {
    val mnA = array(mns.map(lit): _*)
    val mxA = array(mxs.map(lit): _*)
    transform(vec, (x, d) => {
      val mn = element_at(mnA, d + 1)
      val mx = element_at(mxA, d + 1)
      when(mx === mn, lit(0)).otherwise(
        least(lit(255.0), greatest(lit(0.0),
          floor((x - mn) * lit(255.0) / (mx - mn)))).cast("int"))
    })
  }

  /** Mid-level reconstruction of a code array:
    *   x̂[d] = mn[d] + (code[d] + 0.5) · (mx[d] − mn[d]) / 255
    * (a degenerate dimension's span term is exactly 0, so x̂[d] = mn[d] —
    * no guard needed). Shared by [[sqTopK]] and the oracle replay; the
    * association order is fixed and mirrored in SQL.
    */
  private[graft] def reconstruct(codes: Column, mnA: Column,
                                 mxA: Column): Column =
    transform(codes, (c, d) =>
      element_at(mnA, d + 1) + (c.cast("double") + lit(0.5)) *
        (element_at(mxA, d + 1) - element_at(mnA, d + 1)) / lit(255.0))

  /** Approximate top-k over SQ8 codes: reconstruct each code row on the
    * fly and rank by exact cosine against the (broadcast-bounded) query
    * batch — [[Similarity.bruteForceTopK]]'s contract at ¼ the scan
    * bytes. Output: (query_id, item_id, cosine, rk), self-pairs excluded,
    * ties on item_id ascending. The scan is the operator — compose with
    * an IVF route when even the code scan is too much
    * ([[Similarity.buildIvfIndex]] partitions; SQ8 codes slot into its
    * assignment layout unchanged).
    */
  def sqTopK(codes: DataFrame, queries: DataFrame, k: Int,
             mns: Seq[Double], mxs: Seq[Double],
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    require(mns.size == mxs.size && mns.nonEmpty, "bounds arrays mismatch")
    val mnA = array(mns.map(lit): _*)
    val mxA = array(mxs.map(lit): _*)
    val c = graft.ops.Scale.spread(codes)
      .select(col(idCol).as("item_id"),
        reconstruct(col("codes"), mnA, mxA).as("item_vec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec"))
    val scored = c.join(broadcast(q), col("item_id") =!= col("query_id"))
      .withColumn("cosine",
        Similarity.cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), col("item_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "item_id", "cosine", "rk")
  }

  /** Persist an SQ8 index: `<path>/bounds` (dim rows) and `<path>/codes`
    * (the corpus encoded once) — the train-once / probe-forever split of
    * [[Similarity.buildIvfIndex]] / [[Pq.buildIvfPqIndex]] applied to the
    * scalar quantizer. Codes are encoded against the WRITTEN bounds, so
    * artifact halves can never disagree.
    */
  def buildSqIndex(corpus: DataFrame, path: String,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): Unit = {
    sqBounds(corpus, vecCol).write.mode("overwrite")
      .parquet(s"$path/bounds")
    val spark = corpus.sparkSession
    val (mns, mxs) = boundsArrays(spark.read.parquet(s"$path/bounds"))
    sqEncode(corpus, idCol, vecCol, mns, mxs)
      .write.mode("overwrite").parquet(s"$path/codes")
    // baseline ledger row (batch_seq 0): by construction the training
    // corpus never clamps (the bounds ARE its extremes) — the row records
    // the corpus cell count the append fractions are read against
    writeSatRow(spark, path, corpus, vecCol, mns, mxs, seq = 0L,
      overwrite = true)
  }

  /** Probe a persisted [[buildSqIndex]] artifact — reads the dim-row
    * bounds (driver-bounded) and ranks the frozen codes; bit-identical to
    * the in-memory pipeline (SqSpec pins it).
    */
  def sqTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, queries: DataFrame, k: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val (mns, mxs) = boundsArrays(spark.read.parquet(s"$path/bounds"))
    sqTopK(spark.read.parquet(s"$path/codes"), queries, k, mns, mxs,
      idCol, vecCol)
  }

  /** Append a batch to a persisted SQ8 index in O(batch): encode against
    * the FROZEN bounds and append-write the codes — out-of-range values
    * clamp (quantization error grows; the bounds stay authoritative, so
    * every probe remains exactly replayable). The [[Pq.appendToIvfPqIndex]]
    * policy applies: monitor saturation and rebuild when the distribution
    * has drifted; [[saturationStats]] measures exactly that.
    */
  def appendToSqIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, batch: DataFrame,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val (mns, mxs) = boundsArrays(spark.read.parquet(s"$path/bounds"))
    sqEncode(batch, idCol, vecCol, mns, mxs)
      .write.mode("append").parquet(s"$path/codes")
    val seq = spark.read.parquet(s"$path/stats")
      .agg(max("batch_seq")).head().getLong(0) + 1L
    writeSatRow(spark, path, batch, vecCol, mns, mxs, seq,
      overwrite = false)
  }

  /** One `<path>/stats` ledger row for a batch: (batch_seq, n_cells,
    * n_low, n_high, sat_frac) under the index's frozen bounds — the SQ
    * twin of [[Pq.appendToIvfPqIndex]]'s residual ledger, making the
    * documented re-train policy operational. */
  private def writeSatRow(spark: org.apache.spark.sql.SparkSession,
                          path: String, batch: DataFrame, vecCol: String,
                          mns: Seq[Double], mxs: Seq[Double], seq: Long,
                          overwrite: Boolean): Unit =
    saturationStats(batch, vecCol, mns, mxs)
      .select(lit(seq).as("batch_seq"), col("n_cells"), col("n_low"),
        col("n_high"), col("sat_frac"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .parquet(s"$path/stats")

  /** The operational re-train signal of an SQ8 index: true when the
    * LATEST appended batch clamps more than `threshold` of its cells
    * against the frozen bounds. Unlike [[Pq.rebuildAdvised]]'s
    * ratio-vs-baseline, the SQ baseline saturation is exactly 0 by
    * construction (the bounds ARE the training corpus' extremes), so the
    * signal is the absolute clamped fraction. False when nothing has
    * been appended. Reads the tiny stats relation only — O(1), never
    * touches codes.
    */
  def rebuildAdvised(spark: org.apache.spark.sql.SparkSession,
                     path: String, threshold: Double = 0.01): Boolean = {
    require(threshold > 0, "threshold must be positive")
    val latest = spark.read.parquet(s"$path/stats")
      .filter(col("batch_seq") > 0)
      .orderBy(desc("batch_seq")).limit(1)
      .select("sat_frac").collect()
    latest.nonEmpty && latest(0).getDouble(0) > threshold
  }

  /** Per-batch saturation diagnostics against frozen bounds: the fraction
    * of (row, dimension) cells clamping at 0 or 255 — the SQ analogue of
    * [[Pq.quantizationResiduals]]. In-distribution batches clamp only at
    * the exact corpus extremes (a few cells per dimension at most);
    * a shifted batch saturates a visible fraction. One aggregate row:
    * (n_cells, n_low, n_high, sat_frac).
    */
  def saturationStats(batch: DataFrame, vecCol: String,
                      mns: Seq[Double], mxs: Seq[Double]): DataFrame = {
    val mnA = array(mns.map(lit): _*)
    val mxA = array(mxs.map(lit): _*)
    batch
      .select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(element_at(mnA, col("d") + 1).as("mn"),
        element_at(mxA, col("d") + 1).as("mx"), col("x"))
      .agg(count(lit(1)).as("n_cells"),
        sum(when(col("x") < col("mn"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("x") > col("mx"), 1L).otherwise(0L)).as("n_high"))
      .withColumn("sat_frac",
        (col("n_low") + col("n_high")).cast("double") / col("n_cells"))
  }

  /** Persist an IVF-routed SQ8 index — FAISS's `IVF<n>,SQ8` layout, the
    * composition both tiers were built for: `<path>/centroids` (a
    * deterministic id-hash sample, [[Similarity.buildIvfIndex]]'s coarse
    * quantizer), `<path>/bounds` (dim rows), and `<path>/codes` — the
    * corpus SQ8-encoded ONCE and written partitioned by `centroid_id`.
    * At 100 TB this stacks both savings: a probe reads only its nProbe
    * centroid directories (dynamic partition pruning) AND those
    * directories hold 8-bit codes, so the scanned bytes are
    * (nProbe/nCentroids) · ¼ of a flat float scan.
    */
  def buildIvfSqIndex(corpus: DataFrame, path: String, nCentroids: Int = 16,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      centroidHash: Option[Column] = None): Unit = {
    val ch = centroidHash.getOrElse(xxhash64(col(idCol)))
    corpus.select(ch.as("centroid_id"), col(vecCol).as("cvec"))
      .orderBy("centroid_id").limit(nCentroids)
      .write.mode("overwrite").parquet(s"$path/centroids")
    sqBounds(corpus, vecCol).write.mode("overwrite")
      .parquet(s"$path/bounds")
    val spark = corpus.sparkSession
    val (mns, mxs) = boundsArrays(spark.read.parquet(s"$path/bounds"))
    val centroids = broadcast(spark.read.parquet(s"$path/centroids"))
    val scored = graft.ops.Scale.spread(corpus)
      .select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
      .crossJoin(centroids)
      .withColumn("cdist",
        Similarity.cosine(col("item_vec"), col("cvec")))
    val w = Window.partitionBy("item_id")
      .orderBy(desc("cdist"), col("centroid_id"))
    scored.withColumn("crk", row_number().over(w)).filter(col("crk") === 1)
      .select(col("item_id"),
        encodeExpr(col("item_vec"), mns, mxs).as("codes"),
        col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/codes")
  }

  /** Probe a persisted [[buildIvfSqIndex]]: rank the nProbe nearest
    * centroids per query against the tiny centroid table (broadcast-
    * bounded), join the broadcast probe set against the partitioned code
    * table — the probe keys reach the scan as a dynamic-partition-pruning
    * filter, so only probed `centroid_id=` directories are read — then
    * reconstruct and rank by exact cosine, [[sqTopK]]'s contract over
    * (nProbe/nCentroids) of the code bytes.
    */
  def ivfSqTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, queries: DataFrame, k: Int,
                         nProbe: Int = 4, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val (mns, mxs) = boundsArrays(spark.read.parquet(s"$path/bounds"))
    val mnA = array(mns.map(lit): _*)
    val mxA = array(mxs.map(lit): _*)
    val centroids = broadcast(spark.read.parquet(s"$path/centroids"))
    val scored = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .crossJoin(centroids)
      .withColumn("cdist",
        Similarity.cosine(col("query_vec"), col("cvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cdist"), col("centroid_id"))
    val probes = scored.withColumn("crk", row_number().over(w))
      .filter(col("crk") <= nProbe)
      .select(col("query_id"), col("query_vec"), col("centroid_id"))
    val codes = spark.read.parquet(s"$path/codes")
    val cand = codes.join(broadcast(probes), Seq("centroid_id"))
      .where(col("item_id") =!= col("query_id"))
      .dropDuplicates("query_id", "item_id")
      .withColumn("cosine", Similarity.cosine(
        reconstruct(col("codes"), mnA, mxA), col("query_vec")))
    val w2 = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), col("item_id"))
    cand.withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select("query_id", "item_id", "cosine", "rk")
  }

  /** Recall report of an approximate top-k against the exact one — the
    * evaluation harness every ANN tier ships with, in its EXACT form:
    * per query (query_id, hits, n_truth, recall = hits / n_truth), plus a
    * corpus-level MICRO row (query_id NULL, Σhits, Σtruth, Σhits/Σtruth).
    * Unlike a mean of per-query ratios, every number here is integer
    * arithmetic until one final division, so the report replays bitwise
    * in the oracle (q_sq8_recall) — the [[Similarity.recallAtK]] sibling
    * with the macro average made order-invariant. Both inputs are already
    * top-k relations; one equi-join + two bounded aggregates.
    */
  def recallReport(truth: DataFrame, approx: DataFrame): DataFrame = {
    val t = truth.select(col("query_id"), col("item_id"))
    val a = approx.select(col("query_id"), col("item_id"))
    val hits = t.join(a, Seq("query_id", "item_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    val per = t.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("hits"),
        col("n_truth"))
    val qidType = truth.schema(truth.schema.fieldIndex("query_id")).dataType
    val micro = per.agg(sum("hits").as("hits"), sum("n_truth").as("n_truth"))
      .select(lit(null).cast(qidType).as("query_id"), col("hits"),
        col("n_truth"))
    per.unionByName(micro)
      .withColumn("recall",
        when(col("n_truth") > 0,
          round(col("hits") / col("n_truth"), 6)))
  }
}
