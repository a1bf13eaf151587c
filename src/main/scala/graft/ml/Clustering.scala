package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic Lloyd's k-means over an embedding column, entirely as
  * DataFrame ops (reference scope: siuba has no clustering; this is part of
  * the training-data curation extension layer — topic bucketing, coverage
  * stats, embedding-space stratification).
  *
  * Shape per iteration — the classic scalable k-means:
  *   - ASSIGN: cross join against the BROADCAST k×dim centroid table,
  *     argmin of (‖c‖² − 2·v·c) (the ‖v‖² term is constant per row and
  *     dropped); ties break on centroid id. The scoring itself is map-side
  *     (broadcast, no data shuffle); the rank-filter argmin then exchanges
  *     once on `id`, reduced map-side by Spark 4's partial WindowGroupLimit
  *     (≤ k rows per id survive to the shuffle — PlanSpec pins the shape).
  *   - UPDATE: posexplode vectors → one (cluster, dim) partial-sum shuffle
  *     of k×dim×partitions rows → rebuild centroid arrays. The only shuffle,
  *     and it carries aggregated scalars, never vectors.
  * Init is the deterministic id-hash sample used by [[Similarity.ivfTopK]]
  * (k smallest hashes — `TakeOrderedAndProject`, no global sort). Clusters
  * that lose all members disappear (standard Lloyd degeneracy; pick a
  * better k). The data is re-scanned once per iteration — cache the input
  * for many iterations.
  *
  * Determinism: with integer-valued vector entries (e.g. quantized
  * `floor(x·1e6)`), every sum here is exact in double regardless of
  * aggregation order, so assignments are bit-reproducible across runs,
  * partitionings — and engines (the q_kmeans DuckDB oracle replays both
  * iterations bit-for-bit; dot products sum left-to-right on both sides).
  */
object Clustering {

  /** Run `iters` Lloyd iterations; returns (assignments, centroids):
    * assignments = (idCol, cluster), centroids = (cluster, centroid array).
    * `initHash` overrides the init-sample hash (e.g. an md5-derived
    * portable hash for engine-reproducible runs).
    */
  def kmeansFit(df: DataFrame, k: Int, iters: Int,
                idCol: String = "vec_id", vecCol: String = "embedding",
                initHash: Option[Column] = None): (DataFrame, DataFrame) = {
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be nonnegative")
    val src = graft.ops.Scale.spread(df)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
    val ch = initHash.getOrElse(xxhash64(col(idCol)))
    var centroids = df
      .select(ch.as("cid"), col(vecCol).as("cvec"))
      .orderBy("cid").limit(k)

    def assignTo(cents: DataFrame): DataFrame = {
      val scored = src.crossJoin(broadcast(cents))
        .withColumn("d",
          Similarity.dot(col("cvec"), col("cvec")) -
            lit(2.0) * Similarity.dot(col("v"), col("cvec")))
      val w = Window.partitionBy("id").orderBy(col("d"), col("cid"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select("id", "v", "cid")
    }

    var assigned = assignTo(centroids)
    for (_ <- 1 to iters) {
      centroids = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("s") / col("n")).as("m")))),
          e => e.getField("m")).as("cvec"))
      assigned = assignTo(centroids)
    }
    (assigned.select(col("id").as(idCol), col("cid").as("cluster")),
     centroids.select(col("cid").as("cluster"), col("cvec")))
  }

  /** [[kmeansFit]] returning just the (idCol, cluster) assignments. */
  def kmeans(df: DataFrame, k: Int, iters: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             initHash: Option[Column] = None): DataFrame =
    kmeansFit(df, k, iters, idCol, vecCol, initHash)._1

  /** Nearest-centroid assignment against a FIXED (cluster, cvec) table —
    * the serve/ingest half once [[kmeansFit]]'s centroids are persisted.
    * Same argmin + tie-break as training, so labels agree with a final
    * training assign exactly. Map-side only (broadcast centroids).
    */
  def assign(df: DataFrame, centroids: DataFrame,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val cents = centroids.select(col("cluster").as("cid"), col("cvec"))
    val scored = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(cents))
      .withColumn("d",
        Similarity.dot(col("cvec"), col("cvec")) -
          lit(2.0) * Similarity.dot(col("v"), col("cvec")))
    val w = Window.partitionBy("id").orderBy(col("d"), col("cid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("id").as(idCol), col("cid").as("cluster"))
  }
}
