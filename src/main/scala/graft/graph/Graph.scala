package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over plain (src, dst) edge DataFrames — the iterative
  * sibling of [[graft.ml.Dedup.connectedComponents]]. Reference scope:
  * siuba has no graph verbs; this extends the pipeline toolkit (link
  * analysis for crawl frontier prioritization / dedup-cluster authority).
  */
object Graph {

  /** Deterministic integer fixed-point PageRank.
    *
    *   PR_0(v)     = S div N
    *   PR_{t+1}(v) = (S·(10000−dampBp)) div (10000·N)
    *               + (dampBp · Σ_{u→v} (PR_t(u) div odeg(u))) div 10000
    *
    * Every operation is int64 with floor division and exact integer
    * summation — order-free, so the result is bit-identical under any
    * partitioning, merge order, or engine (a float PageRank can't be
    * hash-compared across engines; this one can). Mass lost to floor
    * rounding and dangling nodes drains deterministically — rankings, not
    * probabilities, are the contract. `scale` bounds: node masses never
    * exceed S, so the damping product stays ≤ S·10⁴ ≪ 2⁶³.
    *
    * Scale shape per iteration: one shuffle join of the rank vector with
    * the out-degree-annotated edge list (both partitioned by src) and one
    * aggregate on dst — the standard distributed PageRank step. Edges and
    * the node list are cached via the dedup registry
    * ([[graft.ml.Dedup.unpersistIntermediates]] releases them). The single
    * driver scalar is the node count (bounded, like the
    * connected-components convergence probe).
    */
  def pageRank(edges: DataFrame, iters: Int = 5, dampBp: Long = 8500L,
               scale: Long = 1000000000000L,
               seeds: Option[DataFrame] = None): DataFrame = {
    require(iters >= 0 && dampBp >= 0 && dampBp <= 10000 && scale > 0)
    val e = graft.ml.Dedup.trackCache(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct())
    val odeg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val ew = graft.ml.Dedup.trackCache(e.join(odeg, "src"))
    val nodes0 = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    // personalized variant: initial mass and teleport go ONLY to the seed
    // set (random-walk-with-restart similarity); identical integer
    // recurrence otherwise
    val (nodes, nTel) = seeds match {
      case None =>
        val nd = graft.ml.Dedup.trackCache(nodes0)
        val n = nd.count()
        (nd.withColumn("__seed", lit(true)), n)
      case Some(s) =>
        val sd = s.select(col(s.columns.head).cast("long").as("node"))
          .distinct()
        val nd = graft.ml.Dedup.trackCache(
          nodes0.join(sd.withColumn("__seed", lit(true)),
            Seq("node"), "left")
            .withColumn("__seed", coalesce(col("__seed"), lit(false))))
        (nd, nd.where(col("__seed")).count())
    }
    require(nTel > 0, "seed set must intersect the graph's nodes")
    val telep = (scale * (10000L - dampBp)) / (10000L * nTel)
    var pr = nodes.withColumn("mass",
      when(col("__seed"), lit(scale / nTel)).otherwise(lit(0L)))
    for (_ <- 1 to iters) {
      val contrib = pr.join(ew, col("node") === col("src"))
        .select(col("dst").as("node"), expr("mass div odeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), col("__seed"),
          (when(col("__seed"), lit(telep)).otherwise(lit(0L)) +
            expr(s"(${dampBp}L * coalesce(m, 0L)) div 10000L")).as("mass"))
    }
    pr.select("node", "mass")
  }
}
