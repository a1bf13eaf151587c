package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over plain (src, dst) edge DataFrames — the iterative
  * sibling of [[graft.ml.Dedup.connectedComponents]]. Reference scope:
  * siuba has no graph verbs; this extends the pipeline toolkit (link
  * analysis for crawl frontier prioritization / dedup-cluster authority).
  */
object Graph {

  /** localCheckpoint + release of blocks pinned by PREVIOUS checkpoints of
    * the same iterative chain — the per-iteration lineage-truncation
    * pattern of [[graft.ml.Dedup.connectedComponents]], factored for the
    * fixed-iteration loops here. Returns (checkpointed df, this
    * checkpoint's block ids) so the caller can thread stale ids through.
    */
  private def checkpointReplacing(df: DataFrame,
                                  stale: Set[Int]): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val pre = sc.getPersistentRDDs.keySet.toSet
    val cp = df.localCheckpoint()
    // the new checkpoint is materialized (localCheckpoint is eager): blocks
    // of the previous one are unreachable from live lineage — release them
    stale.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    (cp, sc.getPersistentRDDs.keySet.toSet -- pre)
  }

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
               seeds: Option[DataFrame] = None,
               checkpointInterval: Int = 10): DataFrame = {
    require(iters >= 0 && dampBp >= 0 && dampBp <= 10000 && scale > 0)
    require(checkpointInterval > 0)
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
    var stale = Set.empty[Int]
    for (i <- 1 to iters) {
      val contrib = pr.join(ew, col("node") === col("src"))
        .select(col("dst").as("node"), expr("mass div odeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), col("__seed"),
          (when(col("__seed"), lit(telep)).otherwise(lit(0L)) +
            expr(s"(${dampBp}L * coalesce(m, 0L)) div 10000L")).as("mass"))
      // periodic lineage truncation: each iteration's plan nests the
      // previous one, and past ~25 nested join+agg rounds analysis and task
      // serialization blow up. Values are bit-identical with or without the
      // checkpoint (integer arithmetic; truncation is plan-only) —
      // GraphSpec pins iters=40 == chunk-free recurrence.
      if (i % checkpointInterval == 0 && i < iters) {
        val (cp, ids) = checkpointReplacing(pr, stale)
        pr = cp; stale = ids
      }
    }
    registerFinalRelease(pr, stale)
    pr.select("node", "mass")
  }

  /** The LAST checkpoint of an iterative chain stays pinned (it is not
    * recomputable); hand its blocks to the dedup registry so
    * [[graft.ml.Dedup.unpersistIntermediates]] releases them with the rest
    * of a pipeline's state — after results are consumed, per its contract.
    */
  private def registerFinalRelease(df: DataFrame, ids: Set[Int]): Unit =
    if (ids.nonEmpty) {
      val sc = df.sparkSession.sparkContext
      graft.ml.Dedup.trackRelease(() =>
        ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))))
    }

  /** Deterministic synchronous label propagation (community detection).
    *
    * Every node starts labeled with its own id; each iteration, every node
    * adopts the most frequent label among its IN-neighbors (ties broken by
    * the smallest label; nodes with no in-edges keep their label). Labels
    * flow src→dst — pass both edge orientations for an undirected graph,
    * the same convention as [[pageRank]]. All arithmetic is integer counts
    * and min-tie-breaks, so like the other fixed-point verbs here the
    * result is bit-identical under any partitioning or engine — a fixed
    * `iters` replays as a chained-CTE SQL oracle. (Synchronous LPA on a
    * bipartite-ish region can oscillate between two labelings rather than
    * converge; a fixed iteration count keeps that deterministic too.
    * Communities of near-dup clusters / crawl graphs are shallow, so small
    * `iters` suffices in practice.)
    *
    * Scale shape per iteration: ONE shuffle join of the label vector with
    * the cached weighted edge list, one (dst, label) weight-sum aggregate,
    * then the argmax as `min(struct(-weight, label))` per dst — a plain
    * two-phase aggregate (map-side partial combine, no sort): lexicographic
    * struct ordering picks the highest weight first and the smallest label
    * on ties, exactly the window rank-filter's semantics at a fraction of
    * its cost (a per-dst sort + row_number was the dominant term at scale;
    * PlanSpec pins the no-window shape).
    *
    * The keep-own-label fallback is folded INTO the vote aggregate as
    * weight-0 self-loops on every node (added once, cached with the
    * edges): a node always hears its own label at weight 0, so any real
    * in-vote (weight ≥ 1) outranks it while an isolated node keeps its
    * label — semantics identical to an explicit keep-label left join, but
    * each step now references the previous `labels` exactly ONCE. The
    * iteration is a linear chain like [[pageRank]]'s (an earlier
    * two-reference formulation doubled the unevaluated plan per iteration —
    * ~2^iters recompute — and needed a checkpoint EVERY iteration to stay
    * bounded), so the same periodic `checkpointInterval` lineage truncation
    * suffices; values are bit-identical for any interval (truncation is
    * plan-only; GraphSpec pins invariance and the bounded plan).
    */
  /** Exact triangle counting by degree orientation (the MapReduce-classic
    * formulation of Suri & Vassilvitskii, "Counting triangles and the curse
    * of the last reducer", WWW 2011): undirected edges are oriented from
    * the lower-(degree, id) endpoint to the higher, so every triangle is
    * counted exactly once as a wedge at its smallest-degree vertex closed
    * by an oriented edge. Input edges may be directed/duplicated — they are
    * canonicalized (a<b, distinct) first; self-loops are ignored.
    *
    * Scale shape: one degree aggregate, one self-join of the ORIENTED edge
    * list on the wedge pivot, one semi-join against the oriented edges to
    * close wedges. Orientation is what makes this scale: a hub of degree d
    * contributes wedges only for its ≤√(2m)-ish LOWER-ordered neighbors,
    * so the join never explodes on the hot vertex (the "last reducer") the
    * naive neighbor self-join dies on.
    *
    * Returns one row: (n_triangles). Exact integers — hash-oracleable.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val canon = graft.ml.Dedup.trackCache(und)
    val deg = canon.select(col("a").as("node"))
      .unionByName(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): u -> v iff (deg(u), u) < (deg(v), v); keep v's
    // order key — wedge endpoints must be compared in the SAME total order
    // (comparing raw ids would miss triangles whose closing edge points
    // against id order)
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = graft.ml.Dedup.trackCache(canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("v"),
        when(fwd, col("db")).otherwise(col("da")).as("dv")))
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") &&
          (col("x.dv") < col("y.dv") ||
           (col("x.dv") === col("y.dv") && col("x.v") < col("y.v"))))
      .select(col("x.v").as("u"), col("y.v").as("v"))
    wedges.join(oriented.select("u", "v"), Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** k-core decomposition by iterative peeling: repeatedly delete every
    * node of degree < k (over the canonical undirected simple graph) until
    * none remains; the survivors are the k-core — the standard density
    * filter for crawl/link graphs (spam rings and boilerplate clusters
    * live in high cores; tendrils and one-off pages peel away).
    * Returns (node, deg) with each survivor's degree INSIDE the core
    * (≥ k by construction). Input may be directed/duplicated; self-loops
    * are ignored.
    *
    * Scale shape per round: one degree aggregate and two anti-joins of the
    * edge list against the (usually tiny after round 1) deleted-node set —
    * AQE broadcasts the anti side once it shrinks. The edge list is
    * re-checkpointed every round (the [[pageRank]] lineage pattern), and
    * the only driver scalar is the deleted-count convergence probe, same
    * as connectedComponents'. Rounds are data-bounded: each round removes
    * ≥ 1 node or stops, and real graphs converge in a handful (the peel
    * ORDER never matters — the k-core is unique, so the result is
    * partition- and engine-invariant and a fixed-round SQL unroll replays
    * it exactly once rounds ≥ convergence).
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1)
    val sc = edges.sparkSession.sparkContext
    val pre0 = sc.getPersistentRDDs.keySet.toSet
    var e = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    var stale = sc.getPersistentRDDs.keySet.toSet -- pre0
    var rounds = 0
    var done = false
    while (!done) {
      val deg = e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val bad = deg.where(col("deg") < k).select("node")
      if (bad.isEmpty) done = true
      else {
        require(rounds < maxRounds, s"k-core did not converge in $maxRounds rounds")
        val pre = sc.getPersistentRDDs.keySet.toSet
        e = e.join(bad.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
          .join(bad.withColumnRenamed("node", "b"), Seq("b"), "left_anti")
          .localCheckpoint()
        stale.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
        stale = sc.getPersistentRDDs.keySet.toSet -- pre
        rounds += 1
      }
    }
    registerFinalRelease(e, stale)
    e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  def labelPropagation(edges: DataFrame, iters: Int = 5,
                       checkpointInterval: Int = 10): DataFrame = {
    require(iters >= 0 && checkpointInterval > 0)
    val e = graft.ml.Dedup.trackCache(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct())
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val ew = graft.ml.Dedup.trackCache(
      e.withColumn("__w", lit(1L)).unionByName(
        nodes.select(col("node").as("src"), col("node").as("dst"),
          lit(0L).as("__w"))))
    var labels = nodes.withColumn("label", col("node"))
    var stale = Set.empty[Int]
    for (i <- 1 to iters) {
      val votes = labels.join(ew, col("node") === col("src"))
        .groupBy(col("dst"), col("label"))
        .agg(sum(col("__w")).as("__c"))
      // argmax(weight, tie -> min label) as a lexicographic struct minimum:
      // -weight is overflow-safe (weights are nonnegative) and a plain agg
      // keeps both phases partial — no per-dst sort, no window
      labels = votes.groupBy(col("dst"))
        .agg(min(struct((-col("__c")).as("nc"), col("label").as("lb"))).as("__m"))
        .select(col("dst").as("node"), col("__m.lb").as("label"))
      if (i % checkpointInterval == 0 && i < iters) {
        val (cp, ids) = checkpointReplacing(labels, stale)
        labels = cp; stale = ids
      }
    }
    registerFinalRelease(labels, stale)
    labels
  }
}
