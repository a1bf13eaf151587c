package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the scale properties claimed in README
  * (pushdown, pruning, broadcast, partial aggregation, window top-k) are
  * asserted against the physical plan so a refactor can't silently lose
  * them. String-matching executed plans is crude but catches the regressions
  * that matter.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("filter pushes predicates into the parquet scan and prunes columns") {
    val p = plan("q_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(800))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_discount:double,l_shipdate"))
    assert(!p.contains("l_comment") && !p.contains("l_extendedprice"))
  }

  test("q1 aggregation is map-side partial then final") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), "expected partial aggregation")
    assert(p.split("HashAggregate").length >= 3, "expected two HashAggregate levels")
  }

  test("star join broadcasts every dimension (no shuffle joins)") {
    val p = plan("q_join_multi")
    assert(p.split("BroadcastHashJoin").length >= 4, "expected 3 broadcast joins")
    assert(!p.contains("SortMergeJoin"), "dims must not sort-merge")
  }

  test("top_n plans a partial WindowGroupLimit before the shuffle") {
    val p = plan("q_top_n")
    assert(p.contains("WindowGroupLimit"), p.take(600))
  }

  test("k-means assign: broadcast centroids, rank-filter argmin map-side limited") {
    // a Spark upgrade that stops planning the partial WindowGroupLimit
    // would silently shuffle k scored rows per vector instead of 1 — the
    // Clustering scaladoc's cost claims rest on this shape
    val p = plan("q_kmeans")
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(p.contains("BroadcastExchange"), "centroids must broadcast: " + p.take(800))
    assert(!p.contains("SortMergeJoin"), "assign must not shuffle-join the data")
  }

  test("label propagation: per-iteration argmax is a partial aggregate, not a window") {
    // argmax(count, tie -> min label) runs as min(struct(-c, label)) — a
    // two-phase aggregate with map-side combine; a window formulation would
    // sort every (dst, label) vote per dst
    val p = plan("q_label_prop")
    assert(!p.contains("Window"), p.take(800))
    assert(p.contains("partial_min") || p.contains("partial min") ||
      "(?i)partial".r.findFirstIn(p).isDefined, p.take(800))
  }

  test("round-9 queries: no cartesians; candidate joins stay equi-joins") {
    // semantic dedup: the only nested-loop is the BROADCAST centroid
    // cross-join of the kmeans assign; within-cluster pairs are an
    // equi-join on cluster
    val sd = plan("q_semantic_dedup")
    assert(!sd.contains("CartesianProduct"), sd.take(600))
    // triangle counting: wedge + closure joins are hash equi-joins, never
    // a nested loop over edges
    val tri = plan("q_triangles")
    assert(!tri.contains("CartesianProduct") &&
      !tri.contains("BroadcastNestedLoopJoin"), tri.take(600))
    // leak-safe split: CC labels join back by equi-key
    val ls = plan("q_leak_split")
    assert(!ls.contains("CartesianProduct"), ls.take(600))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("round-9b queries: PQ broadcasts, zone maps range-partition, prefix join equi-joins") {
    // PQ ADC probe: codebooks/LUT broadcast; code->LUT join is hash, the
    // only nested loop is the broadcast centroid scoring
    val pq = plan("q_pq_topk")
    assert(pq.contains("BroadcastExchange"), pq.take(600))
    assert(!pq.contains("CartesianProduct"), pq.take(600))
    // zone maps: the layout rank is the two-phase range prefix sum (range
    // exchange present; no whole-data sort into one task — the only
    // SinglePartition exchanges feed scalar aggregates / tiny offset
    // tables, never a Window or data-wide Sort)
    val zm = plan("q_zone_maps")
    assert(zm.contains("rangepartitioning"), zm.take(800))
    assert(!hasGlobalWindow(zm), zm.take(1200))
    // IVF-routed ADC: same PQ broadcast shape, plus the routed candidate
    // join stays an equi-join on centroid_id (the nested loop is only the
    // broadcast centroid scoring) — never a cartesian
    val pqi = plan("q_pq_ivf")
    assert(pqi.contains("BroadcastExchange"), pqi.take(600))
    assert(!pqi.contains("CartesianProduct"), pqi.take(600))
    // prefix-filtered jaccard: candidates and verification are equi-joins
    val jp = plan("q_jaccard_prefix")
    assert(!jp.contains("CartesianProduct") &&
      !jp.contains("BroadcastNestedLoopJoin"), jp.take(600))
    // skew report: its per-key rank is the two-phase prefix sum too
    val sk = plan("q_skew_report")
    assert(sk.contains("rangepartitioning"), sk.take(800))
    assert(!hasGlobalWindow(sk), sk.take(1200))
    graft.ml.Dedup.unpersistIntermediates()
  }

  /** A Window with an empty partition spec — the whole-data-in-one-task
    * shape the two-phase prefix sums exist to avoid. */
  private def hasGlobalWindow(p: String): Boolean =
    "Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(p).isDefined

  test("quantile sketch: no cartesian; estimate windows stay per-group") {
    val p = plan("q_qsketch")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!hasGlobalWindow(p), p.take(1200))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("knnJoin generates candidates by equi-join — no cartesian, no nested loop") {
    val p = plan("q_knn_join")
    assert(!p.contains("CartesianProduct"), "knnJoin must never plan a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "knnJoin must never nested-loop")
  }

  test("bloom decontamination probes the sketch in a filter before any join") {
    val p = plan("q_decontaminate")
    assert(p.contains("might_contain"),
      "expected the bloom probe in the physical plan: " + p.take(600))
  }

  test("heavy_hitters aggregates map-side partial then final (sketch, not key shuffle)") {
    val p = plan("q_heavy_hitters")
    // TypedImperativeAggregate plans as ObjectHashAggregate; two levels =
    // per-partition summaries combine before any data moves, so the
    // exchange carries <= k counters per partition, never per-key rows
    assert(p.split("ObjectHashAggregate").length >= 3,
      "expected partial+final ObjectHashAggregate: " + p.take(800))
    assert(p.contains("partial_heavy_hitters"), p.take(800))
  }

  test("semi and anti joins stay semi/anti (no row expansion)") {
    assert(plan("q_semi_join").contains("LeftSemi"))
    assert(plan("q_anti_join").contains("LeftAnti"))
  }

  test("mutate chain collapses to a single projection") {
    val p = plan("q_mutate")
    // sequential withColumns fold into one Project over the scan
    assert(p.split("\\bProject\\b").length <= 3, p.take(800))
  }

  test("banded embedding LSH caches only (id, band, bkey) and joins without cartesian") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val p = graft.ml.Dedup
      .embeddingNearDupPairsBanded(emb, "vec_id", "embedding", dim = 64)
      .queryExecution.executedPlan.toString
    // the cached candidate table must not pin the embeddings (x bands
    // copies). Only inspect the banded cache itself (band#/bkey# columns):
    // a shared test session may legitimately serve the source scan from
    // another suite's cached fixture.
    val memLines = p.linesIterator
      .filter(l => l.contains("InMemoryTableScan") && l.contains("band#")).toSeq
    assert(memLines.nonEmpty, p.take(600))
    assert(memLines.forall(l => !l.contains("vec#") && !l.contains("embedding#")),
      memLines.mkString("\n"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(800))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("contamination plan: no cartesian, no gram strings on the hashed path") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ml.Dedup.contaminationReport(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 17 === 0), "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(800))
    // hashed path: the join key is the 64-bit shingle_hash — no per-gram
    // string expression anywhere in the plan
    assert(p.contains("shingle_hash"), p.take(600))
    assert(!p.contains("concat_ws"), "gram strings must not materialize")
  }

  test("pack/interleave plans: data-side windows stay range-partitioned") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val p = graft.ops.Scale.packByBudget(docs, Seq(col("doc_id")),
        col("n_chars"), budget = 10000)
      .queryExecution.executedPlan.toString
    // the running sum stays within range partitions — the dedicated
    // one-exchange operator (a global SinglePartition window over the
    // data would be the 100 TB killer)
    assert(p.contains("GlobalRunningSum"), p.take(800))
    assert(!p.contains("windowspecdefinition"), p.take(800))
    assert(p.contains("rangepartitioning") || p.contains("ExistingRDD"),
      p.take(800))
  }

  test("curation e2e plan: no cartesian, packing stays range-partitioned") {
    val p = plan("q_curation_e2e")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(800))
    assert(p.contains("GlobalRunningSum") ||
      p.contains("windowspecdefinition(__pid"),
      "packing must stay within range partitions")
    assert(p.contains("rangepartitioning") || p.contains("ExistingRDD"),
      "packing must read the range-pinned table")
  }

  test("packSequences plan: per-__pid window only, no global window") {
    val p = plan("q_pack_sequences")
    assert(p.contains("GlobalRunningSum") ||
      p.contains("windowspecdefinition(__pid"), p.take(800))
    assert(p.contains("rangepartitioning") || p.contains("ExistingRDD"),
      p.take(800))
    // a SinglePartition window over the corpus would be the 100 TB killer
    assert(!p.contains("Window [sum") ||
           p.contains("windowspecdefinition(__pid"), p.take(800))
  }

  test("resample plan: no cartesian; spine joins hash- or broadcast-side") {
    val p = plan("q_resample")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(800))
  }

  test("url ops and repetition stats stay map-only over the scan") {
    // no Exchange at all: the whole query is scan -> project
    Seq("q_url_ops", "q_repetition").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q should be map-only\n" + p.take(800))
    }
  }

  test("quality e2e plan: no cartesian, offender set broadcast, packing range-partitioned") {
    val p = plan("q_quality_e2e")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(800))
    // the frequent-line anti-join must be broadcast (map-side), never shuffled
    assert(p.contains("BroadcastHashJoin") &&
      p.linesIterator.exists(l => l.contains("LeftAnti") && l.contains("Broadcast")),
      p.take(1200))
    assert(p.contains("GlobalRunningSum") ||
      p.contains("windowspecdefinition(__pid"),
      "packing must stay within range partitions")
  }

  test("ewm plans a per-group window with the function's running row frame") {
    val p = plan("q_ewm")
    // partitioned by the group key, running ROWS frame adopted from the
    // function itself (ResolveWindowFrame), never a SinglePartition window
    assert(p.contains("ewm_mean"), p.take(600))
    assert(p.contains("windowspecdefinition(o_custkey"), p.take(800))
    assert(p.contains("specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())"),
      p.take(800))
    assert(!p.contains("SinglePartition"), "running state must stay per-group")
  }

  test("custom expressions (shingle_hash, dot_product) stay in whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the "*(n)" operator prefix marks membership in a WholeStageCodegen stage
    def inCodegen(p: String, expr: String): Boolean =
      p.linesIterator.exists(l => l.contains(expr) && l.trim.stripPrefix("+- ").startsWith("*("))
    val sp = docs.select(graft.text.TextFns.shingleHashes(col("text"), 3))
      .queryExecution.executedPlan.toString
    assert(inCodegen(sp, "shingle_hash"), sp.take(600))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val dp = emb.select(graft.ml.Similarity.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(inCodegen(dp, "dot_product"), dp.take(600))
  }

  test("retrieval plans: no cartesian; pmi tops via TakeOrdered, not a global window") {
    for (q <- Seq("q_bm25", "q_tfidf", "q_hybrid_rrf", "q_substr_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
    }
    val pp = plan("q_pmi")
    assert(pp.contains("TakeOrderedAndProject"), pp.take(600))
    assert(!pp.contains("CartesianProduct"))
  }

  test("cdc chunking is map-only; winnow needs exactly the per-doc aggregate") {
    val pc = plan("q_cdc_chunks")
    assert(!pc.contains("Exchange"), "CDC must be scan -> project -> generate\n" + pc.take(800))
    val pw = plan("q_winnow")
    assert(!pw.contains("CartesianProduct") && !pw.contains("SortMergeJoin"),
      pw.take(800))
  }

  test("fuzzy join: probes broadcast into a hash join; distance never degenerates the join") {
    val p = plan("q_fuzzy_join")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the block-key equality must drive a hash join")
    assert(p.contains("levenshtein"), "bounded levenshtein should be post-join filter")
  }
}
