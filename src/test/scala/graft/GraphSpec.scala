package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Graph

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pageRank: hand-checked two-node cycle and star, exact recurrence") {
    import spark.implicits._
    // 1 <-> 2 cycle: perfectly symmetric, masses stay equal every iteration
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val m = Graph.pageRank(cyc, iters = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    // teleport floor: telep = 1000000*1500 div (10000*2) = 75000
    // pr0 = 500000; each iter: 75000 + 8500*500000 div 10000 = 500000
    assert(m(1L) == 500000L)

    // star: 2,3,4 all point at 1 (and 1 at 2): 1 accumulates
    val star = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L)).toDF("src", "dst")
    val s1 = Graph.pageRank(star, iters = 5, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1(1L) > s1(2L) && s1(2L) > s1(3L), s1)
    assert(s1(3L) == s1(4L)) // symmetric leaves
    // exact recurrence replay in Scala
    var pr = Map(1L -> 250000L, 2L -> 250000L, 3L -> 250000L, 4L -> 250000L)
    val telep = 1000000L * 1500L / (10000L * 4L)
    for (_ <- 1 to 5) {
      val in = Map(
        1L -> (pr(2L) / 1 + pr(3L) / 1 + pr(4L) / 1),
        2L -> pr(1L) / 1).withDefaultValue(0L)
      pr = pr.keys.map(k => k -> (telep + 8500L * in(k) / 10000L)).toMap
    }
    assert(s1 == pr, s"spark $s1 vs replay $pr")
  }

  test("personalized pageRank: teleport and init restricted to seeds, exact replay") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst") // cycle
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val m = Graph.pageRank(edges, iters = 3, scale = 1000000L,
        seeds = Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay: telep = 1e6*1500 div (10000*1) = 150000 only at node 1
    var pr = Map(1L -> 1000000L, 2L -> 0L, 3L -> 0L)
    for (_ <- 1 to 3) {
      val in = Map(2L -> pr(1L), 3L -> pr(2L), 1L -> pr(3L))
      pr = pr.keys.map(k => k ->
        ((if (k == 1L) 150000L else 0L) + 8500L * in(k) / 10000L)).toMap
    }
    assert(m == pr, s"spark $m vs replay $pr")
    assert(m(1L) > m(2L) && m(2L) > m(3L), "mass decays with walk distance")
  }

  test("pageRank is partition-invariant (exact integer arithmetic)") {
    import spark.implicits._
    val edges = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"), (-col("l_suppkey")).as("dst"))
    val sym = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val a = Graph.pageRank(sym, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(sym.repartition(13), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(_ > 0))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("pageRank deep iteration: checkpointing bounds the plan, values unchanged") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    // checkpoint every 5 vs effectively never: bit-identical masses — the
    // truncation is plan-only
    val chunked = Graph.pageRank(edges, iters = 12, scale = 1000000L,
        checkpointInterval = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val straight = Graph.pageRank(edges, iters = 12, scale = 1000000L,
        checkpointInterval = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunked == straight)
    // iters=40 with the default interval completes with a BOUNDED analyzed
    // plan: the final plan's string must not grow with total iterations
    // (pre-checkpoint it nests one join+agg round per iteration)
    val deep = Graph.pageRank(edges, iters = 40, scale = 1000000L)
    val planLines = deep.queryExecution.analyzed.toString.linesIterator.size
    assert(planLines < 400, s"analyzed plan has $planLines lines — lineage not truncated")
    assert(deep.count() == 4)
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("labelPropagation: two triangles joined by a bridge form two communities") {
    import spark.implicits._
    // triangles {1,2,3} and {10,11,12} plus bridge 3-10; undirected
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (3L, 10L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val labels = Graph.labelPropagation(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every triangle collapses to its min label
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L, labels)
    assert(Set(10L, 11L, 12L).map(labels).size == 1, labels)
    // the second triangle's community is NOT the first's: the single bridge
    // vote can't outvote two triangle votes
    assert(labels(10L) != 1L, labels)
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("labelPropagation: argmax tie breaks on smallest label; no-inbound keeps label") {
    import spark.implicits._
    // node 3 hears one vote each from 1 and 2 (tie -> label 1);
    // node 5 has no in-edges and keeps its own label
    val edges = Seq((1L, 3L), (2L, 3L), (5L, 1L)).toDF("src", "dst")
    val labels = Graph.labelPropagation(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(3L) == 1L, labels)
    assert(labels(5L) == 5L, labels)
    assert(labels(1L) == 5L, labels) // 1's only in-neighbor is 5
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("labelPropagation is partition-invariant and checkpoint-invariant") {
    import spark.implicits._
    val edges = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"), (-(col("l_suppkey") + 1)).as("dst"))
    val sym = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val a = Graph.labelPropagation(sym, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // interval=100 never fires inside 3 iterations: the fully chunk-free
    // chain must be bit-identical to the default per-iteration truncation
    val b = Graph.labelPropagation(sym.repartition(13), iters = 3,
        checkpointInterval = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("triangleCount: hand-checked graphs and brute-force differential") {
    import spark.implicits._
    // two triangles joined by a bridge: exactly 2; direction/duplicate
    // edges and self-loops must not change the count
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (3L, 10L), (3L, 3L), (2L, 1L))
    val edges = und.toDF("src", "dst")
    assert(Graph.triangleCount(edges).collect()(0).getLong(0) == 2L)
    // K4: C(4,3) = 4 triangles
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
      .toDF("src", "dst")
    assert(Graph.triangleCount(k4).collect()(0).getLong(0) == 4L)
    // differential vs a brute-force canonical triple join on a hash graph
    val rnd = (1L to 600L)
      .map(i => (i * 2654435761L % 97, i * 40503L % 97)).toDF("src", "dst")
    val canon = rnd.selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
      .where(col("a") =!= col("b")).distinct().cache()
    val brute = canon.as("e1").join(canon.as("e2"), col("e1.b") === col("e2.a"))
      .join(canon.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .count()
    assert(Graph.triangleCount(rnd).collect()(0).getLong(0) == brute,
      s"oriented count vs brute $brute")
    canon.unpersist()
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("kCore: hand-checked cores, peel cascade, degeneracies") {
    import spark.implicits._
    // K4 clique with a pendant chain 4-5-6: the 3-core is exactly the
    // clique (the chain peels in cascade: 6 first, then 5); 1-core is
    // every non-isolated node; k above max degree is empty
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val core3 = Graph.kCore(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(Graph.kCore(edges, 1).count() === 6L)
    assert(Graph.kCore(edges, 5).count() === 0L)
    // direction / duplicates / self-loops are canonicalized away
    val messy = edges.unionAll(edges.select(col("dst").as("src"),
      col("src").as("dst"))).unionAll(Seq((2L, 2L)).toDF("src", "dst"))
    assert(Graph.kCore(messy, 3).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L, 4L))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("kCore: partition-invariant; survivors all have deg >= k in the core") {
    import spark.implicits._
    val rnd = (1L to 800L)
      .map(i => (i * 2654435761L % 131, i * 40503L % 131)).toDF("src", "dst")
    val a = Graph.kCore(rnd, 6)
    val b = Graph.kCore(rnd.repartition(17), 6)
    TestSpark.assertSameRows(a, b)
    assert(a.filter(col("deg") < 6).count() === 0L)
    // the k-core is the MAXIMAL subgraph with min degree >= k: adding back
    // any peeled node leaves it below k against the survivors
    val survivors = a.select(col("node")).as[Long].collect().toSet
    val canon = rnd.selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
      .where(col("a") =!= col("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val all = canon.flatMap(e => Seq(e._1, e._2)).toSet
    for (n <- all -- survivors) {
      val degIntoCore = canon.count(e =>
        (e._1 == n && survivors(e._2)) || (e._2 == n && survivors(e._1)))
      assert(degIntoCore < 6, s"peeled node $n has $degIntoCore core edges")
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("kCore: seeded sweep — min-degree and maximality characterize the core") {
    import spark.implicits._
    // the k-core is the unique maximal subgraph of min degree >= k: for
    // every (graph, k) the survivors must satisfy both halves of that
    // characterization — a full functional spec, swept over seeds
    for (seed <- 1 to 3; k <- Seq(3, 6)) {
      val rnd = (1L to 500L)
        .map(i => (i * (2654435761L + seed) % 89, i * (40503L + seed) % 89))
        .toDF("src", "dst")
      val core = Graph.kCore(rnd, k)
      assert(core.filter(col("deg") < k).count() === 0L, s"seed=$seed k=$k")
      val survivors = core.select("node").as[Long].collect().toSet
      val canon = rnd.selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
        .where(col("a") =!= col("b")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val all = canon.flatMap(e => Seq(e._1, e._2)).toSet
      for (n <- all -- survivors) {
        val degIntoCore = canon.count(e =>
          (e._1 == n && survivors(e._2)) || (e._2 == n && survivors(e._1)))
        assert(degIntoCore < k,
          s"seed=$seed k=$k: peeled node $n has $degIntoCore core edges")
      }
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("labelPropagation deep iteration: linear chain, checkpointing bounds the plan") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    // the weight-0 self-loop formulation references the previous vector
    // ONCE per iteration (a linear chain): the analyzed plan must grow
    // LINEARLY with uncheckpointed iterations, never double (the old
    // two-reference formulation was ~2^iters)
    def planLines(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.toString.linesIterator.size
    val p3 = planLines(Graph.labelPropagation(edges, iters = 3,
      checkpointInterval = 100))
    val p6 = planLines(Graph.labelPropagation(edges, iters = 6,
      checkpointInterval = 100))
    val p9 = planLines(Graph.labelPropagation(edges, iters = 9,
      checkpointInterval = 100))
    assert(p9 - p6 == p6 - p3,
      s"plan growth must be linear in iters: $p3 -> $p6 -> $p9")
    // chunked vs effectively-never checkpointing: bit-identical labels
    val chunked = Graph.labelPropagation(edges, iters = 9,
        checkpointInterval = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val straight = Graph.labelPropagation(edges, iters = 9,
        checkpointInterval = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunked == straight)
    // iters=40 with the default interval completes with a BOUNDED plan
    val deep = Graph.labelPropagation(edges, iters = 40)
    assert(planLines(deep) < 400,
      s"analyzed plan has ${planLines(deep)} lines — lineage not truncated")
    assert(deep.count() == 4)
    graft.ml.Dedup.unpersistIntermediates()
  }
}
