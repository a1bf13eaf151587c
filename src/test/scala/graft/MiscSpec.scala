package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fns, Vec}
import graft.ml.Similarity
import graft.cats.Forcats
import graft.reshape.Reshape

/** Corner-coverage for APIs not exercised by the driver queries. */
class MiscSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ivfTopK recalls most brute-force neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>")).cache()
    val queries = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 3)
      .select("query_id", "item_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 3, nCentroids = 8, nProbe = 4)
      .select("query_id", "item_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.intersect(bf).size >= bf.size / 3,
      s"${ivf.intersect(bf).size} of ${bf.size}")
  }

  test("persisted IVF index answers equal inline ivfTopK; probes prune partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>")).cache()
    val queries = emb.filter(col("vec_id") < 10)
    Similarity.buildIvfIndex(emb, dir, nCentroids = 8)
    val fromIdx = Similarity.ivfTopKFromIndex(spark, dir, queries,
      k = 3, nProbe = 4)
    val inline = Similarity.ivfTopK(emb, queries, k = 3, nCentroids = 8,
      nProbe = 4)
    TestSpark.assertSameRows(fromIdx, inline, "index vs inline IVF")
    // the assignment scan must carry a dynamic-partition-pruning filter on
    // centroid_id — only probed directories are read at serving time
    val plan = fromIdx.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP filter on the assignment scan:\n${plan.take(1500)}")
    // layout sanity: one directory per non-empty centroid partition
    val dirs = new java.io.File(s"$dir/assignments").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName).toSeq
    assert(dirs.nonEmpty && dirs.size <= 8, dirs.toString)
  }

  test("persisted IVF-PQ index equals inline adcTopKRouted; probes prune partitions") {
    import graft.ml.Pq
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>")).cache()
    val queries = emb.filter(col("vec_id") < 10)
    Pq.buildIvfPqIndex(emb, dir, "vec_id", "embedding",
      m = 4, k = 8, iters = 1, nCentroids = 8)
    val fromIdx = Pq.adcTopKFromIndex(spark, dir, queries, k = 3, nProbe = 4)
    val cb = graft.ml.Dedup.trackCache(
      Pq.train(emb, "vec_id", "embedding", 4, k = 8, iters = 1))
    val codes = Pq.encode(emb, cb, "vec_id", "embedding", 4)
    val inline = Pq.adcTopKRouted(emb, codes, cb, queries, "vec_id",
      "embedding", 4, 3, nCentroids = 8, nProbe = 4)
    TestSpark.assertSameRows(fromIdx, inline, "index vs inline IVF-PQ")
    // the codes scan must carry a dynamic-partition-pruning filter on
    // centroid_id — a probe batch reads only its routed directories, and
    // what it reads is m codes per vector, not d floats
    val plan = fromIdx.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP filter on the codes scan:\n${plan.take(1500)}")
    val dirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName).toSeq
    assert(dirs.nonEmpty && dirs.size <= 8, dirs.toString)
    graft.ml.Dedup.unpersistIntermediates()
    emb.unpersist()
  }

  test("appendToIvfPqIndex: probe(appended index) == probe(one-shot rebuild) " +
       "under frozen quantizers; appends are O(batch) and land in the layout") {
    import graft.ml.Pq
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>")).cache()
    // identity id hashes pin the quantizer SAMPLE into the base corpus (the
    // nCentroids/k smallest ids are all < 80) and iters = 0 makes the
    // codebooks a pure function of the seed vectors — so the one-shot
    // rebuild over base ∪ batch trains bit-identical quantizers to the
    // base build, and append-vs-rebuild equality is exact, not approximate
    val idh = Some(col("vec_id"))
    val base = emb.filter(col("vec_id") < 80)
    val batch = emb.filter(col("vec_id") >= 80 && col("vec_id") < 120)
    val queries = emb.filter(col("vec_id") < 10)
    val dirA = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-ivfpq-reb").toString
    Pq.buildIvfPqIndex(base, dirA, "vec_id", "embedding",
      m = 4, k = 8, iters = 0, nCentroids = 8,
      initHash = idh, centroidHash = idh)
    Pq.appendToIvfPqIndex(spark, dirA, batch, "vec_id", "embedding")
    Pq.buildIvfPqIndex(base.unionByName(batch), dirB, "vec_id", "embedding",
      m = 4, k = 8, iters = 0, nCentroids = 8,
      initHash = idh, centroidHash = idh)
    // frozen quantizers: centroid and codebook legs identical
    TestSpark.assertSameRows(
      spark.read.parquet(s"$dirA/centroids"),
      spark.read.parquet(s"$dirB/centroids"), "centroids")
    TestSpark.assertSameRows(
      spark.read.parquet(s"$dirA/codebooks"),
      spark.read.parquet(s"$dirB/codebooks"), "codebooks")
    // the codes leg holds the same rows and the probe answers are identical
    TestSpark.assertSameRows(
      spark.read.parquet(s"$dirA/codes"),
      spark.read.parquet(s"$dirB/codes"), "codes")
    val pa = Pq.adcTopKFromIndex(spark, dirA, queries, k = 3, nProbe = 4)
    val pb = Pq.adcTopKFromIndex(spark, dirB, queries, k = 3, nProbe = 4)
    TestSpark.assertSameRows(pa, pb, "probe(append) vs probe(rebuild)")
    // batch rows landed INSIDE the existing centroid_id= directory layout
    // (no new top-level dirs beyond the partition scheme), and the append
    // probe still prunes partitions dynamically
    val dirs = new java.io.File(s"$dirA/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("centroid_id=")), dirs)
    val plan = pa.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP filter on the appended codes scan:\n${plan.take(1500)}")
    emb.unpersist()
  }

  test("IVF-PQ drift monitor: OOD append trips rebuildAdvised, " +
       "in-distribution append does not") {
    import graft.ml.Pq
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>")).cache()
    val idh = Some(col("vec_id"))
    val base = emb.filter(col("vec_id") < 80)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-drift").toString
    Pq.buildIvfPqIndex(base, dir, "vec_id", "embedding",
      m = 4, k = 8, iters = 0, nCentroids = 8,
      initHash = idh, centroidHash = idh)
    // build writes the batch_seq-0 baseline from the training corpus itself
    val s0 = spark.read.parquet(s"$dir/stats").collect()
    assert(s0.length == 1 && s0(0).getAs[Long]("batch_seq") == 0L &&
      s0(0).getAs[Long]("n_rows") == 80L, s0.mkString(","))
    // in-distribution append: same generator, new ids -> residuals in the
    // baseline's band, no rebuild advice
    val inDist = emb.filter(col("vec_id") >= 80 && col("vec_id") < 120)
    Pq.appendToIvfPqIndex(spark, dir, inDist, "vec_id", "embedding")
    assert(!Pq.rebuildAdvised(spark, dir, threshold = 2.0),
      "in-distribution batch must not advise a rebuild: " +
        Pq.driftStats(spark, dir).collect().mkString(", "))
    // out-of-distribution append: scaled + shifted vectors the frozen
    // codebooks fit badly -> residual blows past threshold x baseline
    val ood = emb.filter(col("vec_id") >= 120 && col("vec_id") < 160)
      .withColumn("vec_id", col("vec_id") + 1000000)
      .withColumn("embedding",
        transform(col("embedding"), x => x * 10.0 + 50.0))
    Pq.appendToIvfPqIndex(spark, dir, ood, "vec_id", "embedding")
    assert(Pq.rebuildAdvised(spark, dir, threshold = 2.0),
      "OOD batch must advise a rebuild: " +
        Pq.driftStats(spark, dir).collect().mkString(", "))
    // the ledger is the full history: baseline + one row per append, with
    // NULL ratio on the baseline row only
    val ds = Pq.driftStats(spark, dir).orderBy("batch_seq").collect()
    assert(ds.length == 3 &&
      ds.map(_.getAs[Long]("batch_seq")).toSeq == Seq(0L, 1L, 2L), ds.mkString(","))
    assert(ds(0).isNullAt(ds(0).fieldIndex("drift_ratio")))
    assert(!ds(1).isNullAt(ds(1).fieldIndex("drift_ratio")) &&
      ds(2).getAs[Double]("drift_ratio") > ds(1).getAs[Double]("drift_ratio"))
    graft.ml.Dedup.unpersistIntermediates()
    emb.unpersist()
  }

  test("quantilesBySample: exact when k covers the group, bounded error otherwise") {
    import spark.implicits._
    val d = Tbl((1L to 5000L).map(i => (i, i % 7, (i * 2654435761L % 100000).toDouble))
      .toDF("id", "g", "x")).groupBy("g")
    // k >= group size: the sample is the whole group -> exact percentiles
    val full = d.quantilesBySample(col("x"), Seq(0.5), k = 10000,
        sampleKey = Seq(col("id"))).df
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = d.df.groupBy("g").agg(percentile(col("x"), lit(0.5)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(full == exact)
    // k = 200: the estimate's true rank must sit near 0.5 (±4 sigma)
    val est = d.quantilesBySample(col("x"), Seq(0.5), k = 200,
        sampleKey = Seq(col("id"))).df
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    est.foreach { case (g, m) =>
      val grp = (1L to 5000L).filter(_ % 7 == g).map(i => (i * 2654435761L % 100000).toDouble)
      val below = grp.count(_ <= m).toDouble / grp.size
      assert(below > 0.36 && below < 0.64, s"group $g: est rank $below")
    }
    // deterministic under repartitioning (merge-order-independent sample)
    val re = Tbl(d.df.repartition(13)).groupBy("g")
      .quantilesBySample(col("x"), Seq(0.5), k = 200, sampleKey = Seq(col("id"))).df
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(re == est)
  }

  test("kmeans recovers planted clusters exactly; partition-invariant") {
    import spark.implicits._
    // 3 planted centers 1000 apart in 4-d, integer jitter ±10 — sums stay
    // exact in double, so the run is bit-deterministic
    val pts = (0 until 120).map { i =>
      val c = i % 3
      val base = Seq(Seq(1000.0, 0.0, 0.0, 0.0), Seq(0.0, 1000.0, 0.0, 0.0),
                     Seq(0.0, 0.0, 1000.0, 0.0))(c)
      val jit = Seq.tabulate(4)(j => ((i * 7 + j * 13) % 21 - 10).toDouble)
      (i.toLong, c, base.zip(jit).map { case (b, e) => b + e })
    }
    val df = pts.toDF("vec_id", "truth", "embedding")
    // id-order init: ids 0,1,2 seed one centroid inside each planted cluster
    val got = graft.ml.Clustering.kmeans(df, k = 3, iters = 3,
      initHash = Some(col("vec_id")))
    val m = df.join(got, "vec_id").select("truth", "cluster").collect()
      .map(r => (r.getInt(0), r.getLong(1))).groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2).toSet }
    assert(m.values.forall(_.size == 1), s"impure clusters: $m")
    assert(m.values.flatten.toSet.size == 3, s"merged clusters: $m")
    val got2 = graft.ml.Clustering.kmeans(df.repartition(13), k = 3, iters = 3,
      initHash = Some(col("vec_id")))
    TestSpark.assertSameRows(got, got2, "kmeans repartition")
  }

  test("splitByHash: deterministic, group-coherent, fractions roughly honored") {
    import spark.implicits._
    val d = Tbl((1L to 3000L).map(i => (i, s"grp${i % 97}")).toDF("id", "g"))
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def run() = d.splitByHash("g", splits).df
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run()
    assert(a == run(), "same seed must reproduce the same assignment")
    // group coherence: all rows of one group share a split
    val perGroup = d.splitByHash("g", splits).df
      .groupBy("g").agg(countDistinct("split").as("k")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L))
    // fractions: 97 groups hashed — train should dominate
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.6 && frac < 0.95, s"train frac $frac")
    assert(a.values.toSet == Set("train", "val", "test"))
    // a different seed produces a different assignment
    val b = d.splitByHash("g", splits, seed = 7L).df
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != b)
    intercept[IllegalArgumentException] {
      d.splitByHash("g", Seq("x" -> 0.5, "y" -> 0.4))
    }
  }

  test("count auto-renames on clash (n -> nn)") {
    import spark.implicits._
    val d = Tbl(Seq(("a", 1), ("a", 2)).toDF("g", "n"))
    val out = d.groupBy("g", "n").count()
    assert(out.cols.contains("nn"))
  }

  test("addCount name clash and wt") {
    import spark.implicits._
    val d = Tbl(Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("g", "n"))
    val out = d.groupBy("g").addCount(wt = Some(col("n")))
    assert(out.cols.contains("nn"))
    assert(out.df.where(col("g") === "a").head().getDouble(2) == 3.0)
  }

  test("nth with negative index counts from the end") {
    import spark.implicits._
    val d = Tbl(Seq(("a", 1), ("a", 2), ("a", 3)).toDF("g", "x")).groupBy("g")
      .arrange(col("x"))
    val out = d.mutate("m2" -> Vec.nth(col("x"), -2)).df
    assert(out.collect().forall(_.getInt(2) == 2))
    // group smaller than |n| → NULL, and desc orderings mirror correctly
    val small = Tbl(Seq(("a", 1)).toDF("g", "x")).groupBy("g").arrange(col("x"))
    assert(small.mutate("m3" -> Vec.nth(col("x"), -3)).df.head().isNullAt(2))
    val descd = Tbl(Seq(("a", 1), ("a", 2), ("a", 3)).toDF("g", "x")).groupBy("g")
      .arrange(col("x").desc)
    // order 3,2,1 → second-from-end = 2
    assert(descd.mutate("m2" -> Vec.nth(col("x"), -2)).df
      .collect().forall(_.getInt(2) == 2))
  }

  test("RangeJoin: inclusive bounds, bucket straddling, each pair exactly once") {
    import spark.implicits._
    // interval [10, 30] spans buckets 1,2,3 at width 10
    val iv = Seq((1L, 10L, 30L), (2L, 100L, 105L)).toDF("iv_id", "s", "e")
    val pt = Seq(10L, 15L, 25L, 30L, 31L, 103L).toDF("p")
    val out = graft.ops.RangeJoin.pointInInterval(pt, iv, "p", "s", "e", 10L)
      .select("iv_id", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (1L, 15L), (1L, 25L), (1L, 30L), (2L, 103L)))
    // overlap: [0,25]x[20,40] overlap (counted once though they share
    // buckets 2 AND... overlap start 20 → bucket 2 only); [0,5]x[50,60] none
    val a = Seq((1L, 0L, 25L), (2L, 0L, 5L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((10L, 20L, 40L), (20L, 50L, 60L)).toDF("b_id", "b_s", "b_e")
    val ov = graft.ops.RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e", 10L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ov == Seq((1L, 10L))) // exactly once, no duplicates
    // epoch-ns magnitude (> 2^53): bucket ids must come from integer
    // division — a double floor(x/w) mis-buckets boundary-adjacent points
    val w = 60000000000L
    val base = 1700000000000000000L
    val bnd = base - base % w // exact bucket boundary near 1.7e18
    val ivNs = Seq((1L, bnd, bnd + w - 1)).toDF("iv_id", "s", "e")
    val ptNs = Seq(bnd, bnd - 1, bnd + w - 1, bnd + w).toDF("p")
    val hits = graft.ops.RangeJoin.pointInInterval(ptNs, ivNs, "p", "s", "e", w)
      .select("p").collect().map(_.getLong(0)).toSet
    assert(hits == Set(bnd, bnd + w - 1))
  }

  test("RangeJoin guards: inverted/NULL intervals drop, wide intervals raise, name clashes fail fast") {
    import spark.implicits._
    val pt = Seq(5L).toDF("p")
    // inverted interval matches nothing (contains-nothing semantics)
    val inv = Seq((1L, 30L, 10L)).toDF("iv_id", "s", "e")
    assert(graft.ops.RangeJoin.pointInInterval(pt, inv, "p", "s", "e", 10L).count() == 0)
    // NULL bound drops the interval row, no error
    val withNull = Seq((1L, Option(0L), Option.empty[Long])).toDF("iv_id", "s", "e")
    assert(graft.ops.RangeJoin.pointInInterval(pt, withNull, "p", "s", "e", 10L).count() == 0)
    // an open-ended sentinel interval raises instead of exploding memory
    val open = Seq((1L, 0L, Long.MaxValue)).toDF("iv_id", "s", "e")
    intercept[Exception] {
      graft.ops.RangeJoin.pointInInterval(pt, open, "p", "s", "e", 10L).count()
    }
    // shared column names rejected up front
    val clash = Seq((1L, 0L, 10L)).toDF("p", "s", "e")
    intercept[IllegalArgumentException] {
      graft.ops.RangeJoin.pointInInterval(pt, clash, "p", "s", "e", 10L)
    }
  }

  test("Tbl.rangeJoin and Tbl.asofJoin sugar preserve grouping state") {
    import spark.implicits._
    val pt = Tbl(Seq((5L, "a"), (15L, "b")).toDF("p", "g")).groupBy("g")
    val iv = Tbl(Seq((1L, 0L, 10L)).toDF("iv_id", "s", "e"))
    val rj = pt.rangeJoin(iv, "p", "s", "e", 10L)
    assert(rj.groups == Seq("g"))
    assert(rj.df.collect().map(_.getAs[Long]("p")).toSeq == Seq(5L))
  }

  test("wordCount counts adjacent whole-token occurrences and phrases") {
    import spark.implicits._
    val d = Seq(" the the ", "the theater the", "THE the").toDF("t")
    val out = d.select(graft.text.TextFns.wordCount(col("t"), "the"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 2L, 2L)) // adjacent pair counts 2; 'theater' doesn't match
    val ph = Seq("in New York new york style", "newark york").toDF("t")
    val pc = ph.select(graft.text.TextFns.wordCount(col("t"), "new york"))
      .collect().map(_.getLong(0)).toSeq
    assert(pc == Seq(2L, 0L))
  }

  test("pad/zfill/center never truncate values at or over the width (Python semantics)") {
    import spark.implicits._
    val d = Seq("abcdefgh").toDF("s")
    assert(d.select(Fns.Str.pad(col("s"), 5, "both", "_")).head().getString(0) == "abcdefgh")
    assert(d.select(Fns.Str.center(col("s"), 5, "_")).head().getString(0) == "abcdefgh")
    assert(d.select(Fns.Str.zfill(col("s"), 5)).head().getString(0) == "abcdefgh")
    assert(d.select(Fns.Str.pad(col("s"), 10, "left", "_")).head().getString(0) == "__abcdefgh")
  }

  test("ceilDate rounds up except on boundaries") {
    import spark.implicits._
    val d = Seq("2024-03-15 10:30:00", "2024-03-01 00:00:00")
      .toDF("s").withColumn("ts", col("s").cast("timestamp"))
    val out = d.select(Fns.Dt.ceilDate(col("ts"), "month").cast("string"))
      .collect().map(_.getString(0))
    assert(out(0).startsWith("2024-04-01"))
    assert(out(1).startsWith("2024-03-01")) // boundary stays
  }

  test("str pad both centers the value") {
    import spark.implicits._
    val d = Seq("ab").toDF("s")
    val out = d.select(Fns.Str.pad(col("s"), 6, "both", "*")).head().getString(0)
    assert(out == "**ab**", out)
  }

  test("forcats inorder/reorder produce level orders; factor sortKey sorts") {
    import spark.implicits._
    val d = Seq(("b", 2, 30.0), ("a", 1, 10.0), ("c", 3, 20.0)).toDF("f", "ord", "v")
    assert(Forcats.fctInorder(d, col("f"), col("ord")).levels == Seq("a", "b", "c"))
    val byV = Forcats.fctReorder(d, col("f"), col("v"))
    assert(byV.levels == Seq("a", "c", "b"))
    val sorted = d.orderBy(byV.sortKey(col("f"))).collect().map(_.getString(0))
    assert(sorted.toSeq == Seq("a", "c", "b"))
  }

  test("gatherTyped keeps the column type") {
    import spark.implicits._
    val wide = Tbl(Seq((1, "x", "y")).toDF("id", "a", "b"))
    val long = Reshape.gatherTyped(wide, "k", "v", Seq(Sel.Name("a"), Sel.Name("b")))
    assert(long.df.schema("v").dataType.typeName == "string")
    assert(long.df.count() == 2)
  }

  test("grouped transmute keeps group columns") {
    import spark.implicits._
    val d = Tbl(Seq(("a", 1), ("b", 2)).toDF("g", "x")).groupBy("g")
    val out = d.transmute("y" -> (col("x") * 2))
    assert(out.df.columns.toSeq == Seq("g", "y"))
    assert(out.groups == Seq("g"))
  }

  test("windowize leaves explicit over() clauses alone") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Tbl(Seq(("a", 1), ("a", 5), ("b", 2)).toDF("g", "x")).groupBy("g")
    // user supplies an explicit global window: must NOT be rewrapped
    val out = d.mutate("mx" -> max(col("x")).over(Window.partitionBy())).df
    assert(out.select(max("mx")).head().getInt(0) == 5)
    assert(out.where(col("g") === "b").head().getInt(2) == 5) // global, not per-group
  }

  test("random projection preserves planted near-duplicate ranking (JL)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val pert = emb.withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(1.001) + lit(0.0001)))
    val both = emb.unionByName(pert)
    // isotropic-noise top-k is NOT preserved under projection (neighbor
    // gaps are below the JL distortion — measured recall@3 is ~0.1 at
    // outDim=16 on this corpus); near-identical vectors ARE: the planted
    // copy's cosine ~1 dominates by far more than the distortion, so it
    // must stay the top-1 neighbor even at an 8x reduction
    for (outDim <- Seq(8, 16)) {
      val red = Similarity.randomProjection(both, "vec_id", "embedding",
        dim = 64, outDim = outDim, seed = 7L)
      val queries = red.filter(
        col("vec_id") >= 1000000L && col("vec_id") < 1000050L)
      val top = Similarity.bruteForceTopK(red, queries, k = 1,
        idCol = "vec_id", vecCol = "rvec")
      val hits = top
        .filter(col("item_id") === col("query_id") - 1000000L).count()
      assert(hits >= 48L, s"outDim=$outDim planted top-1 hits $hits/50")
    }
    assertThrows[IllegalArgumentException](
      Similarity.randomProjection(emb, "vec_id", "embedding", 64, 0))
    assertThrows[IllegalArgumentException](
      Similarity.randomProjection(emb, "vec_id", "embedding", 64, 65))
  }

  test("keepCanonicalBy keeps the preferred cluster member; ties to min id") {
    import spark.implicits._
    // cluster {1,2,3} (chained pairs), cluster {10,11} tied on pref,
    // singleton 20 untouched
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L),
      (20L, 1L)).toDF("id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = graft.ml.Dedup.keepCanonicalBy(docs, "id", pairs,
        col("quality"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 10L, 20L), kept.toString)
    // contrast: min-id policy keeps 1, not the best-quality 2
    val minId = graft.ml.Dedup.keepCanonical(docs, "id", pairs)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L, 10L, 20L), minId.toString)
  }

  test("dedupReport counts canonical-resolve drops per group") {
    import spark.implicits._
    // cluster {1,2,3} (two dups), cluster {10,11} (one dup), singleton 20
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (10L, "y"), (11L, "y"),
      (20L, "y")).toDF("id", "g")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = graft.ml.Dedup.dedupReport(docs, "id", pairs, Seq("g"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got == Map("x" -> ((3L, 2L, 0.666667)),
      "y" -> ((3L, 1L, 0.333333))), got.toString)
    assertThrows[IllegalArgumentException](
      graft.ml.Dedup.dedupReport(docs, "id", pairs, Seq.empty))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; " +
       "multi-column fingerprint is separator-safe") {
    import spark.implicits._
    val v1 = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"),
      (5L, "ab", "c")).toDF("id", "t", "s")
    val v2 = Seq((1L, "a", "x"), (2L, "B", "y"), (4L, "d", "w"),
      (5L, "a", "bc")).toDF("id", "t", "s")
    val got = graft.ops.Scale.snapshotDiff(v1, v2, "id", Seq("t", "s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 5: ("ab","c") vs ("a","bc") — naive concat would collide; the
    // U+0001 separator must keep them distinct
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "changed"), got.toString)
    assertThrows[IllegalArgumentException](
      graft.ops.Scale.snapshotDiff(v1, v2, "id", Seq.empty))
  }

  test("gateThreshold: admit-none raises loudly naming the gate instead " +
      "of silently yielding an empty card (the r16 0-row flake's shape)") {
    import spark.implicits._
    // a degenerate scored relation — no positives, so NO PR point can
    // reach any recall floor
    val scored = Seq((1L, 0.9, false), (2L, 0.1, false))
      .toDF("doc_id", "s", "truth")
    val pr = graft.ml.Eval.prCurve(scored, "truth", "s")
    val e = intercept[RuntimeException](
      SparkEntry4.gateThreshold(pr, 0.8, "q_test_gate"))
    assert(e.getMessage.contains("q_test_gate") &&
      e.getMessage.contains("NO threshold"), e.getMessage)
    // the healthy path still picks max score meeting the floor
    val ok = Seq((1L, 0.9, true), (2L, 0.5, true), (3L, 0.1, false))
      .toDF("doc_id", "s", "truth")
    val thr = SparkEntry4.gateThreshold(
      graft.ml.Eval.prCurve(ok, "truth", "s"), 0.8, "q_test_gate")
    assert(thr <= 0.5 + 1e-9, s"recall 0.8 over 2 positives needs both: $thr")
  }

  test("contentFpSql: delimiter aliasing and NULL-text erasure are " +
      "impossible by construction") {
    import spark.implicits._
    val fp = graft.ops.Scale.contentFpSql("id", "t")
    def agg(rows: Seq[(String, String)]) =
      rows.toDF("id", "t").selectExpr(s"bit_xor($fp) AS f")
        .head().getLong(0)
    // the r16 formula's alias pair: (id="1|a", t="b") vs (id="1", t="a|b")
    assert(agg(Seq(("1|a", "b"))) != agg(Seq(("1", "a|b"))))
    // NULL text moves the fingerprint instead of erasing the row (the
    // bit_xor leaf must not null out), and differs from empty string
    val withNull = Seq(("1", null.asInstanceOf[String]), ("2", "x"))
    val withEmpty = Seq(("1", ""), ("2", "x"))
    val withText = Seq(("1", "y"), ("2", "x"))
    assert(agg(withNull) != agg(withEmpty))
    assert(agg(withNull) != agg(withText))
    // and the NULL row's id still contributes: dropping it changes the XOR
    assert(agg(withNull) != agg(Seq(("2", "x"))))
  }

  test("CarryState.isReplay cross-version ambiguity guard: an id-less " +
      "batch matching the last batch's count under a DIFFERENT " +
      "fingerprint-encoding version fails loudly (the re-encoded-replay " +
      "shape); a SAME-version count match with a different fp is a " +
      "genuinely fresh batch (uniform chunk sizes) and passes") {
    import graft.ops.{CarryState, Scale}
    val v1 = Scale.tagContentFp _ // current version tag (nibble 1)
    // id-keyed: replay, fresh, and mutated-content cases (unchanged)
    assert(CarryState.isReplay("v", 3L, v1(7L), 10L, (3L, v1(7L), 10L)))
    assert(!CarryState.isReplay("v", 4L, v1(9L), 10L, (3L, v1(7L), 10L)))
    intercept[IllegalArgumentException](
      CarryState.isReplay("v", 3L, v1(9L), 10L, (3L, v1(7L), 10L)))
    // id-keyed across the version boundary: recorded untagged (pre-r18),
    // replay arrives tagged — loud, with the upgrade-specific message
    val ek = intercept[IllegalArgumentException](
      CarryState.isReplay("v", 3L, v1(7L), 10L, (3L, 7L, 10L)))
    assert(ek.getMessage.contains("encoding version"), ek.getMessage)
    // fp-keyed: exact match is a replay; a count mismatch is fresh
    assert(CarryState.isReplay("v", -1L, v1(7L), 10L, (-1L, v1(7L), 10L)))
    assert(!CarryState.isReplay("v", -1L, v1(9L), 11L, (-1L, v1(7L), 10L)))
    // SAME-version count match + fp mismatch = a fresh batch that
    // happens to repeat the last row count — the NORMAL uniform-chunking
    // shape, NOT an error (the r18 guard keys on the version nibble,
    // never the count alone)
    assert(!CarryState.isReplay("v", -1L, v1(9L), 10L, (-1L, v1(7L), 10L)))
    // the guard: count match ACROSS encoding versions (untagged r16/r17
    // evidence vs tagged current fp) is the undecidable re-encoded-replay
    // shape — refuse loudly
    val e = intercept[IllegalArgumentException](
      CarryState.isReplay("v", -1L, v1(9L), 10L, (-1L, 7L, 10L)))
    assert(e.getMessage.contains("encoding") &&
      e.getMessage.contains("batchId"), e.getMessage)
    // cross-version with a DIFFERENT count: certainly not a replay
    // (replays preserve n) — passes as fresh, no forced rebuild
    assert(!CarryState.isReplay("v", -1L, v1(9L), 11L, (-1L, 7L, 10L)))
    // id-KEYED recorded evidence probed id-lessly stays permissive
    assert(!CarryState.isReplay("v", -1L, v1(9L), 10L, (5L, v1(7L), 10L)))
    // no state yet: nothing to guard
    assert(!CarryState.isReplay("v", -1L, v1(9L), 10L, (-1L, 0L, -1L)))
    // the tag itself: version nibble 1, low 60 bits preserved
    assert((v1(7L) >>> 60) == 1L && (v1(7L) & ((1L << 60) - 1)) == 7L)
  }
}
