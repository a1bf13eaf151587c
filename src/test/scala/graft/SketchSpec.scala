package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketch

class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.assertSameRows

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("count-min with ample width is the exact count table") {
    // 5 distinct langs, width 1024: collision probability over 3 rows of
    // 1024 buckets is ~0 for this key set — estimates equal exact counts
    val sk = Sketch.countMin(docs, col("lang"), width = 1024, depth = 3)
    val est = Sketch.countMinEstimate(sk, docs, col("lang"), 1024, 3)
    val exact = docs.groupBy(col("lang").cast("string").as("k"))
      .agg(count(lit(1)).as("est"))
    assertSameRows(est, exact)
  }

  test("count-min never underestimates (one-sided error)") {
    // width 4 forces heavy collisions; the CM guarantee est >= true must
    // still hold for every key
    val sk = Sketch.countMin(docs, col("doc_id") % 37, width = 4, depth = 3)
    val est = Sketch.countMinEstimate(sk, docs, col("doc_id") % 37, 4, 3)
    val exact = docs.groupBy((col("doc_id") % 37).cast("string").as("k"))
      .agg(count(lit(1)).as("tru"))
    val under = est.join(exact, "k").filter(col("est") < col("tru"))
    assert(under.count() === 0L)
  }

  test("merged shard sketches equal the single-pass sketch") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = Sketch.countMinMerge(
      Sketch.countMin(a, col("lang"), 64, 3),
      Sketch.countMin(b, col("lang"), 64, 3))
    assertSameRows(merged, Sketch.countMin(docs, col("lang"), 64, 3))
  }

  test("absent keys estimate only the collision mass; nulls are not counted") {
    val sk = Sketch.countMin(docs, col("lang"), width = 1024, depth = 3)
    val probe = spark.range(1).select(lit("no_such_lang").as("k"))
    val est = Sketch.countMinEstimate(sk, probe, col("k"), 1024, 3)
      .collect()
    assert(est.length === 1 && est(0).getLong(1) === 0L)

    val withNulls = docs.select(
      when(col("doc_id") % 2 === 0, col("lang")).as("lang"))
    val skN = Sketch.countMin(withNulls, col("lang"), 1024, 3)
    val total = skN.filter(col("d") === 0).agg(sum("cnt")).collect()(0).getLong(0)
    assert(total === docs.filter(col("doc_id") % 2 === 0).count())
  }

  test("edge cases: empty input, empty probe, invalid params") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("k")
    assert(Sketch.countMin(empty, col("k"), 8, 2).count() === 0L)
    val sk = Sketch.countMin(docs, col("lang"), 8, 2)
    assert(Sketch.countMinEstimate(sk, empty, col("k"), 8, 2).count() === 0L)
    assertThrows[IllegalArgumentException](
      Sketch.countMin(docs, col("lang"), 0, 2))
    assertThrows[IllegalArgumentException](
      Sketch.countMin(docs, col("lang"), 8, 0))
    // merging with an empty sketch is the identity
    TestSpark.assertSameRows(
      Sketch.countMinMerge(sk, Sketch.countMin(empty, col("k"), 8, 2)), sk)
  }

  test("per-group HLL: exact in the coupon regime; shard merge == single build") {
    val full = Sketch.hllEstimate(
      Sketch.hllByGroup(docs, Seq("lang"), col("doc_id") % 37), Seq("lang"))
    val exact = docs.groupBy("lang")
      .agg(countDistinct(col("doc_id") % 37).as("nd"))
    assertSameRows(full, exact)
    // merge across shards: estimates identical to the one-pass build
    val a = Sketch.hllByGroup(docs.filter(col("doc_id") % 2 === 0),
      Seq("lang"), col("doc_id") % 37)
    val b = Sketch.hllByGroup(docs.filter(col("doc_id") % 2 =!= 0),
      Seq("lang"), col("doc_id") % 37)
    val merged = Sketch.hllEstimate(
      Sketch.hllMergeByGroup(a, b, Seq("lang")), Seq("lang"))
    assertSameRows(merged, exact)
  }

  test("countMinJoinSize: one-sided, exact with ample width, 0 on disjoint keys") {
    import spark.implicits._
    val a = spark.range(300).select((col("id") % 40).as("k"))
    val b = spark.range(200).select((col("id") % 25).as("k"))
    val trueSize = a.join(b, "k").count()
    // ample width: every key its own bucket -> estimate is exact
    val exactEst = Sketch.countMinJoinSize(
      Sketch.countMin(a, col("k"), 4096, 3),
      Sketch.countMin(b, col("k"), 4096, 3), 3).collect()(0).getLong(0)
    assert(exactEst === trueSize)
    // collision regime: never an underestimate
    val tight = Sketch.countMinJoinSize(
      Sketch.countMin(a, col("k"), 8, 3),
      Sketch.countMin(b, col("k"), 8, 3), 3).collect()(0).getLong(0)
    assert(tight >= trueSize)
    // disjoint single keys with ample width: their buckets differ at some
    // depth, and that empty-intersection row must force the estimate to 0
    // (not silently drop out of the min)
    val x = Seq("only_x").toDF("k")
    val y = Seq("only_y").toDF("k")
    val disj = Sketch.countMinJoinSize(
      Sketch.countMin(x, col("k"), 4096, 3),
      Sketch.countMin(y, col("k"), 4096, 3), 3).collect()(0).getLong(0)
    assert(disj === 0L)
    // big-data cells: 4e9 x 4e9 per bucket overflows int64 — the decimal
    // accumulator must keep the estimate positive and cap at Long.MaxValue
    val huge = Seq((0, 0L, 4000000000L), (1, 0L, 4000000000L),
      (2, 0L, 4000000000L)).toDF("d", "b", "cnt")
    val big = Sketch.countMinJoinSize(huge, huge, 3).collect()(0).getLong(0)
    assert(big === Long.MaxValue)
  }

  // ---------------------------------------------------------------
  // quantile sketch
  // ---------------------------------------------------------------

  private def qVals(n: Int) = {
    import spark.implicits._
    // deterministic, duplicate-heavy, unsorted value stream
    spark.range(n).select(lit("g").as("g"),
      (pmod(col("id") * 2654435761L, lit(n)) % (n / 3)).cast("double").as("x"))
  }

  test("quantile sketch: exact regime returns order statistics") {
    val df = qVals(500)
    val est = Sketch.quantileEstimate(
      Sketch.quantileSketchByGroup(df, Seq("g"), col("x"), k = 1024),
      Seq("g"), Seq(1000, 5000, 9000, 10000))
    // type-1 (lower) weighted quantile == the ceil(q*n)-th order statistic
    val sorted = df.orderBy("x").collect().map(_.getDouble(1))
    val got = est.collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    for (bp <- Seq(1000, 5000, 9000, 10000)) {
      val target = (bp.toLong * 500 + 9999) / 10000
      assert(got(bp / 10000.0) === sorted((target - 1).toInt),
        s"bp=$bp")
    }
  }

  test("quantile sketch: compaction conserves weight and bounds rank error") {
    val n = 20000
    val df = qVals(n)
    val sk = Sketch.quantileSketchByGroup(df, Seq("g"), col("x"), k = 64)
    // capacity respected and weight conserved exactly
    val perLvl = sk.groupBy("lvl").agg(count(lit(1)).as("c")).collect()
    assert(perLvl.forall(_.getLong(1) <= 64))
    val totW = sk.agg(sum("w")).collect()(0).getLong(0)
    assert(totW === n.toLong)
    // rank error of every estimate within the MRL bound envelope
    val sorted = df.orderBy("x").collect().map(_.getDouble(1))
    val est = Sketch.quantileEstimate(sk, Seq("g"),
      Seq(500, 2500, 5000, 7500, 9500)).collect()
      .map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val eps = 0.08 // ~ log2(n/k) * (n/k) / n with deterministic halving
    for ((q, v) <- est) {
      val target = math.ceil(q * n).toLong
      // true rank range of v in the sorted stream (v always comes from it)
      val lo = sorted.indexWhere(_ == v) + 1L
      val hi = sorted.lastIndexWhere(_ == v) + 1L
      assert(lo > 0, s"estimate $v not drawn from the input multiset")
      val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(err <= (eps * n).toLong, s"q=$q est=$v rank err $err")
    }
  }

  test("quantile sketch: rank-error sweep over (n, k) configs incl. merges") {
    import spark.implicits._
    // seeded sweep: adversarial-ish streams (multiplicative hash order,
    // heavy duplicates) across sizes and capacities; every estimate's rank
    // error must stay inside the MRL-style envelope, and a merge of halves
    // inside twice that
    for (seed <- 1 to 4; k <- Seq(16, 64)) {
      val n = 700 * seed + 300
      val df = spark.range(n).select(lit("g").as("g"),
        (pmod(col("id") * (2654435761L + seed), lit(n)) % (n / (seed + 2)))
          .cast("double").as("x"))
      val sorted = df.orderBy("x").collect().map(_.getDouble(1))
      val eps = math.max(0.02,
        math.log(n.toDouble / k) / math.log(2.0) * (1.0 / k))
      def checkErr(est: Map[Double, Double], label: String, mult: Double): Unit =
        for ((q, v) <- est) {
          val target = math.ceil(q * n).toLong
          val lo = sorted.indexWhere(_ == v) + 1L
          val hi = sorted.lastIndexWhere(_ == v) + 1L
          assert(lo > 0, s"$label: estimate $v not from input")
          val err =
            if (target < lo) lo - target else if (target > hi) target - hi else 0L
          assert(err <= (mult * eps * n).toLong + 1,
            s"$label n=$n k=$k q=$q err=$err bound=${(mult * eps * n).toLong}")
        }
      val bps = Seq(1000, 2500, 5000, 7500, 9900)
      val sk = Sketch.quantileSketchByGroup(df, Seq("g"), col("x"), k)
      checkErr(Sketch.quantileEstimate(sk, Seq("g"), bps).collect()
        .map(r => r.getDouble(1) -> r.getDouble(2)).toMap, "single", 1.0)
      val merged = Sketch.quantileSketchMerge(
        Sketch.quantileSketchByGroup(df.filter(col("id") % 2 === 0),
          Seq("g"), col("x"), k),
        Sketch.quantileSketchByGroup(df.filter(col("id") % 2 =!= 0),
          Seq("g"), col("x"), k), Seq("g"), k)
      assert(merged.agg(sum("w")).collect()(0).getLong(0) === n.toLong)
      checkErr(Sketch.quantileEstimate(merged, Seq("g"), bps).collect()
        .map(r => r.getDouble(1) -> r.getDouble(2)).toMap, "merged", 2.0)
    }
  }

  test("quantile sketch: pure function of the multiset (partition invariant)") {
    val df = qVals(5000)
    val a = Sketch.quantileSketchByGroup(df, Seq("g"), col("x"), k = 32)
    val b = Sketch.quantileSketchByGroup(df.repartition(13), Seq("g"),
      col("x"), k = 32)
    assertSameRows(a, b)
  }

  test("quantile sketch: exact-regime merge is lossless; compacted merge bounded") {
    val df = qVals(800)
    val a = df.filter(col("id") % 2 === 0)
    val b = df.filter(col("id") % 2 =!= 0)
    // exact regime: merged == single build, row for row
    assertSameRows(
      Sketch.quantileSketchMerge(
        Sketch.quantileSketchByGroup(a, Seq("g"), col("x"), 1024),
        Sketch.quantileSketchByGroup(b, Seq("g"), col("x"), 1024),
        Seq("g"), 1024),
      Sketch.quantileSketchByGroup(df, Seq("g"), col("x"), 1024))
    // compaction regime: merged sketch still conserves weight and capacity
    val m = Sketch.quantileSketchMerge(
      Sketch.quantileSketchByGroup(a, Seq("g"), col("x"), 32),
      Sketch.quantileSketchByGroup(b, Seq("g"), col("x"), 32),
      Seq("g"), 32)
    assert(m.agg(sum("w")).collect()(0).getLong(0) === 800L)
    assert(m.groupBy("g", "lvl").agg(count(lit(1)).as("c"))
      .filter(col("c") > 32).count() === 0L)
  }

  test("quantile sketch: nulls skipped, empty input, invalid params") {
    import spark.implicits._
    val withNulls = Seq(Some(1.0), None, Some(2.0), Some(3.0), None)
      .toDF("x").withColumn("g", lit("g"))
    val sk = Sketch.quantileSketchByGroup(withNulls, Seq("g"), col("x"), 8)
    assert(sk.count() === 3L)
    val empty = Seq.empty[Double].toDF("x").withColumn("g", lit("g"))
    assert(Sketch.quantileSketchByGroup(empty, Seq("g"), col("x"), 8)
      .count() === 0L)
    assertThrows[IllegalArgumentException](
      Sketch.quantileSketchByGroup(withNulls, Seq("g"), col("x"), 1))
    assertThrows[IllegalArgumentException](
      Sketch.quantileEstimate(sk, Seq("g"), Seq(0)))
    assertThrows[IllegalArgumentException](
      Sketch.quantileEstimate(sk, Seq("g"), Seq.empty))
  }

  test("build is one counter shuffle; probe broadcasts the sketch") {
    val sk = Sketch.countMin(docs, col("lang"), 64, 3)
    val est = Sketch.countMinEstimate(sk, docs, col("lang"), 64, 3)
    val plan = est.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"sketch side must broadcast into the probe:\n$plan")
    // partial aggregation collapses cells before the exchange: the build's
    // shuffle carries (d, b) groups, so both aggregate halves appear
    val build = sk.queryExecution.executedPlan.toString
    assert(build.contains("HashAggregate"), build)
  }
}
