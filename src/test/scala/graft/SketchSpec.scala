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
