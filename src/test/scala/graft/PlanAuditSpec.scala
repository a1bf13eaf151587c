package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.PlanAudit

class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanAudit.audit(df).map(_.rule).toSet

  test("flags cartesians, nested loops, global windows; clean plans pass") {
    import spark.implicits._
    val a = spark.range(100).toDF("x")
    val b = spark.range(100).toDF("y")
    // true cartesian (no condition, broadcast disabled so it can't become
    // a nested loop)
    val noBc = a.hint("shuffle_replicate_nl").crossJoin(b)
    assert(rules(noBc).contains("cartesian_product"), rules(noBc).toString)
    // non-equi join -> broadcast nested loop
    assert(rules(a.join(b, col("x") > col("y")))
      .contains("nested_loop_join"))
    // global window: whole data through one task
    val gw = a.withColumn("rn", row_number().over(Window.orderBy("x")))
    assert(rules(gw).contains("global_window"))
    // the library's own alternatives audit clean
    assert(rules(graft.ops.Scale.globalRowNumber(a, Seq(col("x")))) === Set.empty)
    val grouped = a.withColumn("g", col("x") % 5)
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy("x")))
    assert(rules(grouped) === Set.empty)
    // scalar aggregates exchange to one partition legitimately: NOT flagged
    assert(rules(a.agg(sum("x"))) === Set.empty)
    // assertClean throws with the findings listed
    val e = intercept[IllegalArgumentException](PlanAudit.assertClean(gw))
    assert(e.getMessage.contains("global_window"))
    PlanAudit.assertClean(a.agg(sum("x")))
  }

  test("headline queries audit clean (the PlanSpec claims, via the public API)") {
    val dir = "/root/testdata/sf0.001"
    // zone_maps/skew_report/corpus_report thread one-row totals through
    // broadcast crossJoins — the scalar-build exemption must keep them
    // clean; q1/joins/top_n/qsketch are plain declarative plans
    for (q <- Seq("q1_agg", "q_join_multi", "q_top_n",
                  "q_zone_maps", "q_skew_report", "q_qsketch",
                  "q_corpus_report", "q_pair_metrics")) {
      val fs = PlanAudit.audit(SparkEntry.queries(q)(spark, dir))
      assert(fs.isEmpty, s"$q: $fs")
    }
    // k-means' deliberate broadcast-centroid cross join DOES flag — the
    // auditor can't bound a grouped broadcast, so it asks for review
    val km = PlanAudit.audit(SparkEntry.queries("q_kmeans")(spark, dir))
    assert(km.map(_.rule).contains("nested_loop_join"))
    graft.ml.Dedup.unpersistIntermediates()
  }
}
