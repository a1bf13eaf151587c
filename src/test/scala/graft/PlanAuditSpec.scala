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

  // ---------------------------------------------------------------------
  // The scale CI gate: EVERY declared query's physical plan is audited.
  // A new query that grows a cartesian product, an unbounded nested-loop
  // join, a global window, or a single-task sort fails HERE before any
  // driver run sees it. Exemptions are explicit and justified — a rule may
  // fire for a query ONLY if listed below.
  // ---------------------------------------------------------------------
  private val allowlist: Map[String, Set[String]] = {
    // k-row centroid broadcasts: kmeans/IVF/PQ assign every row against a
    // broadcast centroid table via crossJoin. The build side is bounded by
    // construction (k rows, k <= 64 in every query) but is a GROUPED
    // relation, so the auditor cannot see the bound and asks for review —
    // reviewed: bounded, by the k/limit argument of the builder.
    val centroidBroadcast = Set("nested_loop_join")
    // brute-force exact rankers: corpus x broadcast-queries with a non-equi
    // (id inequality) condition IS the operator — the ground-truth baseline
    // approximate indexes are graded against. Queries are broadcast-bounded
    // by contract (bruteForceTopK's scaladoc); the corpus streams once.
    val bruteForce = Set("nested_loop_join")
    // expand()/complete()/pivot_wider(id_expand): the REFERENCE semantics
    // are the cross product of the selected columns' DISTINCT value sets
    // (tidyr::expand) — the cross join is the operator, and its inputs are
    // distinct-value dimension tables, not data rows.
    val expandCross = Set("nested_loop_join")
    // the persisted 1-row model artifact: q_linear_probe's weight ride is
    // auto-exempt (its build side IS the scalar Gram aggregate), but the
    // persisted twin reads the same single row back from parquet, where
    // the auditor can no longer see the bound — reviewed: the artifact is
    // one row by construction (Regress.fitOls aggregates ungrouped)
    val modelBroadcast = Set("nested_loop_join")
    // (q_pq_topk and q_semantic_dedup need NO entry: their centroid joins
    // carry an equi key — `sub` / `cluster` — so they plan as hash joins)
    Map(
      "q_kmeans"              -> centroidBroadcast,
      "q_ann_ivf"             -> centroidBroadcast,
      "q_pq_ivf"              -> centroidBroadcast, // the coarse route() leg
      "q_pq_refine"           -> centroidBroadcast, // same route() leg under the refine
      "q_ann_bruteforce"      -> bruteForce,
      "q_rand_proj"           -> bruteForce, // exact ranking in the reduced space
      // the SQ8 probes rank reconstructed codes against broadcast-bounded
      // query batches — bruteForceTopK's contract at 1/4 the scan bytes
      "q_sq8_topk"            -> bruteForce,
      "q_sq8_persisted"       -> bruteForce,
      "q_sq8_recall"          -> bruteForce, // truth leg AND the SQ8 probe
      "q_sq8_ivf"             -> centroidBroadcast, // route legs (build+probe)
      // (q_hard_negatives needs NO entry: its bruteForce candidate leg is
      // trackCache'd, so the audited plan reads the InMemoryRelation and
      // the NLJ lives inside the cached subtree the walker doesn't enter)
      "q_probe_persisted"     -> modelBroadcast,
      "q_hybrid_rrf"          -> bruteForce, // its semantic leg is bruteForceTopK
      "q_expand_complete"     -> expandCross,
      "q_pivot_wider_idexpand" -> expandCross
    )
  }

  test("ALL queries audit clean (scale CI gate over the whole surface)") {
    val dir = "/root/testdata/sf0.001"
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val used = scala.collection.mutable.Set.empty[(String, String)]
    for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val findings =
        try PlanAudit.audit(q(spark, dir))
        catch { case e: Exception =>
          Seq(PlanAudit.Finding("audit_error", e.toString.take(200)))
        }
      val (exempt, extra) = findings.partition(f =>
        allowlist.getOrElse(name, Set.empty).contains(f.rule))
      exempt.foreach(f => used += ((name, f.rule)))
      if (extra.nonEmpty)
        failures += s"$name: ${extra.map(f => s"[${f.rule}] ${f.node}").mkString("; ")}"
    }
    assert(failures.isEmpty,
      s"${failures.size} queries with unexempted scale red flags:\n" +
        failures.mkString("\n"))
    // every exemption must actually FIRE — a stale allowlist entry is a
    // hole a future regression could hide in
    val unused = for {
      (name, rules) <- allowlist.toSeq; rule <- rules
      if !used.contains((name, rule))
    } yield s"$name/$rule"
    assert(unused.isEmpty, s"stale allowlist entries: ${unused.mkString(", ")}")
    graft.ml.Dedup.unpersistIntermediates()
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
