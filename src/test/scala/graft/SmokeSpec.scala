package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs every SparkEntry query on the sf0.001 testdata — the same contract
  * the driver smoke-checks (rows > 0, no exception).
  */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"query $name returned 0 rows")
      // per-query hygiene, matching Bench.scala and PlanAuditSpec: the
      // 269-query sweep otherwise accumulates every query's pinned caches
      // for the whole session — in a long full-suite run that is exactly
      // the block-eviction pressure that turns "recomputable" into racy
      // (the r16 q_lifecycle_e2e 0-row flake).
      graft.ml.Dedup.unpersistIntermediates()
      spark.catalog.clearCache()
    }
  }

  test("every query has matching column names with its oracle intent") {
    // oracleSql keys must be a subset of queries keys
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  test("Verify reports a broken query in _errors.json instead of dropping it") {
    // round-8 regression shape: a query that throws at analysis must leave a
    // visible error record, and the parity line must account for every
    // declared query (dumped + failed == selected)
    val out = java.nio.file.Files.createTempDirectory("graft-verify-err").toString
    val good: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, d) => SparkEntry.queries("q1_agg")(s, d)
    val bad: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, d) => SparkEntry.readTable(s, d, "events").df.selectExpr("no_such_col + 1")
    val errs = Verify.run(spark, dir, out,
      Map("q_ok" -> good, "q_broken" -> bad), Map("q_ok" -> "SELECT 1"))
    assert(errs.keySet == Set("q_broken"), errs)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"$out/q_ok")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/q_broken")))
    val errJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/_errors.json"))
    assert(errJson.contains("q_broken"), errJson)
  }
}
