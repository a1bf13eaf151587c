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
    }
  }

  test("every query has matching column names with its oracle intent") {
    // oracleSql keys must be a subset of queries keys
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }
}
