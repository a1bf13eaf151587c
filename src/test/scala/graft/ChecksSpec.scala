package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Checks

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("duplicate keys, nulls, range, orphans — exact violation counts") {
    val child = Seq(
      (1L, Some(10L), Some(5.0)),
      (1L, Some(10L), Some(60.0)),  // dup key (1,10); out of range
      (2L, Some(99L), None),        // orphan parent; null v
      (3L, None, Some(7.0)),        // null key: not an orphan
      (4L, Some(20L), Some(-1.0))   // out of range
    ).toDF("id", "pid", "v")
    val parent = Seq(10L, 20L).toDF("pk")

    assert(Checks.duplicateKeyCount(child, Seq("id", "pid"))
      .head().getLong(0) == 1L)
    val nulls = Checks.nullCounts(child, Seq("pid", "v")).head()
    assert(nulls.getLong(0) == 1L && nulls.getLong(1) == 1L)
    assert(Checks.outOfRangeCount(child, col("v"), lit(0.0), lit(50.0))
      .head().getLong(0) == 2L)
    assert(Checks.orphanCount(child, "pid", parent, "pk")
      .head().getLong(0) == 1L)
    val gate = Checks.gate(child, Seq("id", "pid"), Seq("v")).head()
    assert(gate.getLong(0) == 1L && gate.getLong(1) == 1L)
  }
}
