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

  test("rows_insert/update/upsert/delete follow the dplyr contract") {
    val target = Tbl(Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v"))
    // patch omits v; includes existing key 2 and new key 9
    val patch = Tbl(Seq((2L, "B!"), (9L, "NEW")).toDF("k", "s"))

    def rows(t: Tbl): Set[(Long, String, Option[Double])] =
      t.df.collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

    assert(rows(target.rowsInsert(patch, Seq("k"))) == Set(
      (1L, "a", Some(10.0)), (2L, "b", Some(20.0)), (3L, "c", Some(30.0)),
      (9L, "NEW", None)))
    assert(rows(target.rowsUpdate(patch, Seq("k"))) == Set(
      (1L, "a", Some(10.0)), (2L, "B!", Some(20.0)), (3L, "c", Some(30.0))))
    assert(rows(target.rowsUpsert(patch, Seq("k"))) == Set(
      (1L, "a", Some(10.0)), (2L, "B!", Some(20.0)), (3L, "c", Some(30.0)),
      (9L, "NEW", None)))
    assert(rows(target.rowsDelete(patch, Seq("k"))) == Set(
      (1L, "a", Some(10.0)), (3L, "c", Some(30.0))))
    // NULLs in the source DO overwrite (rows_update semantics)
    val nullPatch = Tbl(Seq((1L, null.asInstanceOf[String])).toDF("k", "s"))
    assert(rows(target.rowsUpdate(nullPatch, Seq("k")))
      .contains((1L, null, Some(10.0))))
    // source column not in target -> loud error
    intercept[Exception] {
      target.rowsInsert(Tbl(Seq((1L, 2L)).toDF("k", "zz")), Seq("k"))
    }
  }
}
