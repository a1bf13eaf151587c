package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fns, Vec}

/** Behavioral parity cases ported from the reference's own test suite
  * (expected outputs taken from siuba/tests/test_verb_*.py — cited per
  * test). These pin the semantics the driver's oracle can't easily express:
  * verb-state interactions (arrange→group_by→filter), NA groups, sequential
  * overwrites.
  */
class SiubaParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df1 = {
    import spark.implicits._
    (1 to 10).map(x => (x, if (x <= 5) 1 else 2)).toDF("x", "g")
  }

  private def collectXG(t: Tbl): Seq[(Int, Int)] =
    t.df.select("x", "g").collect().map(r => (r.getInt(0), r.getInt(1)))
      .sortBy(identity).toSeq

  test("filter via group_by + row_number (test_verb_filter.py:34)") {
    val out = Tbl(df1).arrange(col("x")).groupBy("g")
      .filter(Vec.rowNumber().transform(_ < 3))
    assert(collectXG(out) == Seq((1, 1), (2, 1), (6, 2), (7, 2)))
  }

  test("filter via group_by agg (test_verb_filter.py:50)") {
    val out = Tbl(df1).groupBy("g").filter(col("x") > avg(col("x")))
    assert(collectXG(out) == Seq((4, 1), (5, 1), (9, 2), (10, 2)))
  }

  test("filter two ANDed agg args (test_verb_filter.py:60)") {
    val out = Tbl(df1).groupBy("g")
      .filter(col("x") > avg(col("x")), col("x") =!= max(col("x")))
    assert(collectXG(out) == Seq((4, 1), (9, 2)))
  }

  test("group_by >> arrange >> cumsum filter (test_verb_filter.py:71)") {
    import spark.implicits._
    val d = Tbl(Seq((3, 1), (2, 1), (1, 1), (2, 2), (3, 2), (4, 2)).toDF("x", "g"))
    val out = d.groupBy("g").arrange(col("x"))
      .filter(Vec.cumsum(col("x")).transform(_ > 3))
    assert(collectXG(out) == Seq((3, 1), (3, 2), (4, 2)))
    val outDesc = d.groupBy("g").arrange(col("x").desc)
      .filter(Vec.cumsum(col("x")).transform(_ > 3))
    assert(collectXG(outDesc) == Seq((1, 1), (2, 1), (2, 2), (3, 2), (4, 2)))
  }

  test("filter before summarize, grouped (test_verb_filter.py:90,101)") {
    import spark.implicits._
    val d = Tbl(Seq((1, "a"), (2, "b"), (3, "b")).toDF("x", "g"))
    val z = d.filter(col("x") > 2).summarize("z" -> avg(col("x")))
      .df.head().getDouble(0)
    assert(z == 3.0)
    val d2 = Tbl(Seq((1, "a"), (2, "a"), (3, "b")).toDF("x", "g"))
    val grouped = d2.groupBy("g").filter(avg(col("x")) > 2)
      .summarize("z" -> avg(col("x"))).df.collect()
    assert(grouped.length == 1 && grouped(0).getString(0) == "b"
      && grouped(0).getDouble(1) == 3.0)
  }

  test("mutate with cumulative agg (test_verb_mutate.py:110)") {
    import spark.implicits._
    val d = Tbl((0 until 4).map(i => (i, i + 1, if (i < 2) 1 else 2))
      .toDF("idx", "x", "g"))
    val out = d.arrange(col("idx")).groupBy("g")
      .mutate("y" -> Vec.cumsum(col("x")))
      .df.orderBy("idx").select("y").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 3L, 3L, 7L))
  }

  test("mutate overwrites previous column (test_verb_mutate.py:123)") {
    import spark.implicits._
    val d = Tbl((1 to 4).map(x => (x, if (x <= 2) 1 else 2)).toDF("x", "g"))
    val out = d.mutate("x" -> (col("x") + 1)).mutate("x" -> (col("x") + 1))
    assert(out.df.select("x").collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 4, 5, 6))
  }

  test("mutate after summarize uses the summarized frame (test_verb_mutate.py:133,144)") {
    import spark.implicits._
    val d = Tbl((1 to 4).map(x => (x, if (x == 1) 1 else 2)).toDF("x", "g"))
    val out = d.groupBy("g").summarize("avg" -> min(col("x")))
      .mutate("avg_g" -> avg(col("g")), "avg_avg" -> avg(col("avg")))
      .df.orderBy("g").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2))       // avg = min(x) per g
    assert(out.forall(_.getDouble(2) == 1.5))             // mean over result frame
    assert(out.forall(_.getDouble(3) == 1.5))             // mean of derived col
  }

  test("grouped mutate keeps NA groups (test_verb_mutate.py:79)") {
    import spark.implicits._
    val d = Tbl(Seq((1, Some(1)), (2, None), (3, None)).toDF("x", "g"))
    val out = d.groupBy("g").mutate("s" -> sum(col("x")))
      .df.orderBy("x").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 5L, 5L)) // NULL group aggregated
  }

  test("distinct of mutated column (test_verb_distinct.py:83,89)") {
    import spark.implicits._
    val d = Tbl(Seq(1, 2, 3, 4).toDF("x"))
    val out = d.mutate("parity" -> (col("x") % 2)).distinct(Seq("parity"))
    assert(out.df.count() == 2)
  }

  test("join with different key names keeps left key only (test_verb_join.py:46)") {
    import spark.implicits._
    val l = Tbl(Seq((1, "x1"), (2, "x2")).toDF("ii", "x"))
    val r = Tbl(Seq((1, "a"), (2, "b")).toDF("jj", "y"))
    val out = l.join(r, Seq("ii" -> "jj"), "inner")
    assert(out.df.columns.toSeq == Seq("ii", "x", "y"))
    assert(out.df.count() == 2)
  }

  test("join on multiple keys (test_verb_join.py:58)") {
    import spark.implicits._
    val l = Tbl(Seq((1, 1, "x1"), (2, 2, "x2"), (3, 9, "x3")).toDF("ii", "jj", "x"))
    val r = Tbl(Seq((1, 1, "a"), (2, 2, "b"), (4, 4, "c")).toDF("ii", "jj", "y"))
    val out = l.innerJoin(r, Seq("ii", "jj"))
    assert(out.df.columns.toSeq == Seq("ii", "jj", "x", "y"))
    assert(out.df.count() == 2)
  }

  test("arrange with computed expression sorts by it (test_verb_arrange.py:41)") {
    import spark.implicits._
    val d = Tbl(Seq(2, 1, 3).toDF("x"))
    val out = d.arrange(col("x") * -1).df.collect().map(_.getInt(0))
    assert(out.toSeq == Seq(3, 2, 1))
  }

  test("back-to-back arrange: last ordering wins (test_verb_arrange.py:79)") {
    import spark.implicits._
    val d = Tbl(Seq((1, 2), (2, 2), (3, 1), (4, 1)).toDF("x", "g"))
    val t2 = d.arrange(col("x")).arrange(col("g"))
    assert(t2.ord.map(_.toString) == Seq(col("g").toString))
    // windows use the LAST arrange's ordering
    val rn = t2.groupBy("g").mutate("rn" -> Vec.rowNumber())
      .df.orderBy("x").collect().map(_.getInt(2))
    assert(rn.length == 4)
  }

  test("grouped arrange sorts the whole frame (test_verb_arrange.py:53)") {
    import spark.implicits._
    val d = Tbl(Seq((3, "a"), (1, "b"), (2, "a")).toDF("x", "y")).groupBy("y")
    val out = d.arrange(col("x")).df.collect().map(_.getInt(0))
    assert(out.toSeq == Seq(1, 2, 3)) // global sort, not per-group blocks
  }

  test("m:n join multiplies rows (FIXTURES §1, verbs.py:1545-1672)") {
    import spark.implicits._
    val l = Tbl(Seq((1, "a1"), (1, "a2"), (2, "b")).toDF("id", "x"))
    val r = Tbl(Seq((1, "r1"), (1, "r2")).toDF("id", "y"))
    val out = l.innerJoin(r, Seq("id"))
    assert(out.df.count() == 4) // 2x2 for id=1, 0 for id=2 (inner)
    assert(l.leftJoin(r, Seq("id")).df.count() == 5) // id=2 kept with NULL y
  }

  test("rank family keeps NA ranks as NA with ties (vector.py:107-165)") {
    import spark.implicits._
    val d = Tbl(Seq(Some(2.0), Some(1.0), Some(2.0), None).toDF("v"))
    val out = d.mutate(
      "mr" -> Vec.minRank(col("v")),
      "dr" -> Vec.denseRank(col("v")),
      "ar" -> Vec.avgRank(col("v"))).df.orderBy(col("v").asc_nulls_last).collect()
    assert(out(0).getInt(1) == 1 && out(1).getInt(1) == 2 && out(2).getInt(1) == 2)
    assert(out(1).getInt(2) == 2 && out(2).getInt(2) == 2) // dense
    assert(out(1).getDouble(3) == 2.5 && out(2).getDouble(3) == 2.5) // average ties
    assert(out(3).isNullAt(1) && out(3).isNullAt(2) && out(3).isNullAt(3))
  }

  test("semi_join with no on infers the shared column (test_verb_join.py:172)") {
    import spark.implicits._
    val l = Tbl(Seq((1, "a"), (2, "b")).toDF("ii", "v"))
    val dfIi = Tbl(Seq(1, 1).toDF("ii"))
    // shared column 'ii' inferred; the duplicate right rows don't multiply
    val out = l.semiJoin(dfIi).df.collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1))
    // no shared columns → error, like the reference (test_verb_join.py:185)
    intercept[GraftError] { l.semiJoin(Tbl(Seq(1).toDF("zz"))) }
  }

  test("distinct with computed kwargs renames then dedupes (test_verb_distinct.py:89)") {
    import spark.implicits._
    // distinct(_.y, a = _.x): output columns (y, a), deduped over both
    val d = Tbl(Seq(("p", 1), ("p", 1), ("q", 2)).toDF("x", "y"))
    val out = d.distinct("y" -> col("y"), "a" -> col("x")).df
    assert(out.columns.toSeq == Seq("y", "a"))
    assert(out.collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
      == Seq((1, "p"), (2, "q")))
  }

  test("grouped distinct always includes the group keys (test_verb_distinct.py:45)") {
    import spark.implicits._
    val d = Tbl(Seq(("a", 1), ("a", 1), ("b", 1), ("b", 2)).toDF("g", "x"))
    val out = d.groupBy("g").distinct(Seq("x")).df
    assert(out.columns.toSet == Set("g", "x"))
    assert(out.count() == 3) // (a,1) (b,1) (b,2)
  }
}
