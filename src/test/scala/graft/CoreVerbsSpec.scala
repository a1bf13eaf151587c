package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fns, Vec}

/** Differential tests for the core verbs: each graft pipeline is checked
  * against the equivalent raw Spark SQL (the same oracle idea as the
  * reference's pandas-vs-SQL-backend tests, siuba/tests/helpers.py).
  */
class CoreVerbsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.assertSameRows

  private lazy val df = {
    import spark.implicits._
    Seq(
      ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
      ("b", 4, 40.0), ("b", 5, 50.0), ("c", 6, null.asInstanceOf[Double])
    ).toDF("g", "x", "y")
  }

  test("mutate: later args see earlier results") {
    val out = Tbl(df).mutate("a" -> (col("x") + 1), "b" -> (col("a") * 2)).df
    assertSameRows(out, df.withColumn("a", col("x") + 1).withColumn("b", col("a") * 2))
  }

  test("grouped mutate broadcasts aggregates (agg-in-mutate)") {
    val out = Tbl(df).groupBy("g")
      .mutate("demeaned" -> (col("x") - avg(col("x")))).df
    df.createOrReplaceTempView("t1")
    val expect = spark.sql(
      "SELECT g, x, y, x - avg(x) OVER (PARTITION BY g) AS demeaned FROM t1")
    assertSameRows(out, expect)
  }

  test("grouped filter with aggregate predicate") {
    val out = Tbl(df).groupBy("g").filter(col("x") === max(col("x"))).df
    df.createOrReplaceTempView("t2")
    val expect = spark.sql(
      """SELECT g, x, y FROM
        | (SELECT *, max(x) OVER (PARTITION BY g) AS mx FROM t2) WHERE x = mx""".stripMargin)
      .drop("mx")
    assertSameRows(out, expect)
  }

  test("summarize over groups") {
    val out = Tbl(df).groupBy("g")
      .summarize("n" -> Fns.Agg.n(), "sx" -> sum(col("x"))).df
    df.createOrReplaceTempView("t3")
    assertSameRows(out, spark.sql("SELECT g, count(*) AS n, sum(x) AS sx FROM t3 GROUP BY g"))
  }

  test("select tidyselect: negation, range, rename") {
    val out = Tbl(df).select(Sel.Not(Sel.Name("y"))).df
    assert(out.columns.toSeq == Seq("g", "x"))
    val ren = Tbl(df).select(Sel.Rename("grp", Sel.Name("g")), Sel.Name("x")).df
    assert(ren.columns.toSeq == Seq("grp", "x"))
    val rng = Tbl(df).select(Sel.NameRange("g", "x")).df
    assert(rng.columns.toSeq == Seq("g", "x"))
  }

  test("select re-adds missing group columns") {
    val out = Tbl(df).groupBy("g").select(Seq("x"): _*)
    assert(out.df.columns.toSeq == Seq("g", "x"))
    assert(out.groups == Seq("g"))
  }

  test("distinct / head / arrange") {
    val out = Tbl(df).mutate("k" -> (col("x") % 2)).distinct(Seq("k")).df
    assert(out.count() == 2)
    assert(Tbl(df).arrange(col("x").desc).head(2).df.collect().map(_.getInt(1)).toSeq == Seq(6, 5))
  }

  test("count and addCount") {
    val c = Tbl(df).groupBy("g").count().df
    df.createOrReplaceTempView("t4")
    assertSameRows(c, spark.sql("SELECT g, count(*) AS n FROM t4 GROUP BY g"))
    val ac = Tbl(df).groupBy("g").addCount().df
    assertSameRows(ac, spark.sql("SELECT *, count(*) OVER (PARTITION BY g) AS n FROM t4"))
  }

  test("compute materializes and cuts lineage; results unchanged") {
    val t = Tbl(df).groupBy("g").mutate("d" -> (col("x") - avg(col("x"))))
    val c = t.compute()
    assertSameRows(c.df, t.df)
    // lineage is cut: the computed frame's plan no longer contains the scan
    val plan = c.df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("Scan ExistingRDD"), plan.take(300))
    // group state survives compute (it's verb state, not plan state)
    assert(c.groups == Seq("g"))
  }

  test("tally: current groups only, weighted and sorted") {
    val plain = Tbl(df).groupBy("g").tally().df
    df.createOrReplaceTempView("t4t")
    assertSameRows(plain, spark.sql("SELECT g, count(*) AS n FROM t4t GROUP BY g"))
    val wt = Tbl(df).groupBy("g").tally(wt = Some(col("x")), sort = true)
      .df.collect()
    assert(wt.map(_.getString(0)).toSeq ==
      spark.sql("SELECT g FROM t4t GROUP BY g ORDER BY sum(x) DESC")
        .collect().map(_.getString(0)).toSeq)
  }

  test("valueCounts, describe, mode extensions") {
    import graft.dsl._
    val vc = Tbl(df).valueCounts("g").df.collect()
    assert(vc.head.getString(0) == "a" && vc.head.getLong(1) == 3L)
    val vn = Tbl(df).valueCounts("g", normalize = true).df.collect()
    assert(vn.head.getDouble(1) == 0.5) // 3 of 6
    assert(math.abs(vn.map(_.getDouble(1)).sum - 1.0) < 1e-12)
    val desc = Tbl(df).describe().df
    assert(desc.columns.toSeq == Seq("summary", "x", "y"))
    assert(desc.count() == 8)
    val m = Tbl(df).summarize("m" -> __.g.mode()).df.head().getString(0)
    assert(m == "a")
  }

  test("describeApprox: exact regime == order statistics; sketch regime stays bounded") {
    import spark.implicits._
    val data = (1L to 1000L).map(i => (i * 2654435761L % 997).toDouble)
      .toDF("x")
    // exact regime (k > n): quantiles are the ceil(q*n)-th order statistics
    val r = Tbl(data).describeApprox(2048, Seq(Sel.Name("x"))).df.collect()(0)
    val sorted = data.orderBy("x").collect().map(_.getDouble(0))
    assert(r.getLong(r.fieldIndex("count")) === 1000L)
    assert(r.getDouble(r.fieldIndex("min")) === sorted.head)
    assert(r.getDouble(r.fieldIndex("max")) === sorted.last)
    assert(r.getDouble(r.fieldIndex("q50")) === sorted(499)) // ceil(.5*1000)=500
    assert(r.getDouble(r.fieldIndex("q25")) === sorted(249))
    // compaction regime (k << n): estimates drawn from the data, ordered,
    // inside [min, max]
    val a = Tbl(data).describeApprox(32, Seq(Sel.Name("x"))).df.collect()(0)
    val (q25, q50, q75) = (a.getDouble(a.fieldIndex("q25")),
      a.getDouble(a.fieldIndex("q50")), a.getDouble(a.fieldIndex("q75")))
    assert(q25 <= q50 && q50 <= q75)
    assert(q25 >= sorted.head && q75 <= sorted.last)
    // no numeric columns to auto-select -> the require fires eagerly
    assertThrows[IllegalArgumentException](
      Tbl(Seq("a").toDF("s")).describeApprox())
  }

  test("window functions: row_number, rank, lead/lag, cumsum") {
    val out = Tbl(df).groupBy("g").arrange(col("x"))
      .mutate(
        "rn" -> Vec.rowNumber(),
        "cs" -> Vec.cumsum(col("x")),
        "lg" -> Vec.lag(col("x")),
        "mr" -> Vec.minRank(col("x"))
      ).df
    df.createOrReplaceTempView("t5")
    val expect = spark.sql(
      """SELECT g, x, y,
        | row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
        | sum(x) OVER (PARTITION BY g ORDER BY x ROWS UNBOUNDED PRECEDING) AS cs,
        | lag(x) OVER (PARTITION BY g ORDER BY x) AS lg,
        | CASE WHEN x IS NOT NULL THEN
        |   rank() OVER (PARTITION BY g, x IS NULL ORDER BY x) END AS mr
        |FROM t5""".stripMargin)
    assertSameRows(out, expect)
  }

  test("joins: null-safe keys, suffixing, full-join coalesce") {
    import spark.implicits._
    val l = Tbl(Seq(("a", 1), ("b", 2), (null.asInstanceOf[String], 3)).toDF("k", "v"))
    val r = Tbl(Seq(("a", 10), ("c", 30), (null.asInstanceOf[String], 99)).toDF("k", "v"))
    val inner = l.innerJoin(r, Seq("k")).df
    // NA matches NA like pandas merge (siuba/dply/verbs.py:1639-1647)
    assert(inner.count() == 2)
    assert(inner.columns.toSeq == Seq("k", "v_x", "v_y"))
    val full = l.fullJoin(r, Seq("k")).df
    assert(full.count() == 4)
    assert(full.where(col("k") === "c").count() == 1) // coalesced key
    assert(l.semiJoin(r, Seq("k")).df.count() == 2)
    assert(l.antiJoin(r, Seq("k")).df.count() == 1)
  }

  test("topN keeps ties") {
    import spark.implicits._
    val d = Tbl(Seq(("a", 1), ("a", 2), ("a", 2), ("b", 5)).toDF("g", "v")).groupBy("g")
    val out = d.topN(1, col("v")).df
    assert(out.where(col("g") === "a").count() == 2)
  }

  test("ifElse treats NULL condition as false; caseWhen first-match") {
    import spark.implicits._
    val d = Seq(Some(true), Some(false), None).toDF("c")
    val out = d.select(Fns.ifElse(col("c"), lit(1), lit(0)).as("r")).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(1, 0, 0))
    val cw = df.select(Fns.caseWhen(Seq(
      (col("x") < 3) -> lit("lo"), (col("x") < 5) -> lit("mid")), lit("hi")).as("b"))
    assert(cw.collect().map(_.getString(0)).toSeq == Seq("lo", "lo", "mid", "mid", "hi", "hi"))
  }

  test("join-key inference uses shared column names; errors when none") {
    import spark.implicits._
    val l = Tbl(Seq(("a", 1, 10.0), ("b", 2, 20.0)).toDF("k", "g2", "v"))
    val r = Tbl(Seq(("a", 1, "u"), ("a", 2, "w")).toDF("k", "g2", "tag"))
    assert(l.sharedKeys(r, "test") == Seq("k", "g2"))
    val joined = l.innerJoin(r)
    assert(joined.df.columns.toSeq == Seq("k", "g2", "v", "tag"))
    assert(joined.df.count() == 1) // only (a,1) matches on both keys
    val noShared = Tbl(Seq((1, 2)).toDF("p", "q"))
    intercept[GraftError] { l.innerJoin(noShared) }
  }

  test("distinct and count with computed keys") {
    import spark.implicits._
    val d = Tbl(Seq(("a", 1), ("a", 2), ("b", 5), ("b", 6)).toDF("g", "x"))
    val dist = d.distinct("g2" -> upper(col("g")), "even" -> (col("x") % 2 === 0)).df
    assert(dist.columns.toSeq == Seq("g2", "even"))
    assert(dist.count() == 4) // (A,f) (A,t) (B,f) (B,t)
    val cnt = d.count("even" -> (col("x") % 2 === 0)).df
    assert(cnt.columns.toSeq == Seq("even", "n"))
    assert(cnt.collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      == Map(true -> 2L, false -> 2L))
  }

  test("semi/anti join against a filtered view of the SAME table (self-lineage)") {
    import spark.implicits._
    val d = Tbl(Seq(("a", 1), ("b", 5), ("c", 9)).toDF("k", "v"))
    val big = d.filter(col("v") > 4) // derived from the same plan
    assert(d.semiJoin(big, Seq("k")).df.collect().map(_.getString(0)).sorted.toSeq
      == Seq("b", "c"))
    assert(d.antiJoin(big, Seq("k")).df.collect().map(_.getString(0)).toSeq
      == Seq("a"))
  }
}
