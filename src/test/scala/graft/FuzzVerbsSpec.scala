package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.reshape.Reshape

/** Seeded randomized differential for the verb-translation layer: each
  * seed draws a pipeline (grouping x agg-broadcast mutate x plain-or-window
  * filter x summarize-or-window tail) and checks the Tbl verbs against a
  * hand-assembled Spark SQL string with explicit OVER clauses — broad-front
  * coverage of the ColumnNode rewriter (windowize, filter hoist, arrange
  * state) beyond the hand-picked CoreVerbsSpec cases. Deterministic: the
  * seed list is fixed, failures print the seed's recipe.
  */
class FuzzVerbsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.assertSameRows

  private lazy val li = {
    val d = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
              "l_quantity", "l_extendedprice", "l_discount")
    d.createOrReplaceTempView("fuzz_li")
    d
  }

  private val groupChoices = Seq(
    Nil, Seq("l_returnflag"), Seq("l_returnflag", "l_linestatus"))
  private val valueChoices = Seq("l_quantity", "l_extendedprice", "l_discount")
  private val aggChoices: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] =
    Seq("avg" -> (c => avg(c)), "sum" -> (c => sum(c)),
        "min" -> (c => min(c)), "max" -> (c => max(c)),
        "count" -> (c => count(c)))

  private lazy val ord = {
    val d = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    d.createOrReplaceTempView("fuzz_ord")
    d
  }
  private lazy val cust = {
    val d = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    d.createOrReplaceTempView("fuzz_cust")
    d
  }

  // join family: each seed draws a join type plus a pre-join filter on each
  // side, checked against the SQL join with the same predicates
  for (seed <- 101 to 115) test(s"seeded join #$seed matches its SQL translation") {
    val rnd = new scala.util.Random(seed)
    val how = Seq("inner", "left", "semi", "anti")(rnd.nextInt(4))
    val custCut = 500 + rnd.nextInt(1000)
    val prio = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")(rnd.nextInt(3))
    val l = Tbl(ord).filter(col("o_orderpriority") === prio)
    val r = Tbl(cust).filter(col("c_acctbal") > custCut)
    val got = (how match {
      case "inner" => l.join(r, Seq("o_custkey" -> "c_custkey"), "inner")
      case "left"  => l.join(r, Seq("o_custkey" -> "c_custkey"), "left")
      case "semi"  => l.copy(df = l.df.join(r.df,
        l.df("o_custkey") === r.df("c_custkey"), "left_semi"))
      case "anti"  => l.copy(df = l.df.join(r.df,
        l.df("o_custkey") === r.df("c_custkey"), "left_anti"))
    }).df
    val base = s"""(SELECT * FROM fuzz_ord WHERE o_orderpriority = '$prio') l"""
    val rite = s"""(SELECT * FROM fuzz_cust WHERE c_acctbal > $custCut) r"""
    val sql = how match {
      case "inner" | "left" =>
        s"""SELECT l.*, r.c_mktsegment, r.c_acctbal FROM $base
           |${if (how == "inner") "JOIN" else "LEFT JOIN"} $rite
           |ON l.o_custkey = r.c_custkey""".stripMargin
      case "semi" =>
        s"SELECT l.* FROM $base WHERE o_custkey IN (SELECT c_custkey FROM $rite)"
      case "anti" =>
        s"SELECT l.* FROM $base WHERE o_custkey NOT IN (SELECT c_custkey FROM $rite)"
    }
    val expect = spark.sql(sql).drop("c_custkey")
    assertSameRows(got.drop("c_custkey"), expect, clue = s"how=$how prio=$prio cut=$custCut")
  }

  for (seed <- 1 to 40) test(s"seeded pipeline #$seed matches its SQL translation") {
    val rnd = new scala.util.Random(seed)
    val groups = groupChoices(rnd.nextInt(groupChoices.size))
    val v = valueChoices(rnd.nextInt(valueChoices.size))
    val (aggName, aggFn) = aggChoices(rnd.nextInt(aggChoices.size))
    val part = if (groups.isEmpty) "" else s" PARTITION BY ${groups.mkString(", ")}"
    val over = s"OVER ($part)"
    val recipe = s"groups=$groups v=$v agg=$aggName"

    // stage 1: agg-broadcast mutate  m = v - agg(v) over groups
    val t1 = {
      val t0 = if (groups.isEmpty) Tbl(li) else Tbl(li).groupBy(groups: _*)
      t0.mutate("m" -> (col(v) - aggFn(col(v))))
    }
    val sql1 = s"SELECT *, $v - $aggName($v) $over AS m FROM fuzz_li"
    assertSameRows(t1.df, spark.sql(sql1))

    // stage 2: half the seeds filter on a windowed aggregate (hoist path),
    // the rest on the computed column
    val windowedFilter = rnd.nextBoolean()
    val (t2, sql2) =
      if (windowedFilter) (
        t1.filter(col(v) >= aggFn(col(v))),
        s"SELECT * FROM (SELECT *, $v >= $aggName($v) $over AS __c FROM ($sql1)) WHERE __c"
      ) else (
        t1.filter(col("m") > 0),
        s"SELECT * FROM ($sql1) WHERE m > 0")
    val sqlDf2 = spark.sql(sql2).drop("__c")
    assertSameRows(t2.df, sqlDf2, clue = recipe)

    // stage 3: summarize tail or arrange+cumsum tail
    if (rnd.nextBoolean()) {
      val t3 = t2.summarize("s" -> round(sum(col("m")), 4),
                            "n" -> count(lit(1)))
      val keys = if (groups.isEmpty) "" else groups.mkString(", ") + ","
      val grp = if (groups.isEmpty) "" else s"GROUP BY ${groups.mkString(", ")}"
      val sql3 = s"SELECT $keys round(sum(m), 4) AS s, count(1) AS n FROM ($sql2) $grp"
      assertSameRows(t3.df, spark.sql(sql3).drop("__c"), clue = recipe)
    } else {
      val t3 = t2.arrange(col("l_orderkey"), col("l_linenumber"))
        .mutate("cs" -> graft.functions.Vec.cumsum(round(col("m"), 4)))
      val sql3 = s"""SELECT *, sum(round(m, 4)) OVER ($part ORDER BY
        |l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND
        |CURRENT ROW) AS cs FROM ($sql2)""".stripMargin
      assertSameRows(t3.df, spark.sql(sql3).drop("__c"), clue = recipe)
    }
  }

  // reshape family: each seed builds a randomized wide schema, melts it with
  // one of three reshape paths and widens it back — the round-trip must be
  // the identity. Covers gather/spread, pivot_longer/pivot_wider, and the
  // `.value` multi-part spec (names_sep splitting, multi-values_from
  // naming/ordering) across random shapes rather than one fixed fixture.
  for (seed <- 201 to 212) test(s"seeded reshape round-trip #$seed is the identity") {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val nRows = 8 + rnd.nextInt(40)
    val mode = seed % 3 // 0: gather/spread, 1: longer/wider, 2: .value multi-part

    if (mode == 2) {
      // wide cols "{stem}_{grp}": stems stay wide through .value, grps melt
      val stems = Seq("x", "y", "z").take(2 + rnd.nextInt(2))
      val grps = Seq("g1", "g2", "g3", "g4").take(2 + rnd.nextInt(3))
      val colNames = for (s <- stems; g <- grps) yield s"${s}_$g"
      val rows = (1 to nRows).map { id =>
        id.toLong +: colNames.zipWithIndex.map { case (_, j) =>
          ((id * 31 + j * 7) % 97) / 4.0 }
      }
      val wide = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row.fromSeq(r))),
        org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType) +:
          colNames.map(c => org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.DoubleType))))
      val long = Reshape.pivotLonger(Tbl(wide),
        sel = colNames.map(n => Sel.Name(n): Sel),
        namesTo = Seq(".value", "grp"), namesSep = Some("_"))
      assert(long.cols == Seq("id", "grp") ++ stems,
        s"long schema ${long.cols} (stems=$stems grps=$grps)")
      val back = Reshape.pivotWider(long, namesFrom = Seq("grp"),
        valuesFrom = stems)
      assertSameRows(back.df, wide, clue = s"seed=$seed stems=$stems grps=$grps")
      // and names_vary=slowest is a pure column reorder of the same data
      val slow = Reshape.pivotWider(long, namesFrom = Seq("grp"),
        valuesFrom = stems, namesVary = "slowest")
      assert(slow.df.columns.sorted.toSeq == back.df.columns.sorted.toSeq)
      assertSameRows(slow.df, wide, clue = s"seed=$seed slowest")
    } else {
      val pool = Seq("va", "vb", "vc", "vd", "ve")
      val vals = rnd.shuffle(pool).take(2 + rnd.nextInt(3)).sorted
      val rows = (1 to nRows).map { id =>
        (id.toLong, vals.zipWithIndex.map { case (_, j) =>
          ((id * 13 + j * 11) % 89) / 8.0 })
      }
      val wide = rows.map { case (id, vs) => (id, vs(0), vs.lift(1).getOrElse(0.0),
          vs.lift(2).getOrElse(0.0), vs.lift(3).getOrElse(0.0)) }
        .toDF("id", "c0", "c1", "c2", "c3")
        .select(col("id") +: vals.zipWithIndex.map { case (v, j) =>
          col(s"c$j").as(v) }: _*)
      if (mode == 0) {
        val long = Reshape.gather(Tbl(wide), "key", "val",
          vals.map(n => Sel.Name(n): Sel))
        val back = Reshape.spread(Tbl(long.df), "key", "val")
        assertSameRows(back.df, wide, clue = s"seed=$seed vals=$vals")
      } else {
        val long = Reshape.pivotLonger(Tbl(wide),
          sel = vals.map(n => Sel.Name(n): Sel), namesTo = Seq("k"),
          valuesTo = "v")
        val back = Reshape.pivotWider(long, namesFrom = Seq("k"),
          valuesFrom = Seq("v"))
        assertSameRows(back.df, wide, clue = s"seed=$seed vals=$vals")
      }
    }
  }
}
