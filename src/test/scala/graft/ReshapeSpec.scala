package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.reshape.Reshape
import graft.cats.Forcats

class ReshapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.assertSameRows

  test("gather then spread round-trips") {
    import spark.implicits._
    val wide = Seq(("r1", 1.0, 2.0), ("r2", 3.0, 4.0)).toDF("id", "a", "b")
    val long = Reshape.gather(Tbl(wide), "key", "val",
      Seq(Sel.Name("a"), Sel.Name("b"))).df
    assert(long.count() == 4)
    assert(long.columns.toSeq == Seq("id", "key", "val"))
    val back = Reshape.spread(Tbl(long), "key", "val").df
    assertSameRows(back, wide)
  }

  test("pivot_longer with names_sep and .value") {
    import spark.implicits._
    val df = Seq((1, 10.0, 100.0, 11.0, 110.0))
      .toDF("id", "x_a", "y_a", "x_b", "y_b")
    // names_to = (".value", "grp"): x/y stay wide, a/b key rows
    val out = Reshape.pivotLonger(Tbl(df),
      Seq(Sel.startsWith("x"), Sel.startsWith("y")),
      namesTo = Seq(".value", "grp"), namesSep = Some("_")).df
    assert(out.columns.toSeq == Seq("id", "grp", "x", "y"))
    val a = out.where(col("grp") === "a").head()
    assert(a.getDouble(2) == 10.0 && a.getDouble(3) == 100.0)
  }

  test("pivot_wider with values_fn and fill") {
    import spark.implicits._
    val long = Seq(("r1", "a", 1.0), ("r1", "a", 3.0), ("r2", "b", 4.0))
      .toDF("id", "k", "v")
    val out = Reshape.pivotWider(Tbl(long), Seq("k"), Seq("v"),
      valuesFn = sum(_), valuesFill = Some(0.0)).df
    val r1 = out.where(col("id") === "r1").head()
    assert(r1.getDouble(out.columns.indexOf("a")) == 4.0)
    assert(r1.getDouble(out.columns.indexOf("b")) == 0.0)
  }

  test("pivot_wider id_expand restores missing id combinations") {
    import spark.implicits._
    // ("b", 2) never co-occurs: only with id_expand does that row appear
    val long = Seq(("a", 1, "k1", 10.0), ("a", 2, "k2", 20.0), ("b", 1, "k1", 30.0))
      .toDF("g", "h", "k", "v")
    val plain = Reshape.pivotWider(Tbl(long), Seq("k"), Seq("v")).df
    assert(plain.count() == 3)
    val expanded = Reshape.pivotWider(Tbl(long), Seq("k"), Seq("v"),
      valuesFill = Some(0.0), idExpand = true).df
    assert(expanded.count() == 4)
    val b2 = expanded.where(col("g") === "b" && col("h") === 2).head()
    assert(b2.getDouble(expanded.columns.indexOf("k1")) == 0.0)
    assert(b2.getDouble(expanded.columns.indexOf("k2")) == 0.0)
  }

  test("pivot_wider id_expand matches NULL id values null-safely") {
    import spark.implicits._
    val long = Seq((Some("a"), "k1", 1.0), (None, "k1", 5.0), (None, "k2", 6.0))
      .toDF("g", "k", "v")
    val out = Reshape.pivotWider(Tbl(long), Seq("k"), Seq("v"),
      valuesFill = Some(0.0), idExpand = true).df
    // NULL id row matches itself: 2 rows total, not 3 (no orphan NULL row)
    assert(out.count() == 2)
    val nullRow = out.where(col("g").isNull).head()
    assert(nullRow.getDouble(out.columns.indexOf("k1")) == 5.0)
    assert(nullRow.getDouble(out.columns.indexOf("k2")) == 6.0)
  }

  test("pivot_wider explicit id_cols drops or summarizes unused columns") {
    import spark.implicits._
    val long = Seq(("r1", "a", 1.0, 5.0), ("r1", "b", 2.0, 7.0), ("r2", "a", 3.0, 9.0))
      .toDF("id", "k", "v", "extra")
    // unused column dropped by default when id_cols is explicit
    val dropped = Reshape.pivotWider(Tbl(long), Seq("k"), Seq("v"),
      idColsOpt = Seq("id")).df
    assert(dropped.columns.toSet == Set("id", "a", "b"))
    // unused_fn summarizes it per id row (tidyr unused_fn)
    val kept = Reshape.pivotWider(Tbl(long), Seq("k"), Seq("v"),
      idColsOpt = Seq("id"), unusedFn = Map("extra" -> (sum(_)))).df
    assert(kept.columns.toSet == Set("id", "a", "b", "extra"))
    assert(kept.where(col("id") === "r1").head()
      .getDouble(kept.columns.indexOf("extra")) == 12.0)
  }

  test("pivot_wider names_expand crosses names_from values into absent columns") {
    import spark.implicits._
    // (k1="p", k2="y") never occurs; names_expand still emits column p_y
    val long = Seq(("r1", "p", "x", 1.0), ("r1", "q", "y", 2.0), ("r2", "q", "x", 3.0))
      .toDF("id", "k1", "k2", "v")
    val out = Reshape.pivotWider(Tbl(long), Seq("k1", "k2"), Seq("v"),
      valuesFill = Some(0.0), namesExpand = true).df
    assert(out.columns.toSet == Set("id", "p_x", "p_y", "q_x", "q_y"))
    assert(out.where(col("id") === "r1").head()
      .getDouble(out.columns.indexOf("p_y")) == 0.0)
  }

  test("arrange sorts registered factor columns by level order") {
    import spark.implicits._
    val df = Seq(("lo", 1), ("hi", 2), ("mid", 3), ("hi", 4)).toDF("f", "x")
    val fac = Forcats.Factor(Seq("hi", "mid", "lo"))
    val sorted = Tbl(df).withFactor("f", fac).arrange(col("f"), col("x"))
      .df.select("f").collect().map(_.getString(0)).toSeq
    assert(sorted == Seq("hi", "hi", "mid", "lo"))
    val sortedDesc = Tbl(df).withFactor("f", fac).arrange(col("f").desc, col("x"))
      .df.select("f").collect().map(_.getString(0)).toSeq
    assert(sortedDesc == Seq("lo", "mid", "hi", "hi"))
    // desc built the other two ways resolves through the SortOrder node too
    val viaDescFn = Tbl(df).withFactor("f", fac).arrange(desc("f"), col("x"))
      .df.select("f").collect().map(_.getString(0)).toSeq
    assert(viaDescFn == Seq("lo", "mid", "hi", "hi"))
    val viaNulls = Tbl(df).withFactor("f", fac).arrange(col("f").desc_nulls_last, col("x"))
      .df.select("f").collect().map(_.getString(0)).toSeq
    assert(viaNulls == Seq("lo", "mid", "hi", "hi"))
  }

  test("arrange sorts out-of-level factor values last") {
    import spark.implicits._
    val df = Seq(("lo", 1), ("stray", 2), ("hi", 3)).toDF("f", "x")
    val fac = Forcats.Factor(Seq("hi", "mid", "lo"))
    val sorted = Tbl(df).withFactor("f", fac).arrange(col("f"))
      .df.select("f").collect().map(_.getString(0)).toSeq
    assert(sorted == Seq("hi", "lo", "stray"))
  }

  test("factor registration survives select/rename/filter/distinct chains") {
    import spark.implicits._
    val df = Seq(("lo", 1), ("hi", 2), ("mid", 3)).toDF("f", "x")
    val fac = Forcats.Factor(Seq("hi", "mid", "lo"))
    val out = Tbl(df).withFactor("f", fac)
      .mutate("y" -> (col("x") * 2))
      .rename("fct" -> "f")         // factor follows the rename
      .filter(col("x") <= 3)
      .distinct(keepAll = true)
      .arrange(col("fct"))
      .df.select("fct").collect().map(_.getString(0)).toSeq
    assert(out == Seq("hi", "mid", "lo"))
  }

  test("nest / unnest round-trip") {
    import spark.implicits._
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0)).toDF("g", "x", "y")
    val nested = Reshape.nest(Tbl(df), Seq(Sel.Name("x"), Sel.Name("y"))).df
    assert(nested.count() == 2)
    val back = Reshape.unnest(Tbl(nested), "data").df
    assertSameRows(back, df)
  }

  test("separate / unite / extract") {
    import spark.implicits._
    val df = Seq(("a-1", 1), ("b-22", 2)).toDF("s", "n")
    val sep = Reshape.separate(Tbl(df), "s", Seq("ch", "num"), sep = "-").df
    assert(sep.columns.toSeq == Seq("n", "ch", "num"))
    assert(sep.where(col("ch") === "b").head().getString(2) == "22")
    val un = Reshape.unite(Tbl(sep), "s2", Seq(Sel.Name("ch"), Sel.Name("num")), sep = "-").df
    assert(un.select("s2").collect().map(_.getString(0)).sorted.toSeq == Seq("a-1", "b-22"))
    val ex = Reshape.extract(Tbl(df), "s", Seq("letter"), regex = "([a-z]+)-\\d+").df
    assert(ex.select("letter").collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
  }

  test("separate extra-piece diagnostic counts truncated rows") {
    import spark.implicits._
    val df = Seq(("a-1", 1), ("b-2-3", 2), ("c-4-5-6", 3)).toDF("s", "n")
    assert(Reshape.separateExtraCount(Tbl(df), "s", Seq("x", "y"), sep = "-") == 2)
    // extra="merge" keeps the tail intact instead of truncating
    val merged = Reshape.separate(Tbl(df), "s", Seq("x", "y"), sep = "-",
      extra = "merge").df
    assert(merged.where(col("n") === 3).head().getString(2) == "4-5-6")
  }

  test("separate fill=left right-aligns short splits; extra=drop truncates") {
    import spark.implicits._
    val df = Seq(("a-1-9", 1), ("b-2", 2), ("c", 3)).toDF("s", "n")
    val left = Reshape.separate(Tbl(df), "s", Seq("x", "y", "z"), sep = "-",
      fill = "left").df
    val r2 = left.where(col("n") === 2).head() // b-2 → (NULL, b, 2)
    assert(r2.isNullAt(1) && r2.getString(2) == "b" && r2.getString(3) == "2")
    val r3 = left.where(col("n") === 3).head() // c → (NULL, NULL, c)
    assert(r3.isNullAt(1) && r3.isNullAt(2) && r3.getString(3) == "c")
    val dropped = Reshape.separate(Tbl(df), "s", Seq("x", "y"), sep = "-",
      extra = "drop").df
    assert(dropped.where(col("n") === 1).head().getString(2) == "1") // 9 dropped
    intercept[GraftError] {
      Reshape.separate(Tbl(df), "s", Seq("x"), sep = "-", extra = "nope")
    }
  }

  test("separate convert infers long / double / string per column") {
    import spark.implicits._
    val df = Seq(("a-1-1.5", 1), ("b-22-2e3", 2)).toDF("s", "n")
    val out = Reshape.separate(Tbl(df), "s", Seq("ch", "i", "d"), sep = "-",
      convert = true).df
    assert(out.schema("ch").dataType == org.apache.spark.sql.types.StringType)
    assert(out.schema("i").dataType == org.apache.spark.sql.types.LongType)
    assert(out.schema("d").dataType == org.apache.spark.sql.types.DoubleType)
    assert(out.where(col("ch") === "b").head().getDouble(3) == 2000.0)
  }

  test("expand / complete fill holes") {
    import spark.implicits._
    val df = Seq(("a", 1, 1.0), ("b", 2, 2.0)).toDF("g", "k", "v")
    val grid = Reshape.expand(Tbl(df), Seq("g", "k")).df
    assert(grid.count() == 4)
    val comp = Reshape.complete(Tbl(df), Seq("g", "k"), fill = Map("v" -> 0.0)).df
    assert(comp.count() == 4)
    assert(comp.agg(sum("v")).head().getDouble(0) == 3.0)
  }

  test("forcats: recode, collapse, lump, reorder") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("f")
    val rec = df.select(Forcats.fctRecode(col("f"), Map("x" -> Seq("a", "b"))).as("f"))
    assert(rec.where(col("f") === "x").count() == 5)
    val col1 = df.select(Forcats.fctCollapse(col("f"),
      Map("ab" -> Seq("a", "b")), otherLevel = Some("oth")).as("f"))
    assert(col1.where(col("f") === "oth").count() == 1)
    val lumped = Forcats.fctLump(df, "f", 1)
    assert(lumped.where(col("f") === "Other").count() == 3)
    val fr = Forcats.fctInfreq(df, col("f"))
    assert(fr.levels == Seq("a", "b", "c"))
  }

  test("pivot_wider multi-values_from: tidyr names and names_vary orders") {
    import spark.implicits._
    // the reference's documented example (pivot_wide.py:185-200)
    val many = Seq((1, "one", 1, 6), (1, "two", 2, 7),
                   (2, "one", 3, 8), (2, "two", 4, 9))
      .toDF("id", "var", "x", "y")
    val fast = Reshape.pivotWider(Tbl(many), Seq("var"), Seq("x", "y")).df
    assert(fast.columns.toSeq == Seq("id", "x_one", "x_two", "y_one", "y_two"))
    val r = fast.orderBy("id").collect()
    assert(r.map(x => (x.getInt(1), x.getInt(2), x.getInt(3), x.getInt(4))).toSeq
      == Seq((1, 2, 6, 7), (3, 4, 8, 9)))
    val slow = Reshape.pivotWider(Tbl(many), Seq("var"), Seq("x", "y"),
      namesVary = "slowest").df
    assert(slow.columns.toSeq == Seq("id", "x_one", "y_one", "x_two", "y_two"))
    // custom names_sep joins value and name
    val dotted = Reshape.pivotWider(Tbl(many), Seq("var"), Seq("x", "y"),
      namesSep = ".").df
    assert(dotted.columns.toSeq == Seq("id", "x.one", "x.two", "y.one", "y.two"))
    intercept[IllegalArgumentException] {
      Reshape.pivotWider(Tbl(many), Seq("var"), Seq("x", "y"), namesVary = "middling")
    }
  }

  test("pivot_wider names_sort: pinned order kept by default, sorted on request") {
    import spark.implicits._
    val long = Seq((1, "b", 1.0), (1, "a", 2.0)).toDF("id", "k", "v")
    val unsorted = Reshape.pivotWider(Tbl(long), Seq("k"), Seq("v"),
      namesVals = Seq("b", "a")).df
    assert(unsorted.columns.toSeq == Seq("id", "b", "a"))
    val sorted = Reshape.pivotWider(Tbl(long), Seq("k"), Seq("v"),
      namesVals = Seq("b", "a"), namesSort = true).df
    assert(sorted.columns.toSeq == Seq("id", "a", "b"))
  }

  test("pivot_wider names_glue templates output columns") {
    import spark.implicits._
    val long = Seq(("r1", "a", 1.0, 10.0), ("r2", "b", 2.0, 20.0))
      .toDF("id", "k", "x", "y")
    val out = Reshape.pivotWider(Tbl(long), Seq("k"), Seq("x", "y"),
      namesGlue = Some("{.value}_for_{name}")).df
    assert(out.columns.toSet ==
      Set("id", "x_for_a", "y_for_a", "x_for_b", "y_for_b"))
  }

  test("complete explicitFill=false fills only join-created NAs") {
    import spark.implicits._
    val df = Seq(("a", 1, Some(1.0)), ("b", 2, None)).toDF("g", "k", "v")
    val out = Reshape.complete(Tbl(df), Seq("g", "k"),
      fill = Map("v" -> 0.0), explicitFill = false).df
    // pre-existing NA at (b,2) stays NULL; grid holes (a,2),(b,1) fill 0.0
    assert(out.where(col("g") === "b" && col("k") === 2).head().isNullAt(2))
    assert(out.where(col("g") === "a" && col("k") === 2).head().getDouble(2) == 0.0)
    val expl = Reshape.complete(Tbl(df), Seq("g", "k"),
      fill = Map("v" -> 0.0), explicitFill = true).df
    assert(expl.where(col("g") === "b" && col("k") === 2).head().getDouble(2) == 0.0)
  }

  test("fill targets only pivot-created holes, preserving id-column NULLs") {
    import spark.implicits._
    val long = Seq((Some("r1"), "a", 1.0), (None, "b", 2.0)).toDF("id", "k", "v")
    val out = Reshape.spread(Tbl(long), "k", "v", fill = Some(0.0)).df
    // id NULL survives; the (r1, b) and (None, a) holes fill with 0.0
    assert(out.where(col("id").isNull).count() == 1)
    assert(out.where(col("id") === "r1").head()
      .getDouble(out.columns.indexOf("b")) == 0.0)
    // float and boolean fills hit typed branches (previously crashed/no-op)
    val f = Reshape.spread(Tbl(long), "k", "v", fill = Some(0.5f)).df
    assert(f.where(col("id") === "r1").head()
      .getDouble(f.columns.indexOf("b")) == 0.5)
  }

  test("pivot_longer names_repair: check_unique raises on collision, unique suffixes") {
    import spark.implicits._
    // names_to = "key" collides with the id column "key"
    val df = Seq(("k1", 1.0, 2.0)).toDF("key", "a", "b")
    intercept[GraftError] {
      Reshape.pivotLonger(Tbl(df), Seq(Sel.Name("a"), Sel.Name("b")),
        namesTo = Seq("key"))
    }
    val out = Reshape.pivotLonger(Tbl(df), Seq(Sel.Name("a"), Sel.Name("b")),
      namesTo = Seq("key"), namesRepair = "unique").df
    assert(out.columns.toSeq == Seq("key", "key_1", "value"))
    assert(out.select("key_1").collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
  }

  test("pivot_longer keeps string values intact; mixed numerics widen; incompatible raises") {
    import spark.implicits._
    val strs = Seq((1, "x", "y"), (2, "p", "q")).toDF("id", "a", "b")
    val out = Reshape.pivotLonger(Tbl(strs), Seq(Sel.Name("a"), Sel.Name("b")),
      namesTo = Seq("key")).df
    assert(out.schema("value").dataType == org.apache.spark.sql.types.StringType)
    assert(out.where(col("key") === "a" && col("id") === 1).head().getString(2) == "x")
    // int + double widen to double
    val mixed = Seq((1, 2, 3.5)).toDF("id", "i", "d")
    val wide = Reshape.pivotLonger(Tbl(mixed), Seq(Sel.Name("i"), Sel.Name("d")),
      namesTo = Seq("key")).df
    assert(wide.schema("value").dataType == org.apache.spark.sql.types.DoubleType)
    // int + long widen to long (not double — 2^53+ would lose bits)
    val ints = Seq((1, 2, 9007199254740993L)).toDF("id", "i", "l")
    val widel = Reshape.pivotLonger(Tbl(ints), Seq(Sel.Name("i"), Sel.Name("l")),
      namesTo = Seq("key")).df
    assert(widel.schema("value").dataType == org.apache.spark.sql.types.LongType)
    assert(widel.where(col("key") === "l").head().getLong(2) == 9007199254740993L)
    // string + int is incompatible → loud error, not silent NULLs
    val bad = Seq((1, "x", 2)).toDF("id", "s", "i")
    intercept[GraftError] {
      Reshape.pivotLonger(Tbl(bad), Seq(Sel.Name("s"), Sel.Name("i")), namesTo = Seq("key"))
    }
  }

  test("pivot_longer names_transform types a name part; values_transform coerces values") {
    import spark.implicits._
    val df = Seq((1, 10.0, 20.0)).toDF("id", "wk1", "wk2")
    // names_transform: the "wk" part (parsed from column names) becomes int
    val out = Reshape.pivotLonger(Tbl(df), Seq(Sel.startsWith("wk")),
      namesTo = Seq("week"), namesPrefix = Some("wk"),
      namesTransform = Map("week" -> (_.cast("int")))).df
    assert(out.schema("week").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.where(col("week") === 2).head().getDouble(2) == 20.0)
    // values_transform: replaces common-type unification — a mixed
    // string+int stack that would otherwise raise coerces to string
    val mixed = Seq((1, "x", 2)).toDF("id", "s", "i")
    val coerced = Reshape.pivotLonger(Tbl(mixed),
      Seq(Sel.Name("s"), Sel.Name("i")), namesTo = Seq("key"),
      valuesTransform = Map("value" -> (_.cast("string")))).df
    assert(coerced.schema("value").dataType == org.apache.spark.sql.types.StringType)
    assert(coerced.where(col("key") === "i").head().getString(2) == "2")
    // .value branch: per-output-column transform
    val wide = Seq((1, 10, 1.5)).toDF("id", "x_a", "y_a")
    val vt = Reshape.pivotLonger(Tbl(wide),
      Seq(Sel.startsWith("x"), Sel.startsWith("y")),
      namesTo = Seq(".value", "grp"), namesSep = Some("_"),
      valuesTransform = Map("x" -> (_.cast("double")))).df
    assert(vt.schema("x").dataType == org.apache.spark.sql.types.DoubleType)
  }

  test("extract convert infers long / double / string generically") {
    import spark.implicits._
    val df = Seq(("a-1-1.5", 1), ("b-22-2e3", 2)).toDF("s", "n")
    val out = Reshape.extract(Tbl(df), "s", Seq("ch", "i", "d"),
      regex = "(\\w+)-(\\d+)-([\\d.e]+)", convert = true).df
    assert(out.schema("ch").dataType == org.apache.spark.sql.types.StringType)
    assert(out.schema("i").dataType == org.apache.spark.sql.types.LongType)
    assert(out.schema("d").dataType == org.apache.spark.sql.types.DoubleType)
    assert(out.where(col("ch") === "b").head().getDouble(3) == 2000.0)
  }

  test("gather keeps string values; mixed integrals widen to long") {
    import spark.implicits._
    val strs = Seq(("r1", "x", "y")).toDF("id", "a", "b")
    val out = Reshape.gather(Tbl(strs), "key", "val",
      Seq(Sel.Name("a"), Sel.Name("b"))).df
    assert(out.schema("val").dataType == org.apache.spark.sql.types.StringType)
    assert(out.where(col("key") === "a").head().getString(2) == "x")
    val ints = Seq(("r1", 2, 9007199254740993L)).toDF("id", "i", "l")
    val outl = Reshape.gather(Tbl(ints), "key", "val",
      Seq(Sel.Name("i"), Sel.Name("l"))).df
    assert(outl.schema("val").dataType == org.apache.spark.sql.types.LongType)
    assert(outl.where(col("key") === "l").head().getLong(2) == 9007199254740993L)
  }

  test("expand/complete nesting() crosses observed combinations only") {
    import spark.implicits._
    // (g,h) observed combos: (a,1), (b,2) — nesting keeps 2, full cross has 4
    val df = Seq(("a", 1, "k1", 1.0), ("b", 2, "k1", 2.0), ("b", 2, "k2", 3.0))
      .toDF("g", "h", "k", "v")
    val full = Reshape.expand(Tbl(df), Seq("g", "h", "k")).df
    assert(full.count() == 8)
    val nested = Reshape.expandNesting(Tbl(df), Seq(Seq("g", "h"), Seq("k"))).df
    assert(nested.count() == 4)
    assert(nested.columns.toSeq == Seq("g", "h", "k"))
    val comp = Reshape.completeNesting(Tbl(df), Seq(Seq("g", "h"), Seq("k")),
      fill = Map("v" -> 0.0)).df
    assert(comp.count() == 4)
    // the (a,1,k2) hole exists and is filled; (a,2,*) rows never appear
    assert(comp.where(col("g") === "a" && col("k") === "k2").head().getDouble(3) == 0.0)
    assert(comp.where(col("g") === "a" && col("h") === 2).count() == 0)
  }

  test("pivot_longer then pivot_wider round-trips on real data") {
    import TestSpark.assertSameRows
    val wide = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .groupBy("o_orderpriority").pivot("o_orderstatus")
      .sum("o_totalprice")
      .na.fill(0.0)
    val long = Reshape.pivotLonger(Tbl(wide),
      sel = wide.columns.filterNot(_ == "o_orderpriority").toSeq
        .map(n => Sel.Name(n): Sel),
      namesTo = Seq("status"), valuesTo = "total")
    val back = Reshape.pivotWider(long, Seq("status"), Seq("total"))
    assertSameRows(back.df, wide, clue = "pivot round-trip")
  }

  test("separateRows: one row per piece, NULL keeps its row, convert infers types") {
    import spark.implicits._
    val d = Tbl(Seq((1, "1,2,3"), (2, "40"), (3, null)).toDF("id", "v"))
    val out = Reshape.separateRows(d, "v", sep = ",")
      .df.orderBy("id", "v").collect()
      .map(r => (r.getInt(0), Option(r.getString(1))))
    assert(out.toSeq == Seq((1, Some("1")), (1, Some("2")), (1, Some("3")),
      (2, Some("40")), (3, None)))
    val conv = Reshape.separateRows(d, "v", sep = ",", convert = true).df
    assert(conv.schema("v").dataType.typeName == "long")
    assert(conv.where(col("id") === 1).agg(sum("v")).head().getLong(0) == 6L)
  }

  test("fctLump keeps NA rows as NA; fctReorder skips NULL levels") {
    import spark.implicits._
    val d = Seq(Some("a"), Some("a"), Some("b"), None).toDF("f")
    val lumped = Forcats.fctLump(d, "f", 1)
    assert(lumped.where(col("f").isNull).count() == 1)
    assert(lumped.where(col("f") === "Other").count() == 1)
    val withV = Seq((Some("a"), 2.0), (Some("b"), 1.0), (None, 9.0)).toDF("f", "v")
    assert(Forcats.fctReorder(withV, col("f"), col("v")).levels == Seq("b", "a"))
  }

  test("fctReorder defaults to median (reference func=np.median), mean opt-in") {
    import spark.implicits._
    // a: values (1, 1, 10) median 1 / mean 4; b: (2, 2, 2) median 2 / mean 2
    // -> the two defaults produce OPPOSITE level orders
    val d = Seq(("a", 1.0), ("a", 1.0), ("a", 10.0),
                ("b", 2.0), ("b", 2.0), ("b", 2.0)).toDF("f", "v")
    assert(Forcats.fctReorder(d, col("f"), col("v")).levels == Seq("a", "b"))
    assert(Forcats.fctReorder(d, col("f"), col("v"), fn = avg(_)).levels == Seq("b", "a"))
  }

  test("fctLump ties= methods at the keep boundary") {
    import spark.implicits._
    // a x3, b x2, c x2, d x1 with n=2: b and c tie exactly at the boundary
    val d = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
      .toDF("f")
    def kept(ties: String) = Forcats.fctLump(d, "f", 2, ties = ties)
      .where(col("f") =!= "Other").select("f").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kept("first") == Set("a", "b"))      // deterministic name tie-break
    assert(kept("min") == Set("a", "b", "c"))   // boundary ties all kept
    assert(kept("max") == Set("a"))             // tie group doesn't fit whole
    assert(kept("dense") == Set("a", "b", "c")) // 2 distinct frequencies
    intercept[IllegalArgumentException] { kept("average") }
  }

  test("fctLump prop= and w= variants (forcats parity)") {
    import spark.implicits._
    // a x5, b x3, c x2 -> props .5/.3/.2
    val d = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).toDF("f")
    val byProp = Forcats.fctLumpProp(d, "f", prop = 0.3)
      .groupBy("f").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byProp == Map("a" -> 5L, "b" -> 3L, "Other" -> 2L))
    // weighted: c carries the weight despite fewest rows
    val wd = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("c", 50.0)).toDF("f", "w")
    val byW = Forcats.fctLumpWeighted(wd, "f", n = 1, col("w"))
      .groupBy("f").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byW == Map("c" -> 1L, "Other" -> 3L))
  }
}
