package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.assertSameRows

  test("csv and json round-trip through sinks and sources") {
    val orig = Tbl(spark.read.parquet("/root/testdata/sf0.001/nation.parquet"))
    val csvDir = Files.createTempDirectory("graft-csv").toString
    val jsonDir = Files.createTempDirectory("graft-json").toString
    Sources.writeCsv(orig, csvDir)
    Sources.writeJson(orig, jsonDir)
    val csvBack = Sources.readCsv(spark, csvDir, Some(orig.df.schema))
    val jsonBack = Sources.readJson(spark, jsonDir, Some(orig.df.schema))
    assertSameRows(csvBack.df, orig.df)
    assertSameRows(jsonBack.df, orig.df)
  }

  test("orc round-trips; text source reads one row per line") {
    val orig = Tbl(spark.read.parquet("/root/testdata/sf0.001/nation.parquet"))
    val orcDir = Files.createTempDirectory("graft-orc").toString
    Sources.writeOrc(orig, orcDir)
    assertSameRows(Sources.readOrc(spark, orcDir).df, orig.df)
    val txtDir = Files.createTempDirectory("graft-txt").toString
    import spark.implicits._
    Seq("line one", "line two", "line three").toDF("value")
      .write.mode("overwrite").text(txtDir)
    val txt = Sources.readText(spark, txtDir)
    assert(txt.df.columns.toSeq == Seq("value"))
    assert(txt.df.count() == 3)
  }

  test("jsonGet and jsonStruct extract payload fields") {
    import spark.implicits._
    val d = Seq("""{"k": 7, "tag": "a"}""", """{"k": 9, "tag": "b"}""").toDF("props")
    val ks = d.select(Sources.jsonGet(col("props"), "$.k").cast("long").as("k"))
      .collect().map(_.getLong(0)).sorted
    assert(ks.toSeq == Seq(7L, 9L))
    val tags = d.select(Sources.jsonStruct(col("props"), "k LONG, tag STRING").as("s"))
      .select("s.tag").collect().map(_.getString(0)).sorted
    assert(tags.toSeq == Seq("a", "b"))
  }
}
