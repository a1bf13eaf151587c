package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Sort-insensitive row comparison (the reference compares SQL backends
    * sort-insensitively, siuba/tests/helpers.py:217-246).
    */
  def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString(""))

  def assertSameRows(a: DataFrame, b: DataFrame, clue: String = ""): Unit = {
    assert(a.columns.toSeq.sorted == b.columns.toSeq.sorted,
      s"schema mismatch: ${a.columns.toSeq} vs ${b.columns.toSeq} $clue")
    val (ra, rb) = (sortedRows(a.select(a.columns.sorted.map(org.apache.spark.sql.functions.col): _*)),
                    sortedRows(b.select(b.columns.sorted.map(org.apache.spark.sql.functions.col): _*)))
    assert(ra == rb, s"rows mismatch ($clue):\n  left=${ra.take(5)}\n right=${rb.take(5)}")
  }
}
