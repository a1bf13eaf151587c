package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY §2 appears as a `queries` entry (built with the
  * graft verb API) plus, where SQL-expressible, a DuckDB oracle in
  * `oracleSql`. Column names are aliased identically on both sides; double
  * aggregates are rounded to pin down float summation-order noise.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): Tbl =
    Tbl(s.read.parquet(s"$dir/$name.parquet"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: groupBy + summarize with composite aggs.
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .summarize(
          "sum_qty"    -> round(sum(col("l_quantity")), 2),
          "sum_price"  -> round(sum(col("l_extendedprice")), 2),
          "sum_disc_price" -> round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2),
          "avg_qty"    -> round(avg(col("l_quantity")), 4),
          "avg_price"  -> round(avg(col("l_extendedprice")), 4),
          "n"          -> functions.Fns.Agg.n()
        )
        .arrange(col("l_returnflag"), col("l_linestatus"))
        .df)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
