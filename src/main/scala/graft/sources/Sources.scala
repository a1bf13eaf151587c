package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tbl

/** Sources / sinks (SURVEY §2.1). The reference reads CSV + SQL tables
  * (`tbl(src, ...)`, siuba/dply/verbs.py:2550-2641); Spark's DataFrameReader
  * provides those plus parquet/JSON/ORC natively. Schema comes from parquet
  * footers / catalog / explicit DDL — pass one for CSV/JSON at scale (schema
  * inference is a full extra pass over the data).
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): Tbl =
    Tbl(spark.read.parquet(path))

  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None,
              header: Boolean = true, sep: String = ","): Tbl = {
    val r = spark.read.option("header", header).option("sep", sep)
    Tbl(schema.map(r.schema).getOrElse(r.option("inferSchema", true)).csv(path))
  }

  def readJson(spark: SparkSession, path: String,
               schema: Option[StructType] = None): Tbl = {
    val r = spark.read
    Tbl(schema.map(r.schema).getOrElse(r).json(path))
  }

  def readOrc(spark: SparkSession, path: String): Tbl =
    Tbl(spark.read.orc(path))

  /** Line-oriented text: one `value` row per line — the raw-corpus entry
    * point for the text pipeline (chunk/quality/dedup operate on it
    * directly).
    */
  def readText(spark: SparkSession, path: String): Tbl =
    Tbl(spark.read.text(path))

  /** JDBC source — the analogue of `tbl(engine, "name")`. `partitionOn`
    * (column, lower, upper, numPartitions) parallelizes the scan; without it
    * the whole table arrives through one connection.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties(),
               partitionOn: Option[(String, Long, Long, Int)] = None): Tbl =
    Tbl(partitionOn match {
      case Some((c, lo, hi, n)) => spark.read.jdbc(url, table, c, lo, hi, n, props)
      case None                 => spark.read.jdbc(url, table, props)
    })

  /** Catalog table (`spark.table`). */
  def table(spark: SparkSession, name: String): Tbl = Tbl(spark.table(name))

  // ---- sinks --------------------------------------------------------------

  def writeParquet(t: Tbl, path: String, mode: String = "overwrite"): Unit =
    t.df.write.mode(mode).parquet(path)

  def writeCsv(t: Tbl, path: String, mode: String = "overwrite"): Unit =
    t.df.write.mode(mode).option("header", true).csv(path)

  def writeJson(t: Tbl, path: String, mode: String = "overwrite"): Unit =
    t.df.write.mode(mode).json(path)

  def writeOrc(t: Tbl, path: String, mode: String = "overwrite"): Unit =
    t.df.write.mode(mode).orc(path)

  // ---- semi-structured columns -------------------------------------------

  /** Extract a JSON path from a string column (events.props-style payloads).
    * Codegen'd `get_json_object`; for repeated multi-field extraction prefer
    * `from_json` with an explicit schema (one parse per row, not per field).
    */
  def jsonGet(c: Column, path: String): Column = get_json_object(c, path)

  def jsonStruct(c: Column, ddl: String): Column =
    from_json(c, StructType.fromDDL(ddl))
}
