package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [queryName...] — trailing names restrict the dump
    // (local iteration aid; the driver passes exactly two args)
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only).toMap
    run(spark, sfDir, outDir, selected, SparkEntry.oracleSql)
    spark.stop()
  }

  /** The dump loop, factored from main so the failure-reporting contract is
    * unit-testable with a deliberately-broken query map.
    */
  private[graft] def run(spark: SparkSession, sfDir: String, outDir: String,
                         selected: Map[String, (SparkSession, String) => DataFrame],
                         oracle: Map[String, String]): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    // A throwing query must NOT silently vanish from the record (round 8:
    // nine schema-broken queries produced no parquet, and an absent row
    // reads as "never declared" in the driver's correctness JSON). Every
    // failure lands in _errors.json next to oracle_sql.json (exit stays 0:
    // the driver must still collect the queries that DID dump).
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.take(1).mkString
        errors += name -> msg
        System.err.println(s"[verify] $name failed: $msg")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracle
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    // dump-count parity guard: dirs written + errors recorded must account
    // for every declared query — any other discrepancy is a harness bug
    val dumped = selected.keys.count(n => Files.isDirectory(Paths.get(s"$outDir/$n")))
    println(s"[verify] ${selected.size} queries: $dumped dumped, ${errors.size} failed")
    if (dumped + errors.size != selected.size)
      System.err.println(s"[verify] HARNESS BUG: ${selected.size} selected != " +
        s"$dumped dumped + ${errors.size} failed")
    errors.toMap
  }
}
