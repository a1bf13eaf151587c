package graft
object StatProbe extends App {
  import org.apache.spark.sql.functions._
  val spark = TestSpark.spark
  val df = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
  df.groupBy("c_mktsegment").agg(
    skewness(col("c_acctbal")).as("sk"),
    kurtosis(col("c_acctbal")).as("ku"),
    count(lit(1)).as("n")
  ).orderBy("c_mktsegment").show(false)
}
