package graft

/** Diagnostic main: dump formatted plans for representative queries to check
  * pushdown / pruning / join strategy / partial aggregation.
  */
object PlanProbe extends App {
  val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.01"
  for (q <- Seq("q_filter", "q1_agg", "q_join_multi", "q_window_ranks", "q_top_n")) {
    println(s"===== $q =====")
    val df = SparkEntry.queries(q)(spark, dir)
    println(df.queryExecution.executedPlan.toString.take(3500))
  }
}
