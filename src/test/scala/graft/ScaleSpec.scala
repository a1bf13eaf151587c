package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scale

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.assertSameRows

  test("saltedAgg equals plain aggregation") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val salted = Scale.saltedAgg(li, Seq("l_returnflag"), saltFactor = 8,
      saltOn = Seq(col("l_orderkey"), col("l_linenumber")))(Seq(
      ("n", count(lit(1)), sum(col("n"))),
      ("sq", sum(col("l_quantity")), round(sum(col("sq")), 2)),
      ("mx", max(col("l_quantity")), max(col("mx")))))
    val plain = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sq"),
      max(col("l_quantity")).as("mx"))
    assertSameRows(salted, plain)
  }

  test("saltedJoin equals plain join") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
      .select("o_custkey", "c_mktsegment")
    val salted = Scale.saltedJoin(orders, cust, "o_custkey", saltFactor = 4)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val plain = orders.join(cust, Seq("o_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assertSameRows(salted, plain)
  }

  test("bucketed tables join without an exchange") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Scale.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Scale.writeBucketed(li.select("o_orderkey", "l_quantity"), "li_b", "o_orderkey", 4)
    val joined = spark.table("li_b").join(spark.table("orders_b"), "o_orderkey")
    // disable broadcast so the join strategy decision is about distribution
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n${plan.take(1500)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS li_b")
    }
  }

  test("end-to-end bucketed dedup pipeline: persisted signature/label tables join without exchange") {
    import graft.ml.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // pass 1 (the expensive one at 100 TB): signatures, persisted bucketed by id
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 32)
    Scale.writeBucketed(sigs, "sigs_b", "id", 4)
    // pass 2: band the PERSISTED signatures, resolve clusters, persist labels
    val pairs = Dedup.lshPairsFromSignatures(spark.table("sigs_b"),
      bands = 8, rows = 4, threshold = 0.8)
    val labels = Dedup.connectedComponents(pairs)
    Scale.writeBucketed(labels, "labels_b", "id", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // pass 3: id-keyed join of the two bucketed tables is exchange-free
      val joined = spark.table("labels_b").join(spark.table("sigs_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed signature/label join should not shuffle:\n${plan.take(1500)}")
      // and the pipeline's canonical set matches the one-shot in-memory path
      val dupes = spark.table("labels_b")
        .filter(col("id") =!= col("label")).select(col("id").as("__d"))
      val viaBuckets = docs.join(dupes, docs("doc_id") === col("__d"), "left_anti")
      val direct = Dedup.keepCanonical(docs, "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, bands = 8, rows = 4, threshold = 0.8))
      assert(viaBuckets.count() == direct.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS sigs_b")
      spark.sql("DROP TABLE IF EXISTS labels_b")
    }
  }

  test("spread widens small inputs and is a strict no-op on wide ones") {
    // small: the sf0.001 documents scan is one tiny row group → repartition
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sp = graft.ops.Scale.spread(docs)
    assert(sp.queryExecution.optimizedPlan.toString.contains("Repartition"),
      "small input should be spread")
    // wide: stats above the per-core floor → the SAME frame comes back,
    // no exchange added (decided from Catalyst stats, no job runs)
    val big = spark.range(1000L * 1000 * 1000)
    assert(graft.ops.Scale.spread(big.toDF()).queryExecution.optimizedPlan
      == big.toDF().queryExecution.optimizedPlan)
  }

  test("shuffleRows: deterministic permutation, seed-sensitive, multiset-preserving") {
    import spark.implicits._
    val d = (1L to 500L).map(i => (i, s"row$i")).toDF("id", "v")
    val a = Scale.shuffleRows(d, "id", seed = 1).select("id").collect().map(_.getLong(0)).toSeq
    val b = Scale.shuffleRows(d, "id", seed = 1).select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b, "same seed must reproduce the same order")
    val c = Scale.shuffleRows(d, "id", seed = 2).select("id").collect().map(_.getLong(0)).toSeq
    assert(a != c, "different seed must permute differently")
    assert(a.sorted == (1L to 500L) && c.sorted == (1L to 500L))
    assert(a != (1L to 500L).toSeq, "shuffle must not be the identity order")
  }

  test("partitioned write prunes partitions on read") {
    val path = java.nio.file.Files.createTempDirectory("graft-part").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    graft.ops.Scale.writePartitioned(li, path, "l_returnflag")
    val back = spark.read.parquet(path).where(col("l_returnflag") === "A")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      plan.take(800))
    assert(back.count() > 0)
    // pruned scan must not read the other partitions' files
    val scanned = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanned.contains("l_returnflag=A") || plan.contains("PartitionFilters"))
  }
}
