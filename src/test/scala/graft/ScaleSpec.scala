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

  test("heavyHitters: exact regime (distinct <= k) equals groupBy counts, any partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = docs.groupBy("lang").agg(count(lit(1)).as("est_count"))
      .withColumnRenamed("lang", "item")
    for (parts <- Seq(1, 7, 32)) {
      val hh = docs.repartition(parts)
        .agg(graft.functions.Fns.Agg.heavyHitters(col("lang"), 64).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("item"), col("e.est_count").as("est_count"))
      assertSameRows(hh, exact)
    }
  }

  test("heavyHitters: eviction regime keeps true heavy hitters within the MG bound") {
    // deterministic zipf-ish stream: item floor(N/id) for id in 1..N has
    // ~2*sqrt(N) distinct values with harmonic-decay counts — key j appears
    // ~N/(j(j+1)) times. (The sf0.001 documents vocab is only ~31 tokens,
    // too small to ever evict.)
    val N = 20000L
    val toks = spark.range(1, N + 1)
      .select(concat(lit("t"), floor(lit(N) / col("id"))).as("tok"))
    val n = toks.count()
    val nDistinct = toks.distinct().count()
    val k = 200
    assert(nDistinct > k, s"fixture too small: $nDistinct distinct tokens")
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hh = toks.agg(graft.functions.Fns.Agg.heavyHitters(col("tok"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est_count").as("est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n / (k + 1) + 1
    // guarantee 1: every item with true count > n/(k+1) is present
    val must = exact.filter(_._2 > bound)
    assert(must.nonEmpty, "fixture has no heavy hitter above the bound")
    must.foreach { case (item, c) =>
      assert(hh.contains(item), s"missing heavy hitter '$item' (true $c > $bound)") }
    // guarantee 2: estimates never exceed truth and sit within n/(k+1) of it
    hh.foreach { case (item, est) =>
      val truth = exact(item)
      assert(est <= truth, s"'$item' overcounted: $est > $truth")
      assert(truth - est <= bound, s"'$item' est $est more than $bound below $truth")
    }
  }

  test("heavyHitters weighted: exact regime equals weighted groupBy, null/non-positive weights skip") {
    import TestSpark.spark.implicits._
    val d = Seq(("a", 10L), ("a", 5L), ("b", 100L), ("c", 1L),
                ("c", -7L), ("b", 0L), (null, 50L))
      .toDF("item", "w")
    val hh = d.agg(graft.functions.Fns.Agg
        .heavyHittersWeighted(col("item"), col("w"), 16).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est_count").as("est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // negative/zero weights and NULL items contribute nothing
    assert(hh == Map("b" -> 100L, "a" -> 15L, "c" -> 1L))
    // eviction regime: weighted bound est <= truth, truth - est <= W/(k+1)
    val N = 5000L
    val toks = spark.range(1, N + 1)
      .select(concat(lit("t"), floor(lit(N) / col("id"))).as("tok"),
              (col("id") % 7 + 1).as("w"))
    val W = toks.agg(sum("w")).head().getLong(0)
    val k = 64
    val exact = toks.groupBy("tok").agg(sum("w").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = toks.repartition(8)
      .agg(graft.functions.Fns.Agg
        .heavyHittersWeighted(col("tok"), col("w"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .collect().map(r => r.getStruct(0).getString(0) -> r.getStruct(0).getLong(1)).toMap
    val bound = W / (k + 1) + 1
    exact.filter(_._2 > bound).foreach { case (t, c) =>
      assert(est.contains(t), s"missing weighted heavy hitter '$t' ($c > $bound)") }
    est.foreach { case (t, e) =>
      assert(e <= exact(t), s"'$t' overcounted: $e > ${exact(t)}")
      assert(exact(t) - e <= bound, s"'$t' est $e more than $bound below ${exact(t)}")
    }
  }

  test("heavyHitters: bigint input and SQL registration agree with the Column API") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select((col("o_custkey") % 50).as("key"))
    val viaCol = orders.agg(graft.functions.Fns.Agg.heavyHitters(col("key"), 100).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est_count").as("est_count"))
    graft.sql.GraftFunctions.register(spark)
    orders.createOrReplaceTempView("hh_in")
    val viaSql = spark.sql(
      "SELECT e.item AS item, e.est_count AS est_count FROM " +
      "(SELECT explode(heavy_hitters(key, 100)) AS e FROM hh_in)")
    assertSameRows(viaCol, viaSql)
    // 50 distinct <= k=100: exact
    val exact = orders.groupBy("key").agg(count(lit(1)).as("est_count"))
      .withColumnRenamed("key", "item")
    assertSameRows(viaCol, exact)
  }

  test("distinctOverlap: exact below 2^lgK; within tolerance in estimation mode") {
    // exact mode: 1500 keys << 2^16 retained entries
    val a = spark.range(0, 1000).toDF("id")
    val b = spark.range(500, 1500).toDF("id")
    val ex = Scale.distinctOverlap(a, b, "id").head()
    def d(r: org.apache.spark.sql.Row, c: String) = r.getAs[Any](c).toString.toDouble
    assert(d(ex, "n_a") == 1000.0 && d(ex, "n_b") == 1000.0)
    assert(d(ex, "n_intersection") == 500.0 && d(ex, "n_union") == 1500.0)
    assert(d(ex, "jaccard") == 0.3333)
    // estimation mode: 300k keys >> 2^12
    val bigA = spark.range(0, 200000).toDF("id")
    val bigB = spark.range(100000, 300000).toDF("id")
    val est = Scale.distinctOverlap(bigA, bigB, "id", lgK = 12).head()
    assert(math.abs(d(est, "n_a") - 200000) < 200000 * 0.05)
    assert(math.abs(d(est, "n_union") - 300000) < 300000 * 0.05)
    assert(math.abs(d(est, "n_intersection") - 100000) < 100000 * 0.10)
    assert(math.abs(d(est, "jaccard") - 1.0 / 3) < 0.05)
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

  test("globalCumSum/globalRowNumber equal the single-partition window ground truth") {
    import spark.implicits._
    // ids deliberately NOT contiguous and values varied, over enough rows to
    // span many range partitions
    val d = (1L to 3000L).map(i => (i * 7 % 9999, i % 13 + 1)).toMap.toSeq
      .map { case (id, v) => (id, v) }.toDF("id", "v")
    val fast = graft.ops.Scale.globalCumSum(d, Seq(col("id")), col("v"), "cum")
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
    val slow = d.withColumn("cum", sum("v").over(w))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
    val rn = graft.ops.Scale.globalRowNumber(d, Seq(col("id")))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = d.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.zipWithIndex.forall { case (id, i) => rn(id) == i + 1 })
    // the integral global prefix sum is ONE operator over ONE range
    // exchange: no Window anywhere, no offsets aggregate, no broadcast
    // join, no cache — GlobalRunningSumExec collects per-partition totals
    // via a micro-job over its own materialized shuffle
    val pDf = graft.ops.Scale.globalRowNumber(d, Seq(col("id")))
    val plan = pDf.queryExecution.executedPlan.toString
    assert(plan.contains("GlobalRunningSum"),
      "global prefix sum must plan the dedicated one-exchange operator")
    assert(!plan.contains("windowspecdefinition"),
      "no Window may remain in the integral global prefix sum")
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("InMemoryRelation"),
      "the offsets broadcast join and the ranged-relation cache are gone")
    val nExchanges = "Exchange rangepartitioning".r
      .findAllIn(plan).length + "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(nExchanges == 1,
      s"exactly the range exchange may shuffle data, got $nExchanges:\n$plan")
  }

  test("groupedCumSum/globalRowNumberBy equal the per-group window ground truth") {
    import spark.implicits._
    // 4 groups of very different sizes (one hot), non-contiguous ids
    val d = (1L to 3000L).map { i =>
      val g = if (i % 10 < 7) "hot" else s"g${i % 10}"
      (g, i * 7 % 9999, i % 13 + 1)
    }.distinct.toDF("g", "id", "v")
    val fast = graft.ops.Scale.groupedCumSum(d, Seq("g"), Seq(col("id")),
        col("v"), "cum")
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("id")
    val slow = d.withColumn("cum", sum("v").over(w))
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fast == slow)
    // column order contract: original columns then the new one
    val rnDf = graft.ops.Scale.globalRowNumberBy(d, Seq("g"), Seq(col("id")))
    assert(rnDf.columns.toSeq == Seq("g", "id", "v", "rn"))
    // rn restarts at 1 per group and is dense
    val rn = rnDf.select("g", "rn").collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (g, xs) => g -> xs.map(_._2).sorted.toSeq }
    rn.foreach { case (g, xs) => assert(xs == (1L to xs.size), s"group $g: $xs") }
    // the data-side running sum must stay partition-local — the dedicated
    // one-exchange operator (integral values) or a window partitioned by
    // __pid (float fallback); never a per-group single-reducer window
    val plan = rnDf.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedRunningSum") ||
      plan.contains("windowspecdefinition(__pid"),
      "grouped prefix sum must run within range partitions")
    assert(!plan.contains("windowspecdefinition"),
      "no Window may remain in the integral grouped prefix sum")
    assert(!plan.contains("InMemoryRelation") &&
      !plan.contains("BroadcastHashJoin"),
      "the offsets micro-table join and the ranged cache are gone")
    // empty group-col list degrades to the global form
    val glob = graft.ops.Scale.groupedCumSum(d, Nil, Seq(col("g"), col("id")),
      col("v"), "cum")
    assert(glob.count() == d.count())
  }

  test("partition-local running-sum operator: desc order, NULL adds 0, " +
      "multi-value, non-integral values fall back to the window form") {
    import spark.implicits._
    // desc ordering + NULL values (sum semantics: null contributes 0)
    val d = (1L to 500L).map(i =>
        (i, if (i % 11 == 0) null else java.lang.Long.valueOf(i % 5 + 1)))
      .toDF("id", "v")
    val fast = graft.ops.Scale.globalCumSum(d, Seq(col("id").desc), col("v"),
        "cum").select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id").desc)
    val slow = d.repartition(1).withColumn("cum", sum("v").over(w))
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
    // the integral path must carry the dedicated one-exchange operator …
    val plan = graft.ops.Scale.globalCumSum(d, Seq(col("id").desc),
      col("v"), "cum").queryExecution.executedPlan.toString
    assert(plan.contains("GlobalRunningSum"))
    // … whose ONLY shuffle is its own range exchange: the hash exchange
    // the window form paid, the offsets aggregate's exchange, the
    // broadcast build and the ranged-relation cache are all gone
    val pDf = graft.ops.Scale.globalCumSum(d, Seq(col("id").desc),
      col("v"), "cum")
    pDf.count() // finalize AQE so the executed plan is walkable
    val pExec = pDf.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case x => x
    }
    val grsNodes = pExec.collect {
      case p: org.apache.spark.sql.graftshim.GlobalRunningSumExec => p }
    assert(grsNodes.nonEmpty, "expected the GlobalRunningSumExec node")
    grsNodes.foreach { n =>
      val shuffles = n.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => q
      }
      assert(shuffles.size == 1,
        s"exactly the range exchange may sit under GlobalRunningSumExec, " +
          s"got ${shuffles.size}")
    }
    // … and DOUBLE values ride the SAME one-exchange operator (round 19:
    // the float path no longer caches the ranged relation) with SQL SUM
    // semantics: NULL skipped, NULL result until the first non-null —
    // including LEADING NULLs, where the value stays NULL
    val dd = d.withColumn("vd",
      when(col("id") <= 50, lit(null).cast("double"))
        .otherwise(col("v").cast("double") * 0.5))
    val fastDf = graft.ops.Scale.globalCumSum(dd, Seq(col("id")), col("vd"),
      "cum")
    val fastD = fastDf.select("id", "cum").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val slowD = dd.repartition(1).withColumn("cum",
        sum("vd").over(org.apache.spark.sql.expressions.Window.orderBy("id")))
      .select("id", "cum").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(fastD.keySet == slowD.keySet &&
      fastD.forall { case (k, v) => (v, slowD(k)) match {
        case (null, null) => true
        case (a: Any, b: Any) => math.abs(a.asInstanceOf[Double] -
          b.asInstanceOf[Double]) < 1e-9
        case _ => false
      } }, "double cumsum must match the single-reducer window, NULLs included")
    val planD = fastDf.queryExecution.executedPlan.toString
    assert(planD.contains("GlobalRunningSum"),
      "double values must plan the one-exchange operator too")
    assert(!planD.contains("windowspecdefinition") &&
      !planD.contains("InMemoryRelation") &&
      !planD.contains("BroadcastHashJoin"),
      "the cached two-branch float shape is gone")
    // grouped doubles: same operator, per-group window ground truth
    val gd = (1L to 2000L).map(i =>
        (s"g${i % 5}", i, if (i % 13 == 0) null
         else java.lang.Double.valueOf((i % 7 + 1) * 0.25)))
      .toDF("g", "id", "vd")
    val fgD = graft.ops.Scale.groupedCumSum(gd, Seq("g"), Seq(col("id")),
        col("vd"), "cum", numPartitions = 7)
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    val sgD = gd.withColumn("cum", sum("vd").over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("id")))
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(fgD.keySet == sgD.keySet &&
      fgD.forall { case (k, v) => (v, sgD(k)) match {
        case (null, null) => true
        case (a: Any, b: Any) => math.abs(a.asInstanceOf[Double] -
          b.asInstanceOf[Double]) < 1e-9
        case _ => false
      } }, "grouped double cumsum must match the per-group window")
    // grouped: string reset keys, hot group, multi-partition
    val g = (1L to 2000L).map(i =>
        (if (i % 3 == 0) "aa" else s"g${i % 7}", i, i % 4 + 1))
      .toDF("g", "id", "v")
    val fg = graft.ops.Scale.groupedCumSum(g, Seq("g"), Seq(col("id")),
        col("v"), "cum").select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy("id")
    val sg = g.withColumn("cum", sum("v").over(wg))
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fg == sg)
  }

  test("GroupedRunningSum boundary fixup: one group spanning many whole " +
      "partitions; many tiny groups; two-group split straddling a boundary") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
    // ONE group over every partition: the driver walk must accumulate
    // last-group sums through the whole partition chain
    val one = (1L to 5000L).map(i => ("g", i, i % 7 + 1)).toDF("g", "id", "v")
    val fastOne = graft.ops.Scale.groupedCumSum(one, Seq("g"),
        Seq(col("id")), col("v"), "cum", numPartitions = 11)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slowOne = one.withColumn("cum",
        sum("v").over(w.partitionBy("g").orderBy("id")))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fastOne == slowOne)
    // many tiny groups (each inside one partition): offsets all zero
    val tiny = (1L to 3000L).map(i => (s"g${i / 3}", i, i % 5 + 1))
      .toDF("g", "id", "v")
    val fastTiny = graft.ops.Scale.groupedCumSum(tiny, Seq("g"),
        Seq(col("id")), col("v"), "cum", numPartitions = 7)
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val slowTiny = tiny.withColumn("cum",
        sum("v").over(w.partitionBy("g").orderBy("id")))
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fastTiny == slowTiny)
    // two giant groups: exactly one boundary partition starts mid-group
    val two = (1L to 4000L).map(i =>
      (if (i <= 2000) "a" else "b", i, i % 3 + 1)).toDF("g", "id", "v")
    val fastTwo = graft.ops.Scale.groupedCumSum(two, Seq("g"),
        Seq(col("id")), col("v"), "cum", numPartitions = 9)
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val slowTwo = two.withColumn("cum",
        sum("v").over(w.partitionBy("g").orderBy("id")))
      .select("g", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fastTwo == slowTwo)
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("packByBudget: contiguous shards, budget respected up to one straddler") {
    import spark.implicits._
    val d = (1L to 400L).map(i => (i, i % 7 + 1)).toDF("id", "sz")
    val packed = graft.ops.Scale.packByBudget(d, Seq(col("id")), col("sz"), budget = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // shards are non-decreasing in id order and start at 0
    assert(packed.head._3 == 0L)
    assert(packed.sliding(2).forall(p => p(1)._3 - p(0)._3 match {
      case 0 | 1 => true; case _ => false }))
    // each shard's size sum stays under budget + its last row's size
    val byShard = packed.groupBy(_._3)
    byShard.foreach { case (sh, rows) =>
      val tot = rows.map(_._2).sum
      // a straddler from the previous shard can push this shard's start past
      // its boundary, shaving up to (maxRowSize - 1) off the fill
      assert(tot >= 50 - 7 || sh == byShard.keys.max, s"shard $sh underfilled: $tot")
      assert(tot - rows.last._2 < 50, s"shard $sh pre-straddler total ${tot - rows.last._2}")
    }
  }

  test("prefix-sum edges: empty input, single row, more partitions than rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(graft.ops.Scale.globalCumSum(empty, Seq(col("id")), col("v"), "cum")
      .count() == 0)
    val one = Seq((7L, 3L)).toDF("id", "v")
    val r1 = graft.ops.Scale.globalRowNumber(one, Seq(col("id"))).head()
    assert(r1.getLong(r1.fieldIndex("rn")) == 1L)
    val few = Seq((1L, 2L), (2L, 5L)).toDF("id", "v")
    val out = graft.ops.Scale.globalCumSum(few, Seq(col("id")), col("v"), "cum",
        numPartitions = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 2L -> 7L))
  }

  test("prefix-sum ops are invariant to input partitioning") {
    import spark.implicits._
    val d = (1L to 2000L).map(i => (i * 13 % 9973, i % 11 + 1)).toMap.toSeq
      .map { case (id, v) => (id, v) }.toDF("id", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Scale.packByBudget(df, Seq(col("id")), col("v"), budget = 97)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val base = run(d)
    assert(run(d.repartition(7)) == base, "repartition(7) changed shards")
    assert(run(d.repartition(1)) == base, "single-partition input changed shards")
    assert(run(d.orderBy(org.apache.spark.sql.functions.rand(5))) == base,
      "row order changed shards")
  }

  test("globalCumSums multi-value: bit-parity with sequential globalCumSum calls") {
    import spark.implicits._
    val d = (1L to 3000L).map(i => (i * 7 % 9999, i % 13 + 1, i % 5))
      .groupBy(_._1).map(_._2.head).toSeq.toDF("id", "a", "b")
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(r.fieldIndex("id")) ->
        (r.getLong(r.fieldIndex("ca")), r.getLong(r.fieldIndex("cb")))
    val fused = graft.ops.Scale.globalCumSums(d, Seq(col("id")),
        Seq(col("a") -> "ca", col("b") -> "cb"))
      .collect().map(key).toMap
    val seq2 = graft.ops.Scale.globalCumSum(
        graft.ops.Scale.globalCumSum(d, Seq(col("id")), col("a"), "ca"),
        Seq(col("id")), col("b"), "cb")
      .collect().map(key).toMap
    assert(fused == seq2, "fused multi-value prefix sums diverge from sequential")
    // the fusion claim: both sums ride the range exchange a SINGLE-value
    // call pays (the cached ranged table's plan string mentions
    // rangepartitioning once per scan, so count relative, not absolute)
    def rangeCount(df: org.apache.spark.sql.DataFrame) =
      "rangepartitioning".r.findAllIn(
        df.queryExecution.executedPlan.toString.toLowerCase).size
    val one = rangeCount(graft.ops.Scale.globalCumSum(
      d, Seq(col("id")), col("a"), "ca"))
    val two = rangeCount(graft.ops.Scale.globalCumSums(d, Seq(col("id")),
      Seq(col("a") -> "ca", col("b") -> "cb")))
    assert(two <= one,
      s"fused 2-value form pays MORE range exchanges ($two) than a " +
        s"single-value call ($one)")
  }

  test("tokenizer chain train->encode->ids->cut is bit-invariant to " +
      "shuffle-partition count (the q_context_windows chain)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(): Map[Long, (Long, Long, String)] = {
      val merges = graft.text.Bpe.train(docs, "text", nMerges = 4)
      val enc = graft.ml.Dedup.trackCache(
        graft.text.Bpe.encodeDocs(docs, "doc_id", "text", merges))
      val ids = graft.text.Bpe.idsFromTokens(enc, "doc_id",
        graft.text.Bpe.vocabTable(enc))
      graft.ops.Scale.contextWindows(ids, "doc_id", "ids", windowLen = 64)
        .select(col("window_id"), col("n_filled"), col("n_docs"),
          concat_ws(" ", col("ids")).as("ids"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    }
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val base = run()
      assert(base.nonEmpty)
      // repeated run under the same config: determinism, not just stability
      assert(run() == base, "repeated run diverged at 32 shuffle partitions")
      for (p <- Seq("2", "4")) {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        assert(run() == base, s"window cut diverged at $p shuffle partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("contextWindowsShuffled: seeded permutation packing — bit-stable " +
      "across partition counts, spans carry real doc ids, seed matters") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        expr("transform(filter(split(trim(lower(text)), '\\\\s+')," +
          " w -> w rlike '^[a-z]+$'), w -> CAST(length(w) AS LONG))")
          .as("ids"))
    val L = 64
    def run(seed: String) = Scale
      .contextWindowsShuffled(docs, "doc_id", "ids", L, seed)
      .orderBy("window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](r.fieldIndex("ids")).toList,
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("spans")).toList
          .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))))).toList
    val base = run("42")
    assert(base.nonEmpty)
    // every token lands exactly once; spans name REAL doc ids and
    // reconstruct each document's id array under the permutation
    val rebuilt = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, List[Long])]]
    for ((wid, _, _, ids, spans) <- base; (doc, st, ln) <- spans)
      rebuilt.getOrElseUpdate(doc,
        scala.collection.mutable.ArrayBuffer.empty) +=
        ((wid, ids.slice(st.toInt, (st + ln).toInt)))
    val want = docs.filter(size(col("ids")) > 0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val got = rebuilt.map { case (d, parts) =>
      d -> parts.sortBy(_._1).flatMap(_._2).toList }.toMap
    assert(got == want, "spans failed to reconstruct documents")
    // a different seed is a different permutation (with overwhelming
    // probability on 500 docs), the same seed replays exactly
    assert(run("42") == base, "same-seed rerun diverged")
    assert(run("7") != base, "seed had no effect")
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (p <- Seq("2", "4")) {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        assert(run("42") == base, s"shuffled cut diverged at $p partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("contextWindowsIngest: manual batches (incl. an empty one) emit " +
      "the one-shot cut's full-window prefix; carry state survives") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        expr("transform(filter(split(trim(lower(text)), '\\\\s+')," +
          " w -> w rlike '^[a-z]+$'), w -> CAST(length(w) AS LONG))")
          .as("ids"))
    val L = 64
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      (r.getLong(1), r.getLong(2),
        r.getSeq[Long](r.fieldIndex("ids")).toList)
    val whole = Scale.contextWindows(docs, "doc_id", "ids", L)
      .collect().map(key).toMap
    val fullTruth = whole.filter(_._2._1 == L)
    val state = java.nio.file.Files
      .createTempDirectory("graft-cwi-state").toString
    val got = scala.collection.mutable.Map
      .empty[Long, (Long, Long, List[Long])]
    val slices = Seq(
      docs.filter(col("doc_id") < 100),
      docs.filter(lit(false)), // an EMPTY batch must not disturb carry
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 400),
      docs.filter(col("doc_id") >= 400))
    for (b <- slices)
      Scale.contextWindowsIngest(spark, state, b, "doc_id", "ids", L)
        .collect().foreach(r => got += key(r))
    assert(got.toMap == fullTruth,
      s"ingest emitted ${got.size} vs one-shot ${fullTruth.size}")
    val rem = spark.read.parquet(s"$state/carry/remainder")
      .orderBy("doc_id").collect().flatMap(r => r.getSeq[Long](1)).toList
    assert(rem == whole.filter(_._2._1 < L).head._2._3)
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("contextWindowsIngest hardening: out-of-order batches fail loudly; " +
      "a replayed batch re-emits identically without advancing state; " +
      "the delete-to-rename crash window recovers by promotion") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        expr("transform(filter(split(trim(lower(text)), '\\\\s+')," +
          " w -> w rlike '^[a-z]+$'), w -> CAST(length(w) AS LONG))")
          .as("ids"))
    val L = 64
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      (r.getLong(1), r.getLong(2),
        r.getSeq[Long](r.fieldIndex("ids")).toList)
    val state = java.nio.file.Files
      .createTempDirectory("graft-cwi-hard").toString
    val b1 = docs.filter(col("doc_id") < 200)
    val b2 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
    val out1 = Scale.contextWindowsIngest(spark, state, b1,
      "doc_id", "ids", L, batchId = 0L).collect().map(key).toMap
    val metaAfter1 = spark.read.parquet(s"$state/carry/meta").head()
    // (a) replay by batchId: identical output, state untouched
    val replay1 = Scale.contextWindowsIngest(spark, state, b1,
      "doc_id", "ids", L, batchId = 0L).collect().map(key).toMap
    assert(replay1 == out1, "batchId replay did not re-emit identically")
    assert(spark.read.parquet(s"$state/carry/meta").head() == metaAfter1,
      "replay advanced the carry state")
    // (b) replay by content fingerprint (no batchId)
    val replay2 = Scale.contextWindowsIngest(spark, state, b1,
      "doc_id", "ids", L).collect().map(key).toMap
    assert(replay2 == out1, "fingerprint replay did not re-emit identically")
    // (c) same batchId, different content: must fail loudly
    val exDiff = intercept[IllegalArgumentException] {
      Scale.contextWindowsIngest(spark, state, b2,
        "doc_id", "ids", L, batchId = 0L)
    }
    assert(exDiff.getMessage.contains("DIFFERENT content"))
    // (d) out-of-order batch (ids not ascending past carried max): fails
    val exOrd = intercept[IllegalArgumentException] {
      Scale.contextWindowsIngest(spark, state,
        docs.filter(col("doc_id") < 100), "doc_id", "ids", L, batchId = 1L)
    }
    assert(exOrd.getMessage.contains("ascend across batches"))
    // (e) duplicate ids within a batch: fails
    val exDup = intercept[IllegalArgumentException] {
      Scale.contextWindowsIngest(spark, state,
        b2.unionByName(b2), "doc_id", "ids", L, batchId = 1L)
    }
    assert(exDup.getMessage.contains("unique within"))
    // (f) crash window between delete(carry) and rename: the committed
    // staging (it carries the _COMMITTED marker through the rename) is
    // promoted on the next call, and the batch that caused it is then
    // seen as a replay — never a silent fresh-state reset
    val out2 = Scale.contextWindowsIngest(spark, state, b2,
      "doc_id", "ids", L, batchId = 1L).collect().map(key).toMap
    val fs = new org.apache.hadoop.fs.Path(state).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$state/carry"),
      new org.apache.hadoop.fs.Path(s"$state/carry.staging")))
    val replay3 = Scale.contextWindowsIngest(spark, state, b2,
      "doc_id", "ids", L, batchId = 1L).collect().map(key).toMap
    assert(replay3 == out2, "post-promotion replay did not re-emit b2")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$state/carry")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$state/carry.staging")))
    // (g) an UNCOMMITTED staging (no marker) next to an intact carry is
    // discarded and normal processing continues
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$state/carry.staging/junk"))
    val b3 = docs.filter(col("doc_id") >= 350 && col("doc_id") < 400)
    Scale.contextWindowsIngest(spark, state, b3,
      "doc_id", "ids", L, batchId = 2L).collect()
    // ingest end state == one-shot packing of everything fed so far
    val whole = Scale.contextWindows(
      docs.filter(col("doc_id") < 400), "doc_id", "ids", L)
    val oneShotRem = whole.filter(col("n_filled") < lit(L))
      .select(explode(col("spans")).as("sp"), col("ids"))
      .select(col("sp.doc_id"),
        expr("slice(ids, sp.start + 1, sp.len)").as("ids"))
      .orderBy("doc_id").collect()
      .flatMap(_.getSeq[Long](1)).toList
    val remNow = spark.read.parquet(s"$state/carry/remainder")
      .orderBy("doc_id").collect().flatMap(_.getSeq[Long](1)).toList
    assert(remNow == oneShotRem, "carry remainder diverged from one-shot")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("lengthBatchesByBoundaries + lengthBatchesIngest: frozen-boundary " +
      "assignment, stream == one-shot, replay re-emits, order enforced") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextFns.tokenCount(col("text")).cast("long").as("len"))
    // train the cutoffs ONCE from the self-calibrating batcher's split
    val trained = Scale.lengthGroupedBatches(docs, "doc_id", col("len"),
      nBuckets = 4, batchBudget = 2048L)
    val boundaries = trained.filter(col("bucket") >= 1)
      .groupBy("bucket").agg(min("len").as("boundary"))
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))
    val oneShot = Scale.lengthBatchesByBoundaries(docs, "doc_id",
      col("len"), boundaries, 2048L).collect().map(key).toMap
    assert(oneShot.nonEmpty)
    // every bucket's pre-straddler batch total respects the budget
    val over = Scale.lengthBatchesByBoundaries(docs, "doc_id", col("len"),
        boundaries, 2048L)
      .groupBy("bucket", "batch")
      .agg(sum("len").as("sm"), max("len").as("mx"))
      .filter(col("sm") - col("mx") >= 2048L).count()
    assert(over == 0, s"$over batches exceed the budget before straddler")
    // ingest in three id-ordered slices == the one-shot rows
    val state = java.nio.file.Files
      .createTempDirectory("graft-lbi-state").toString
    val got = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long)]
    val slices = Seq(
      docs.filter(col("doc_id") < 100),
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 400),
      docs.filter(col("doc_id") >= 400))
    for ((b, i) <- slices.zipWithIndex)
      Scale.lengthBatchesIngest(spark, state, b, "doc_id", col("len"),
          boundaries, 2048L, batchId = i.toLong)
        .collect().foreach(r => got += key(r))
    assert(got.toMap == oneShot,
      s"ingest emitted ${got.size} rows vs one-shot ${oneShot.size}")
    // replay of the LAST batch re-emits its rows identically, and the
    // carry totals do not advance
    val totals0 = spark.read.parquet(s"$state/carry/totals")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val replay = Scale.lengthBatchesIngest(spark, state, slices(2),
        "doc_id", col("len"), boundaries, 2048L, batchId = 2L)
      .collect().map(key).toMap
    assert(replay == oneShot.filter(_._1 >= 400L), "replay diverged")
    val totals1 = spark.read.parquet(s"$state/carry/totals")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals1 == totals0, "replay advanced the totals")
    // totals == per-bucket length sums of everything packed
    val want = docs.join(
        Scale.lengthBatchesByBoundaries(docs, "doc_id", col("len"),
          boundaries, 2048L).select("doc_id", "bucket"), "doc_id")
      .groupBy("bucket").agg(sum("len").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals1 == want, s"carry totals $totals1 != $want")
    // out-of-order batch fails loudly
    val ex = intercept[IllegalArgumentException] {
      Scale.lengthBatchesIngest(spark, state,
        docs.filter(col("doc_id") < 50), "doc_id", col("len"),
        boundaries, 2048L, batchId = 3L)
    }
    assert(ex.getMessage.contains("ascend across batches"))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("lengthGroupedBatches: budget respected up to one straddler; " +
      "bucketing strictly shrinks padding on the skewed corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def padding(buckets: Int): Long =
      Scale.lengthGroupedBatches(docs, "doc_id",
          graft.text.TextFns.tokenCount(col("text")), buckets, 2048L)
        .groupBy("bucket", "batch")
        .agg(count(lit(1)).as("n"), max("len").as("mx"),
          sum("len").as("sm"))
        .agg(sum(col("mx") * col("n") - col("sm"))).head().getLong(0)
    val p1 = padding(1); val p4 = padding(4)
    assert(p4 < p1, s"bucketed padding $p4 !< unbucketed $p1")
    // budget: each (bucket, batch)'s pre-straddler total stays under it
    val a = Scale.lengthGroupedBatches(docs, "doc_id",
      graft.text.TextFns.tokenCount(col("text")), 4, 2048L)
    val bad = a.groupBy("bucket", "batch")
      .agg(sum("len").as("sm"), max("len").as("mx"))
      .filter(col("sm") - col("mx") >= 2048L).count()
    assert(bad == 0, s"$bad batches exceed the budget before their straddler")
  }

  test("shardManifest: mergeable sufficient statistics — split parts " +
      "merge to the one-shot manifest bit-exactly") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
        col("text"))
    val packed = graft.ml.Dedup.trackCache(Scale.packByBudget(docs,
      Seq(col("doc_id")), col("n_tok"), budget = 2000))
    def mf(df: org.apache.spark.sql.DataFrame) =
      Scale.shardManifest(df, "shard", "doc_id", col("n_tok"),
        graft.ops.Sketch.portableHash(col("text")))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val whole = rows(mf(packed))
    assert(whole.nonEmpty)
    val merged = rows(Scale.mergeShardManifests(Seq(
      mf(packed.filter(col("doc_id") % 2 === 0)),
      mf(packed.filter(col("doc_id") % 2 === 1)))))
    assert(merged == whole, "merged part-manifests diverge from one-shot")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("manifestDiff: added/removed/changed/unchanged from manifests " +
      "alone; row count guards the XOR blind spot") {
    import spark.implicits._
    // hand-built manifests: shard 1 unchanged, 2 changed (fp moved),
    // 3 removed, 4 added, 5 = the XOR blind spot — a duplicate pair
    // XORs to the SAME fingerprint, only n_rows betrays the change
    val old = Seq(
      (1L, 10L, 100L, 7L), (2L, 10L, 100L, 8L), (3L, 5L, 50L, 9L),
      (5L, 2L, 20L, 11L))
      .toDF("shard", "n_rows", "n_tokens", "fingerprint")
    val cur = Seq(
      (1L, 10L, 100L, 7L), (2L, 10L, 100L, 88L), (4L, 6L, 60L, 10L),
      (5L, 4L, 40L, 11L))
      .toDF("shard", "n_rows", "n_tokens", "fingerprint")
    val got = Scale.manifestDiff(old, cur).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "changed"), got.toString)
    // outer-join NULL convention: counts absent on the missing side
    val rows = Scale.manifestDiff(old, cur).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(4L).isNullAt(2) && !rows(4L).isNullAt(3))
    assert(!rows(3L).isNullAt(2) && rows(3L).isNullAt(3))
  }

  test("epochPlan: pure-function schedule — partition-invariant, " +
      "seed-sensitive, round-robin balanced, resume is a filter") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
        col("text"))
    val manifest = graft.ml.Dedup.trackCache(Scale.shardManifest(
      Scale.packByBudget(docs, Seq(col("doc_id")), col("n_tok"),
        budget = 2000),
      "shard", "doc_id", col("n_tok"),
      graft.ops.Sketch.portableHash(col("text"))))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val plan = rows(Scale.epochPlan(manifest, "shard", "42", nWorkers = 4))
    assert(plan.nonEmpty)
    // bit-stable across input partitionings (the permutation is a pure
    // function of (shard, seed), the rank two-phase)
    assert(rows(Scale.epochPlan(manifest.repartition(7), "shard", "42",
      nWorkers = 4)) == plan)
    // a different seed is a different epoch order over the same shards
    val plan2 = rows(Scale.epochPlan(manifest, "shard", "43", nWorkers = 4))
    assert(plan2.keySet == plan.keySet &&
      plan2.exists { case (s, v) => plan(s) != v },
      "seed 43 must permute differently")
    // round-robin balance: per-worker shard counts differ by at most 1
    val byWorker = plan.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byWorker.values.max - byWorker.values.min <= 1, byWorker.toString)
    // per-worker steps are consecutive from 0 and tok_offset is the exact
    // running token total of the worker's earlier steps
    for ((w, ss) <- plan.values.groupBy(_._2)) {
      val ordered = ss.toSeq.sortBy(_._3)
      assert(ordered.map(_._3) == (0L until ordered.size.toLong),
        s"worker $w steps not consecutive")
      var cum = 0L
      for ((nTok, _, _, off) <- ordered) {
        assert(off == cum, s"worker $w offset $off != $cum")
        cum += nTok
      }
    }
    // resume-at-step-k: the suffix IS the plan filtered — derived, no state
    val full = Scale.epochPlan(manifest, "shard", "42", nWorkers = 4)
    assert(rows(full.filter(col("step") >= 2)) ==
      plan.filter(_._2._3 >= 2L))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("writeShardsWithManifest + verifyShards: clean export proves " +
      "unchanged; truncation and corruption are named") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
        col("text"))
    val packed = graft.ml.Dedup.trackCache(Scale.packByBudget(docs,
      Seq(col("doc_id")), col("n_tok"), budget = 2000))
    val dirP = java.nio.file.Files.createTempDirectory("graft-shexp")
    val path = dirP.toString
    try {
      Scale.writeShardsWithManifest(packed, path, "shard", "doc_id",
        col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      def verify() = Scale.verifyShards(spark, path, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val clean = verify()
      assert(clean.nonEmpty && clean.values.forall(_ == "unchanged"),
        s"clean export must verify unchanged: $clean")
      // corrupt shard 1: rewrite its partition with one document's text
      // mutated (digest moves, count does not)
      val s1 = spark.read.parquet(s"$path/data/shard=1")
        .withColumn("text", when(col("doc_id") % 7 === 1,
          concat(col("text"), lit(" bitrot"))).otherwise(col("text")))
        .localCheckpoint()
      s1.write.mode("overwrite").parquet(s"$path/data/shard=1")
      // truncate shard 2: drop a document (count and digest move)
      val s2 = spark.read.parquet(s"$path/data/shard=2")
        .filter(col("doc_id") % 5 =!= 2).localCheckpoint()
      s2.write.mode("overwrite").parquet(s"$path/data/shard=2")
      val tampered = verify()
      assert(tampered(1L) == "changed" && tampered(2L) == "changed",
        tampered.toString)
      assert(tampered.count(_._2 != "unchanged") == 2,
        "only the tampered shards may be flagged")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("resyncShards: only changed shards rewrite (untouched files " +
      "byte-identical), removed partitions drop, the export verifies " +
      "against the new corpus") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("shard", expr("doc_id div 20"))
    def sized(df: org.apache.spark.sql.DataFrame) = df.select(
      col("shard"), col("doc_id"),
      graft.text.TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
      col("text"))
    // v1 = everything; v2 mutates shard 1's text, truncates shard 2,
    // removes shard 3, adds shard 999 — every diff status exercised
    val v1 = sized(base)
    val extra = spark.range(3).select(
      (col("id") + 9000000L).as("doc_id"),
      concat(lit("fresh shard content row "), col("id").cast("string"))
        .as("text"))
      .withColumn("shard", lit(999L))
    val v2 = sized(base
      .withColumn("text", when(col("shard") === 1 && col("doc_id") % 3 === 0,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      .filter(!(col("shard") === 2 && col("doc_id") % 13 === 0))
      .filter(col("shard") =!= 3)
      .unionByName(extra.select("doc_id", "text", "shard")))
    val dirP = java.nio.file.Files.createTempDirectory("graft-resync")
    val path = dirP.toString
    try {
      Scale.writeShardsWithManifest(v1, path, "shard", "doc_id",
        col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      // fingerprint shard 0's files before the resync (it is unchanged
      // in v2, so its bytes must not be rewritten — not merely re-equal)
      import scala.jdk.CollectionConverters._
      def files(shard: Long) = java.nio.file.Files
        .walk(java.nio.file.Paths.get(path, "data", s"shard=$shard"))
        .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.getFileName.toString ->
          (java.nio.file.Files.size(p),
           java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
      val before0 = files(0L)
      val diff = Scale.resyncShards(spark, v2, path, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(diff(0L) == "unchanged" && diff(1L) == "changed" &&
        diff(2L) == "changed" && diff(3L) == "removed" &&
        diff(999L) == "added", diff.toString)
      // untouched shard: same file names, sizes, AND mtimes
      assert(files(0L) == before0, "unchanged shard was rewritten")
      // removed shard partition is gone
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "data", "shard=3")))
      // the resynced export IS the v2 export: verification all-unchanged
      val ver = Scale.verifyShards(spark, path, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(ver.nonEmpty && ver.values.forall(_ == "unchanged"),
        s"resynced export must verify: $ver")
      // and idempotent: a second resync with the same corpus touches
      // nothing
      val again = Scale.resyncShards(spark, v2, path, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(again.values.forall(_ == "unchanged"))
      assert(files(0L) == before0)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("resyncShards crash recovery: a crash between the data writes and " +
      "the manifest replace leaves the OLD manifest authoritative — the " +
      "rerun recomputes the same diff and COMPLETES the resync") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("shard", expr("doc_id div 20"))
    def sized(df: org.apache.spark.sql.DataFrame) = df.select(
      col("shard"), col("doc_id"),
      graft.text.TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
      col("text"))
    val v1 = sized(base)
    val v2 = sized(base
      .withColumn("text", when(col("shard") === 1 && col("doc_id") % 3 === 0,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      .filter(col("shard") =!= 3))
    val dirP = java.nio.file.Files.createTempDirectory("graft-resync-crash")
    val path = dirP.toString
    import scala.jdk.CollectionConverters._
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit =
      java.nio.file.Files.walk(from).iterator().asScala.foreach { p =>
        val t = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    def rmTree(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    try {
      Scale.writeShardsWithManifest(v1, path, "shard", "doc_id",
        col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      // keep the v1 manifest and v1 shard=1 data — the raw material for
      // reconstructing the crash states below
      val v1Man = dirP.resolve("v1_manifest_copy")
      val v1Shard1 = dirP.resolve("v1_shard1_copy")
      copyTree(java.nio.file.Paths.get(path, "manifest"), v1Man)
      copyTree(java.nio.file.Paths.get(path, "data", "shard=1"), v1Shard1)
      // run the resync to completion once to obtain the v2 end state
      val origDiff = Scale.resyncShards(spark, v2, path, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(origDiff(1L) == "changed" && origDiff(3L) == "removed")

      // CRASH STATE A: all data writes landed, manifest replace did not
      // (the widest window) — reconstruct by restoring the v1 manifest
      rmTree(java.nio.file.Paths.get(path, "manifest"))
      copyTree(v1Man, java.nio.file.Paths.get(path, "manifest"))
      val rerunA = Scale.resyncShards(spark, v2, path, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // the receipt names the ORIGINALLY-changed shards (diff is computed
      // against the pre-resync manifest), not all-unchanged
      assert(rerunA == origDiff,
        s"rerun after crash must recompute the same diff: $rerunA")
      val verA = Scale.verifyShards(spark, path, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(verA.nonEmpty && verA.values.forall(_ == "unchanged"),
        s"rerun must complete the resync: $verA")

      // CRASH STATE B: crash mid-data-write — shard 1's rewrite did NOT
      // land (still v1 content) and the manifest was not replaced
      rmTree(java.nio.file.Paths.get(path, "manifest"))
      copyTree(v1Man, java.nio.file.Paths.get(path, "manifest"))
      rmTree(java.nio.file.Paths.get(path, "data", "shard=1"))
      copyTree(v1Shard1, java.nio.file.Paths.get(path, "data", "shard=1"))
      val rerunB = Scale.resyncShards(spark, v2, path, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rerunB == origDiff)
      val verB = Scale.verifyShards(spark, path, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(verB.nonEmpty && verB.values.forall(_ == "unchanged"),
        s"rerun must repair the unlanded shard rewrite: $verB")
    } finally {
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("epochPlanVerified: damaged shards are excluded from the schedule " +
      "and named; the plan equals epochPlan over the verifying shards") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
        col("text"))
    val packed = graft.ml.Dedup.trackCache(Scale.packByBudget(docs,
      Seq(col("doc_id")), col("n_tok"), budget = 2000))
    val dirP = java.nio.file.Files.createTempDirectory("graft-epverify")
    val path = dirP.toString
    try {
      Scale.writeShardsWithManifest(packed, path, "shard", "doc_id",
        col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      // truncate shard 2 on disk: the export no longer matches its
      // stored manifest row
      val s2 = spark.read.parquet(s"$path/data/shard=2")
        .filter(col("doc_id") % 5 =!= 2).localCheckpoint()
      s2.write.mode("overwrite").parquet(s"$path/data/shard=2")
      val got = Scale.epochPlanVerified(spark, path, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")),
          seed = "42", nWorkers = 4).collect()
        .map(r => r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4),
          r.getString(5))).toMap
      // the damaged shard is reported, not scheduled
      assert(got(2L)._5 == "changed" && got(2L)._2 == null &&
        got(2L)._3 == null && got(2L)._4 == null, got(2L).toString)
      assert(got.count(_._2._5 != "verified") == 1,
        "only the truncated shard may be excluded")
      // and the planned rows are exactly epochPlan over the survivors
      val manifest = spark.read.parquet(s"$path/manifest")
        .filter(col("shard") =!= 2)
      val exp = Scale.epochPlan(manifest, "shard", "42", nWorkers = 4)
        .collect().map(r => r.getLong(0) -> (r.getLong(1),
          r.getLong(2): Any, r.getLong(3): Any, r.getLong(4): Any,
          "verified")).toMap
      assert(got.filter(_._2._5 == "verified") == exp)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("epochSchedule: per-epoch permutations diverge, steps consecutive, " +
      "offsets continuous across epochs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
        col("text"))
    val manifest = graft.ml.Dedup.trackCache(Scale.shardManifest(
      Scale.packByBudget(docs, Seq(col("doc_id")), col("n_tok"),
        budget = 2000),
      "shard", "doc_id", col("n_tok"),
      graft.ops.Sketch.portableHash(col("text"))))
    val sched = Scale.epochSchedule(manifest, "shard", "42", nWorkers = 4,
        nEpochs = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val nShards = sched.keySet.map(_._1).size
    assert(sched.size == nShards * 3, "every shard in every epoch")
    // the epoch-0 hash key is (shard, seed#0) — a DIFFERENT derived
    // permutation from epochPlan's (shard, seed), deliberately (each
    // consumer is its own pure function); what must hold is that at
    // least one LATER epoch reorders relative to epoch 0
    val workerOf = (e: Long) => sched.collect {
      case ((sh, ep), (_, w, st, _)) if ep == e => sh -> (w, st) }.toMap
    assert(workerOf(0L) != workerOf(1L) || workerOf(1L) != workerOf(2L),
      "epochs must not all share one permutation")
    // per (epoch, worker): steps consecutive from 0
    for (e <- 0L to 2L; (w, ss) <- sched.toSeq.collect {
        case ((sh, ep), (nt, ww, st, off)) if ep == e => (ww, st) }
        .groupBy(_._1))
      assert(ss.map(_._2).toSeq.sorted == (0L until ss.size.toLong),
        s"epoch $e worker $w steps not consecutive")
    // per worker: tok_offset is the exact running total ACROSS epochs
    for ((w, rows) <- sched.toSeq.groupBy(_._2._2)) {
      val ordered = rows.sortBy { case ((_, e), (_, _, st, _)) => (e, st) }
      var cum = 0L
      for (((_, _), (nt, _, _, off)) <- ordered) {
        assert(off == cum, s"worker $w offset $off != $cum")
        cum += nt
      }
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("interleaveWeighted: stride mix, weight-2 source appears ~2x as often") {
    import spark.implicits._
    val a = (1L to 100L).map(i => (i, "x")).toDF("id", "p")
    val b = (101L to 150L).map(i => (i, "y")).toDF("id", "p")
    val mix = graft.ops.Scale.interleaveWeighted(
        Seq(("a", a, 2.0), ("b", b, 1.0)), d => Seq(d("id")))
      .orderBy("mix_ord").select("tag").collect().map(_.getString(0)).toSeq
    assert(mix.size == 150)
    // in every prefix, a's share of its source is >= b's (stride invariant):
    // count ratio in the first 30 positions should be ~2:1
    val head = mix.take(30)
    val na = head.count(_ == "a"); val nb = head.count(_ == "b")
    assert(na >= 2 * nb - 2 && na <= 2 * nb + 2, s"head mix $na:$nb")
    // deterministic across runs
    val mix2 = graft.ops.Scale.interleaveWeighted(
        Seq(("a", a, 2.0), ("b", b, 1.0)), d => Seq(d("id")))
      .orderBy("mix_ord").select("tag").collect().map(_.getString(0)).toSeq
    assert(mix == mix2)
  }

  test("interleaveByTemperature: alpha=1 is proportional; lower alpha flattens the mix") {
    import spark.implicits._
    val big = (1L to 900L).map(i => (i, "big")).toDF("id", "src")
    val small = (1L to 100L).map(i => (i, "small")).toDF("id", "src")
    def headShare(alpha: Double): Double = {
      val mixed = graft.ops.Scale.interleaveByTemperature(
        Seq("big" -> big, "small" -> small), alpha, d => Seq(d("id")))
      val head = mixed.orderBy("mix_ord").limit(200)
      head.where(col("tag") === "small").count().toDouble / 200
    }
    val prop = headShare(1.0)   // ~100/1000 = 0.10 of the stream
    val flat = headShare(0.5)   // sqrt weights: 10/(30+10) = 0.25
    assert(math.abs(prop - 0.10) < 0.03, s"alpha=1 share $prop")
    assert(math.abs(flat - 0.25) < 0.04, s"alpha=0.5 share $flat")
    assert(flat > prop)
  }

  test("packSequences: sequences exactly full, docs fully covered, partition-invariant") {
    import spark.implicits._
    val seqLen = 100
    // lengths chosen to produce docs smaller and larger than seqLen, plus
    // zero-length docs (dropped) and exact-boundary hits
    val docs = (1L to 200L).map(i => (i, (i * 37 % 260))).toDF("id", "n")
    val packed = graft.ops.Scale.packSequences(
      docs, Seq(col("id")), col("n"), seqLen).cache()

    // every doc with n>0 is covered exactly: segments tile [0, n)
    val cover = packed.groupBy("id")
      .agg(sum(col("tok_end") - col("tok_start")).as("tot"),
           min("tok_start").as("lo"), max("tok_end").as("hi"))
      .join(docs.where(col("n") > 0), "id", "full")
    assert(cover.where(col("tot").isNull || col("tot") =!= col("n")
      || col("lo") =!= 0 || col("hi") =!= col("n")).count() == 0)

    // every sequence except the last is exactly full
    val total = docs.agg(sum(when(col("n") > 0, col("n")))).head().getLong(0)
    val perSeq = packed.groupBy("seq_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("filled"))
    val lastSeq = (total - 1) / seqLen
    assert(perSeq.where(col("seq_id") =!= lastSeq
      && col("filled") =!= seqLen).count() == 0)
    assert(perSeq.count() == lastSeq + 1)

    // segment offsets respect sequence bounds
    assert(packed.where(col("seq_off") < 0
      || col("seq_off") + (col("tok_end") - col("tok_start")) > seqLen)
      .count() == 0)

    // invariant to input partitioning
    val packed13 = graft.ops.Scale.packSequences(
      docs.repartition(13), Seq(col("id")), col("n"), seqLen)
    TestSpark.assertSameRows(packed, packed13, "packSequences repartition")
    packed.unpersist()
  }

  test("coalesceForWrite: small data -> one file, result unchanged") {
    import spark.implicits._
    val d = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v").repartition(16)
    val path = java.nio.file.Files.createTempDirectory("graft-cfw").toString
    graft.ops.Scale.coalesceForWrite(d).write.mode("overwrite").parquet(path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1, s"expected 1 file, got ${files.length}")
    val back = spark.read.parquet(path)
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).head().getLong(0) == (1L to 1000L).sum)
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

  test("globalRowNumber: two consumers of one ranked table see ONE partitioning (dup-heavy keys)") {
    import spark.implicits._
    // regression for the sorted-neighborhood bug: without the shared pin,
    // the offsets and data branches of the prefix sum could sample
    // DIFFERENT range boundaries (ReuseExchange misses when consumers
    // prune different columns) and ranks corrupt on duplicate-heavy keys
    val d = (1L to 4000L).map(i => (i, s"k${i % 7}")).toDF("id", "k")
    val ranked = graft.ops.Scale.globalRowNumber(
      d, Seq(col("k"), col("id")), "rn", numPartitions = 13)
    // consumer A prunes to (id, rn); consumer B to (k, rn): different
    // column sets, joined back on rn — every rn must match exactly one id
    val a = ranked.select(col("id").as("ida"), col("rn"))
    val b = ranked.select(col("k"), col("rn"))
    val joined = a.join(b, "rn")
    assert(joined.count() == 4000L, "rank sets must agree between consumers")
    // and the ranks must equal the driver-computed total order
    val got = ranked.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expect = (1L to 4000L).map(i => (i, s"k${i % 7}"))
      .sortBy { case (i, k) => (k, i) }.zipWithIndex
      .map { case ((i, _), ix) => i -> (ix + 1L) }.toMap
    assert(got == expect)
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("temperatureMix: hand-checked quotas at T=1/T=2, uniform limit, " +
       "deterministic draw") {
    import spark.implicits._
    // domains a: 400 rows, b: 100, c: 25 — perfect squares so sqrt shares
    // are exact rationals and the hand floor arithmetic is unambiguous
    val df = ((1L to 400L).map(i => (i, "a")) ++
      (401L to 500L).map(i => (i, "b")) ++
      (501L to 525L).map(i => (i, "c"))).toDF("id", "dom")
    def quotas(t: Double, n: Long) =
      Scale.temperatureQuotas(df, "dom", n, t).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    // T=1: natural proportions — floor(400/525*105)=80, 100/525*105=20, 5
    assert(quotas(1.0, 105L) ==
      Map("a" -> ((400L, 80L)), "b" -> ((100L, 20L)), "c" -> ((25L, 5L))))
    // T=2: sqrt weights 20/10/5 -> shares 4/7, 2/7, 1/7 of 70 = 40/20/10
    assert(quotas(2.0, 70L) ==
      Map("a" -> ((400L, 40L)), "b" -> ((100L, 20L)), "c" -> ((25L, 10L))))
    // T -> inf approaches uniform over domains (floor may shave one off a
    // share that is epsilon under 1/3 — pow(n, ~0) is only approximately 1)
    val qInf = quotas(1e9, 90L)
    assert(qInf.values.forall(q => q._2 == 29L || q._2 == 30L) &&
      qInf.values.map(_._2).sum <= 90L, qInf.toString)
    // the draw: exactly quota rows per domain, the hash-smallest ids,
    // deterministic across runs and repartitionings
    val s1 = Scale.temperatureMix(df, "dom", "id", 70L, 2.0)
    val sizes = s1.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("a" -> 40L, "b" -> 20L, "c" -> 10L))
    TestSpark.assertSameRows(s1,
      Scale.temperatureMix(df.repartition(13), "dom", "id", 70L, 2.0))
    // a different seed draws a different sample
    assert(TestSpark.sortedRows(s1.select("id")) != TestSpark.sortedRows(
      Scale.temperatureMix(df, "dom", "id", 70L, 2.0, seed = "7")
        .select("id")))
    assertThrows[IllegalArgumentException](
      Scale.temperatureQuotas(df, "dom", 0L, 2.0))
    assertThrows[IllegalArgumentException](
      Scale.temperatureQuotas(df, "dom", 10L, 0.0))
  }

  test("quantileBuckets: equal-depth floor partitioning per group, " +
       "deterministic under repartitioning") {
    import spark.implicits._
    // group a: 9 rows -> terciles of exactly 3; group b: 7 rows -> floor
    // arithmetic gives sizes 3/2/2 (buckets start at ranks 1, 4, 6:
    // floor((rk-1)*3/7) flips at rk 4 and 6)
    val df = ((1L to 9L).map(i => (i, "a", i * 10.0)) ++
      (101L to 107L).map(i => (i, "b", i * 1.0))).toDF("id", "g", "x")
    val got = Scale.quantileBuckets(df, Seq("g"),
        Seq(col("x"), col("id")), nBuckets = 3)
      .collect().map(r => (r.getLong(0) -> r.getLong(3))).toMap
    assert((1L to 9L).forall(i => got(i) == (i - 1) / 3), got.toString)
    assert(Seq(101L, 102L, 103L).forall(got(_) == 0L) &&
      Seq(104L, 105L).forall(got(_) == 1L) &&
      Seq(106L, 107L).forall(got(_) == 2L), got.toString)
    // invariance + schema: input columns preserved, bucket appended
    val again = Scale.quantileBuckets(df.repartition(7), Seq("g"),
      Seq(col("x"), col("id")), nBuckets = 3)
    assert(again.columns.toSeq == Seq("id", "g", "x", "bucket"))
    TestSpark.assertSameRows(
      Scale.quantileBuckets(df, Seq("g"), Seq(col("x"), col("id")), 3), again)
    // nBuckets = 1 puts everything in bucket 0; guard rejects 0
    assert(Scale.quantileBuckets(df, Seq("g"), Seq(col("id")), 1)
      .filter(col("bucket") =!= 0L).count() == 0L)
    assertThrows[IllegalArgumentException](
      Scale.quantileBuckets(df, Seq("g"), Seq(col("id")), 0))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("quantileBoundaries + assignByBoundaries: frozen cutoffs reproduce " +
       "the rank split and serve new rows") {
    import spark.implicits._
    // group a: values 10..60 over 6 rows, k=3 -> buckets {0,0,1,1,2,2};
    // boundaries = first value of buckets 1 and 2: 30 and 50.
    // group b: one row -> no boundaries (fewer rows than buckets)
    val df = ((1L to 6L).map(i => (i, "a", i * 10.0)) :+ (101L, "b", 7.0))
      .toDF("id", "g", "x")
    val bnd = Scale.quantileBoundaries(df, Seq("g"),
      Seq(col("x"), col("id")), col("x"), nBuckets = 3)
    val b = bnd.collect().map(r =>
      (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(b == Map(("a", 1L) -> 30.0, ("a", 2L) -> 50.0), b.toString)
    // assigning the TRAINING rows by comparison reproduces the rank split
    // exactly when values are unique
    val back = Scale.assignByBoundaries(df, Seq("g"), col("x"), bnd)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val rank = Scale.quantileBuckets(df, Seq("g"),
        Seq(col("x"), col("id")), nBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(back == rank, s"$back vs $rank")
    // new rows: strictly-below -> 0, tie-at-boundary -> upper bucket,
    // between -> 1, above-all -> 2; group with no boundaries -> 0
    val fresh = Seq((900L, "a", 5.0), (901L, "a", 30.0), (902L, "a", 42.0),
      (903L, "a", 99.0), (904L, "b", 1000.0)).toDF("id", "g", "x")
    val asg = Scale.assignByBoundaries(fresh, Seq("g"), col("x"), bnd)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(asg == Map(900L -> 0L, 901L -> 1L, 902L -> 1L, 903L -> 2L,
      904L -> 0L), asg.toString)
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("temperatureMixEpochs: full-epoch repetition + partial-epoch draw, " +
       "quota identity, degenerate equivalence to temperatureMix") {
    import spark.implicits._
    val df = ((1L to 400L).map(i => (i, "a")) ++
      (401L to 500L).map(i => (i, "b")) ++
      (501L to 525L).map(i => (i, "c"))).toDF("id", "dom")
    // T=2 sqrt weights 20/10/5 -> shares 4/7, 2/7, 1/7; totalN=700 gives
    // quotas 400/200/100 = exactly 1/2/4 epochs with zero remainder
    val qe = Scale.temperatureQuotasEpochs(df, "dom", 700L, 2.0).collect()
      .map(r => r.getAs[String]("dom") ->
        (r.getAs[Long]("quota"), r.getAs[Long]("epochs_full"),
         r.getAs[Long]("remainder"), r.getAs[Double]("epochs"))).toMap
    assert(qe == Map("a" -> ((400L, 1L, 0L, 1.0)),
      "b" -> ((200L, 2L, 0L, 2.0)), "c" -> ((100L, 4L, 0L, 4.0))), qe.toString)
    val m700 = Scale.temperatureMixEpochs(df, "dom", "id", 700L, 2.0)
    val cnt700 = m700.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cnt700 == Map("a" -> 400L, "b" -> 200L, "c" -> 100L))
    // full epochs contain EVERY domain row: c at epochs 0..3 x all 25 ids
    val cRows = m700.filter(col("dom") === "c")
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cRows.toSet ==
      (for (i <- 501L to 525L; e <- 0L to 3L) yield (i, e)).toSet)
    // partial epochs: totalN=730 -> quotas 417/208/104 (fractional shares
    // .14/.57/.28 — safely off the floor boundary), remainders 17/8/4
    val qp = Scale.temperatureQuotasEpochs(df, "dom", 730L, 2.0).collect()
      .map(r => r.getAs[String]("dom") ->
        (r.getAs[Long]("quota"), r.getAs[Long]("n_rows"),
         r.getAs[Long]("epochs_full"), r.getAs[Long]("remainder"))).toMap
    assert(qp.values.forall { case (q, n, ef, rem) => ef * n + rem == q },
      s"quota identity must hold: $qp")
    assert(qp("a") == ((417L, 400L, 1L, 17L)) &&
      qp("b") == ((208L, 100L, 2L, 8L)) &&
      qp("c") == ((104L, 25L, 4L, 4L)), qp.toString)
    val m730 = Scale.temperatureMixEpochs(df, "dom", "id", 730L, 2.0)
    val part = m730.filter(col("dom") === "a" && col("epoch") === 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(part.size == 17 &&
      m730.filter(col("dom") === "a").count() == 417L)
    // deterministic under repartitioning
    TestSpark.assertSameRows(m730,
      Scale.temperatureMixEpochs(df.repartition(13), "dom", "id", 730L, 2.0))
    // quotas under domain sizes degenerate to temperatureMix + epoch 0
    val eps = Scale.temperatureMixEpochs(df, "dom", "id", 70L, 2.0)
    assert(eps.filter(col("epoch") =!= 0L).count() == 0L)
    TestSpark.assertSameRows(eps.drop("epoch"),
      Scale.temperatureMix(df, "dom", "id", 70L, 2.0))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("weightedSampleBy: k per group, deterministic, weight-responsive") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val s1 = Scale.weightedSampleBy(cust, Seq("c_mktsegment"), "c_custkey",
      col("c_acctbal") + lit(1000.0), k = 10)
    // exactly k per group (every segment has >= 10 customers at sf0.001)
    val sizes = s1.groupBy("c_mktsegment").count().collect()
    assert(sizes.nonEmpty && sizes.forall(_.getLong(1) == 10L))
    // pure function of (id, seed): a re-run draws the identical sample
    val s2 = Scale.weightedSampleBy(cust, Seq("c_mktsegment"), "c_custkey",
      col("c_acctbal") + lit(1000.0), k = 10)
    TestSpark.assertSameRows(s1.select("c_custkey"), s2.select("c_custkey"))
    // and a different seed draws a different one
    val s3 = Scale.weightedSampleBy(cust, Seq("c_mktsegment"), "c_custkey",
      col("c_acctbal") + lit(1000.0), k = 10, seed = "7")
    assert(TestSpark.sortedRows(s1.select("c_custkey")) !=
           TestSpark.sortedRows(s3.select("c_custkey")))
    // weight dominance: one row with overwhelming weight is always drawn
    // (u^(1/w) -> 1 as w -> inf)
    import spark.implicits._
    val skew = (1L to 500L).map(i => (i, if (i == 137L) 1e12 else 1.0))
      .toDF("id", "w")
    val drawn = Scale.weightedSampleBy(skew, Nil, "id", col("w"), k = 5)
      .select("id").as[Long].collect().toSet
    assert(drawn.contains(137L), s"weight-1e12 row must be sampled: $drawn")
  }

  test("weightedSampleBy edge cases: k >= group size keeps the group; zorder bounds enforced") {
    import spark.implicits._
    val tiny = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 1.0))
      .toDF("id", "g", "w")
    val all = Scale.weightedSampleBy(tiny, Seq("g"), "id", col("w"), k = 10)
    assert(all.count() == 3L)
    assertThrows[IllegalArgumentException](
      Scale.weightedSampleBy(tiny, Seq("g"), "id", col("w"), k = 0))
    assertThrows[IllegalArgumentException](
      Scale.zorderValue(Seq(col("id")), 8))            // < 2 columns
    assertThrows[IllegalArgumentException](
      Scale.zorderValue(Seq(col("id"), col("w"), col("id")), 22)) // 66 bits
    assertThrows[IllegalArgumentException](
      Scale.zorderQuantize(col("w"), 5.0, 5.0, 4))     // hi == lo
  }

  test("weightedSampleBy plans as a partial WindowGroupLimit (no full sort-per-group survives the map side)") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val plan = Scale.weightedSampleBy(cust, Seq("c_mktsegment"), "c_custkey",
      col("c_acctbal") + lit(1000.0), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("zorderValue interleaves bits (Morton order)") {
    import spark.implicits._
    // x=0b101, y=0b011, 3 bits: x bits land at 0,2,4 -> 1+0+16 = 17;
    // y bits at 1,3,5 -> 2+8+0 = 10; z = 27
    val row = Seq((5L, 3L)).toDF("x", "y")
      .select(Scale.zorderValue(Seq(col("x"), col("y")), 3).as("z"))
      .collect()(0).getLong(0)
    assert(row === 27L)
    // quantize clamps to [0, 2^bits)
    val q = Seq((-5.0, 999.0)).toDF("lo", "hi")
      .select(Scale.zorderQuantize(col("lo"), 0.0, 100.0, 4).as("a"),
              Scale.zorderQuantize(col("hi"), 0.0, 100.0, 4).as("b"))
      .collect()(0)
    assert(q.getLong(0) === 0L && q.getLong(1) === 15L)
  }

  test("zoneMaps: equal-depth zones, exact envelopes, skip arithmetic") {
    import spark.implicits._
    // 0..999 keyed rows, layout = key order, 10 zones of exactly 100 rows:
    // zone z envelopes [100z, 100z+99]
    val df = spark.range(1000).select(col("id"),
      (col("id") * 7 % 13).as("noise"))
    val zm = Scale.zoneMaps(df, Seq(col("id")), 10, Seq("id"))
      .orderBy("zone").collect()
    assert(zm.length === 10)
    for ((r, z) <- zm.zipWithIndex) {
      assert(r.getLong(zm(0).fieldIndex("zone")) === z.toLong)
      assert(r.getLong(r.fieldIndex("cnt")) === 100L)
      assert(r.getLong(r.fieldIndex("id_min")) === z * 100L)
      assert(r.getLong(r.fieldIndex("id_max")) === z * 100L + 99L)
    }
    // skip estimate: range [250, 340] overlaps zones 2 and 3 only -> 8 skip
    val sk = Scale.skipEstimate(
      Scale.zoneMaps(df, Seq(col("id")), 10, Seq("id")),
      "id", lit(250), lit(340)).collect()(0)
    assert(sk.getLong(0) === 10L && sk.getLong(1) === 8L)
    // partition invariance (two-phase row number, not a lucky layout)
    TestSpark.assertSameRows(
      Scale.zoneMaps(df, Seq(col("id")), 10, Seq("id", "noise")),
      Scale.zoneMaps(df.repartition(7), Seq(col("id")), 10,
        Seq("id", "noise")))
    // more zones than rows: zones are single rows, no empties fabricated
    val tiny = spark.range(3).toDF("id")
    assert(Scale.zoneMaps(tiny, Seq(col("id")), 8, Seq("id")).count() === 3L)
    assertThrows[IllegalArgumentException](
      Scale.zoneMaps(df, Seq(col("id")), 0, Seq("id")))
  }

  test("zorderBy bounds the per-partition envelope in BOTH dimensions") {
    import spark.implicits._
    // 64x64 grid, 16 range partitions. A z-curve slice is a union of small
    // tiles, so MOST partitions have tight x AND y ranges (the few slices
    // straddling a quadrant boundary are the known exception); an x-sorted
    // layout leaves y at the full range 63 in EVERY partition.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y").repartition(8)
    def meanEnvelope(laid: org.apache.spark.sql.DataFrame): Double = {
      val spans = laid.withColumn("p", spark_partition_id())
        .groupBy("p").agg(
          (max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect()
      spans.map(r => math.max(r.getLong(1), r.getLong(2)).toDouble)
        .sum / spans.length
    }
    val zEnv = meanEnvelope(
      Scale.zorderBy(grid, Seq(col("x"), col("y")), 6, numPartitions = 16))
    val xEnv = meanEnvelope(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    assert(xEnv > 60, s"x-sorted layout should leave y unbounded: $xEnv")
    assert(zEnv <= xEnv / 2, s"z-order mean envelope $zEnv vs x-sorted $xEnv")
    // the layout is a range exchange + local sort, never a global sort
    val plan = Scale.zorderBy(grid, Seq(col("x"), col("y")), 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("Sort [") || !plan.contains("global=true"), plan)
  }

  test("z-order layout ON DISK: parquet row-group stats prune the range scan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // the end-to-end proof behind skipEstimate's arithmetic: write the SAME
    // rows in a Z-ordered vs a hash-scattered layout (16 files each, one
    // row group per file at this size), re-read with a narrow range
    // predicate, and read the SCAN's numOutputRows — rows surviving
    // parquet's row-group min/max pruning of the pushed filter. Z-ordered
    // files carry tight per-dimension envelopes, so most row groups are
    // skipped; every hash file straddles the band, so none are.
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val ckHi = o.agg(max("o_custkey")).head().getLong(0).toDouble + 1.0
    val tpHi = o.agg(max("o_totalprice")).head().getDouble(0) + 1.0
    // quantize over the ACTUAL data envelope so the curve discriminates
    val zcols = Seq(Scale.zorderQuantize(col("o_custkey"), 0.0, ckHi, 8),
                    Scale.zorderQuantize(col("o_totalprice"), 0.0, tpHi, 8))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Scale.zorderBy(o, zcols, 8, numPartitions = 16)
      .write.mode("overwrite").parquet(s"$tmp/zorder")
    o.repartition(16).write.mode("overwrite").parquet(s"$tmp/hash")
    val (lo, hi) = (math.ceil(ckHi * 0.1).toLong, math.floor(ckHi * 0.2).toLong)
    def scanned(path: String): (Long, Set[Long]) = {
      val q = spark.read.parquet(path)
        .filter(col("o_custkey").between(lo, hi))
        .select("o_orderkey", "o_custkey")
      val keys = q.collect().map(_.getLong(0)).toSet
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case f: FileSourceScanExec    => Seq(f)
        case other => (other.children ++ other.subqueries).flatMap(scans)
      }
      val n = scans(q.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
      (n, keys)
    }
    val (zRows, zKeys) = scanned(s"$tmp/zorder")
    val (hRows, hKeys) = scanned(s"$tmp/hash")
    assert(zKeys === hKeys, "layouts must return identical results")
    assert(zKeys.nonEmpty)
    assert(hRows === o.count(), s"hash layout should prune nothing: $hRows")
    assert(zRows <= hRows / 2,
      s"z-order scan read $zRows rows vs hash $hRows — expected real pruning")
  }

  private def docsSized() = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))
    .withColumn("shard", expr("doc_id div 20"))
    .withColumn("n_tok",
      graft.text.TextFns.tokenCount(col("text")).cast("long"))

  private def shardFiles(path: String, shard: Long) = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files
      .walk(java.nio.file.Paths.get(path, "data", s"shard=$shard"))
      .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
      .map(p => p.getFileName.toString ->
        (java.nio.file.Files.size(p),
         java.nio.file.Files.getLastModifiedTime(p).toMillis))
      .toMap
  }

  test("resyncShardsDelta: touched tail shards rewrite, untouched shards " +
      "never read or written (files byte-identical, scan shard-pruned), " +
      "manifest rows carry forward verbatim, export == full corpus") {
    val base = docsSized() // ids 0..499, shards 0..24
    val fp = graft.ops.Sketch.portableHash(col("text"))
    val dirP = java.nio.file.Files.createTempDirectory("graft-rsd")
    val path = dirP.toString
    try {
      // export the < 390 prefix: shards 0..18 full, 19 partial (380-389)
      Scale.writeShardsWithManifest(base.filter(col("doc_id") < 390),
        path, "shard", "doc_id", col("n_tok"), fp)
      val before0 = shardFiles(path, 0L)
      val before18 = shardFiles(path, 18L)
      val manBefore = spark.read.parquet(s"$path/manifest")
        .filter(col("shard") < 19)
        .collect().map(r => r.getAs[Long]("shard") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("fingerprint"))).toMap
      // growth: ids >= 390 — the caller hands the FULL new content of
      // exactly the touched shards (19 grown, 20..24 new)
      val diff = Scale.resyncShardsDelta(spark,
          base.filter(col("shard") >= 19), path, "shard", "doc_id",
          col("n_tok"), fp)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(diff(19L) == "changed", diff.toString)
      assert((20L to 24L).forall(diff(_) == "added"), diff.toString)
      assert(!diff.contains(0L) && !diff.contains(18L),
        s"untouched shards must not appear in the receipt: $diff")
      // untouched shard files byte-identical (never rewritten)
      assert(shardFiles(path, 0L) == before0)
      assert(shardFiles(path, 18L) == before18)
      // untouched manifest rows carried forward verbatim
      val manAfter = spark.read.parquet(s"$path/manifest")
        .filter(col("shard") < 19)
        .collect().map(r => r.getAs[Long]("shard") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("fingerprint"))).toMap
      assert(manAfter == manBefore)
      // the export now holds EXACTLY the full corpus
      val ver = Scale.verifyShards(spark, path, "shard", "doc_id",
          col("n_tok"), fp)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(ver.size == 25 && ver.values.forall(_ == "unchanged"),
        s"delta-resynced export must verify: $ver")
      // the rider's standing-read pattern over the export is SHARD-PRUNED:
      // an isin filter on the touched keys opens only their partitions
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val probe = spark.read.parquet(s"$path/data")
        .filter(col("shard").isin(19L, 20L))
      // collect(), not count(): metrics populate only on THIS dataset's
      // own QueryExecution (count() wraps a new one and reads 0)
      probe.collect()
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case f: FileSourceScanExec    => Seq(f)
        case other => (other.children ++ other.subqueries).flatMap(scans)
      }
      val filesRead = scans(probe.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
      import scala.jdk.CollectionConverters._
      val totalFiles = java.nio.file.Files
        .walk(java.nio.file.Paths.get(path, "data"))
        .iterator().asScala
        .count(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
      assert(filesRead > 0 && filesRead <= 2L * (totalFiles / 25 + 1) &&
        filesRead < totalFiles,
        s"standing read opened $filesRead of $totalFiles files — not pruned")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("resyncShardsDelta crash windows: bootstrap is DATA-FIRST (a crash " +
      "before the manifest leaves no manifest — the replay completes, " +
      "never all-unchanged over missing data); a crashed grown-tail " +
      "rewrite is repaired by the rerun") {
    val base = docsSized()
    val fp = graft.ops.Sketch.portableHash(col("text"))
    import scala.jdk.CollectionConverters._
    def rmTree(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    val dirP = java.nio.file.Files.createTempDirectory("graft-rsd-crash")
    val path = dirP.toString
    try {
      // BOOTSTRAP CRASH (the round-17 advisory's window): data landed,
      // manifest did not — reconstruct by bootstrapping via the delta
      // verb, then deleting the manifest
      Scale.resyncShardsDelta(spark, base.filter(col("doc_id") < 390),
        path, "shard", "doc_id", col("n_tok"), fp)
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "manifest")))
      rmTree(java.nio.file.Paths.get(path, "manifest"))
      // replay: with NO manifest the whole touched set diffs as 'added'
      // (absence is authoritative), the data rewrite is idempotent, and
      // the manifest completes — the export cannot silently serve a hole
      val replay = Scale.resyncShardsDelta(spark,
          base.filter(col("doc_id") < 390), path, "shard", "doc_id",
          col("n_tok"), fp)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(replay.values.forall(_ == "added"), replay.toString)
      val ver0 = Scale.verifyShards(spark, path, "shard", "doc_id",
          col("n_tok"), fp)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(ver0.nonEmpty && ver0.values.forall(_ == "unchanged"), s"$ver0")
      // GROWN-TAIL CRASH: the delta's data write landed but the manifest
      // replace did not — old manifest stays authoritative, the rerun
      // recomputes the same touched diff and completes
      val manCopy = dirP.resolve("man_copy")
      java.nio.file.Files.walk(java.nio.file.Paths.get(path, "manifest"))
        .iterator().asScala.foreach { p =>
          val t = manCopy.resolve(
            java.nio.file.Paths.get(path, "manifest").relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(t)
          else java.nio.file.Files.copy(p, t)
        }
      val growth = base.filter(col("shard") >= 19)
      val orig = Scale.resyncShardsDelta(spark, growth, path, "shard",
          "doc_id", col("n_tok"), fp)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // crash state: restore the pre-growth manifest (data stays grown)
      rmTree(java.nio.file.Paths.get(path, "manifest"))
      java.nio.file.Files.walk(manCopy).iterator().asScala.foreach { p =>
        val t = java.nio.file.Paths.get(path, "manifest")
          .resolve(manCopy.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      }
      val rerun = Scale.resyncShardsDelta(spark, growth, path, "shard",
          "doc_id", col("n_tok"), fp)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rerun == orig,
        s"rerun must recompute the same touched diff: $rerun vs $orig")
      val ver = Scale.verifyShards(spark, path, "shard", "doc_id",
          col("n_tok"), fp)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(ver.size == 25 && ver.values.forall(_ == "unchanged"), s"$ver")
    } finally {
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("compactBatchStore: folded partitions merge into the base, newer " +
      "partitions stay addressable, rows exact; concurrent writers are " +
      "refused on the sibling lease; a sealed crashed staging recovers") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val dirP = java.nio.file.Files.createTempDirectory("graft-bsc")
    val path = s"$dirP/store"
    try {
      (0 to 3).foreach { b =>
        docs.filter(pmod(col("doc_id"), lit(4)) === b)
          .withColumn("batch_seq", lit(b.toLong))
          .write.partitionBy("batch_seq")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(path)
      }
      val beforeRows = spark.read.parquet(path)
        .select(col("doc_id"), col("lang")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      Scale.compactBatchStore(spark, path, upToSeq = 2L)
      import scala.jdk.CollectionConverters._
      def parts() = java.nio.file.Files
        .list(java.nio.file.Paths.get(path)).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("batch_seq="))
        .toSet
      assert(parts() == Set("batch_seq=-1", "batch_seq=3"), parts().toString)
      val after = spark.read.parquet(path)
      assert(after.select(col("doc_id"), col("lang")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet == beforeRows)
      // fold labels: batches 0..2 in the base, batch 3 kept
      assert(after.filter(col("batch_seq") === -1)
        .select("doc_id").collect()
        .forall(_.getLong(0) % 4 <= 2))
      // a second compaction folding the rest merges WITH the base
      Scale.compactBatchStore(spark, path, upToSeq = 3L)
      assert(parts() == Set("batch_seq=-1"))
      assert(spark.read.parquet(path).select(col("doc_id"), col("lang"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .toSet == beforeRows)
      // concurrent-writer refusal on the SIBLING lease root (the store
      // dir itself is swapped wholesale, so the lease lives beside it)
      graft.ops.Lease.take(spark, s"$path.maint", "test-holder")
      val e = intercept[IllegalStateException] {
        Scale.compactBatchStore(spark, path, upToSeq = 3L)
      }
      assert(e.getMessage.contains("MAINTENANCE"), e.getMessage)
      graft.ops.Lease.release(spark, s"$path.maint")
      // crashed swap: a marker-sealed staging with no target promotes on
      // the next open (the CarryState.replaceDir discipline)
      val target = java.nio.file.Paths.get(path)
      val staging = java.nio.file.Paths.get(s"$path.staging")
      java.nio.file.Files.move(target, staging)
      // the marker may already ride along (every completed replaceDir
      // leaves one inside the promoted dir)
      if (!java.nio.file.Files.exists(staging.resolve("_COMMITTED")))
        java.nio.file.Files.createFile(staging.resolve("_COMMITTED"))
      Scale.compactBatchStore(spark, path, upToSeq = 3L) // recovers, no-op
      assert(spark.read.parquet(path).select(col("doc_id"), col("lang"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .toSet == beforeRows)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("maintenance lease heartbeat: a holder outliving the stale TTL " +
      "keeps its lease alive (renewals, not taken-at, decide staleness); " +
      "simultaneous takers get the friendly refusal; release is clean") {
    val dirP = java.nio.file.Files.createTempDirectory("graft-leasehb")
    val root = dirP.toString
    val savedTtl = graft.ops.Lease.staleLeaseMs
    try {
      graft.ops.Lease.staleLeaseMs = 3000L
      @volatile var insideOk = false
      graft.ops.Lease.withLease(spark, root, "long-maintenance") {
        // outlive the TTL: without the heartbeat the concurrent check
        // below would CLEAR the live lease (the round-17 advisory's
        // silent data-loss race); with it the lease stays refused
        Thread.sleep(7000L)
        val e = intercept[IllegalStateException] {
          graft.ops.Lease.check(spark, root, "concurrent-ingest")
        }
        insideOk = e.getMessage.contains("MAINTENANCE")
        // and a second taker is refused with the friendly message too
        val e2 = intercept[IllegalStateException] {
          graft.ops.Lease.take(spark, root, "second-compactor")
        }
        assert(e2.getMessage.contains("MAINTENANCE"), e2.getMessage)
      }
      assert(insideOk, "the heartbeated lease must refuse while held")
      // released on exit: the next take succeeds immediately
      graft.ops.Lease.take(spark, root, "next-holder")
      graft.ops.Lease.release(spark, root)
    } finally {
      graft.ops.Lease.staleLeaseMs = savedTtl
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
