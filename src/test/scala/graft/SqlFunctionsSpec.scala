package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextFns
import graft.ml.{Dedup, Similarity}

/** The SQL registration path must reach the same codegen'd kernels as the
  * Scala DSL: every function is checked value-equal between `spark.sql` text
  * and the DSL formulation.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    graft.sql.GraftFunctions.register(s)
    s
  }
  import spark.implicits._

  test("shingle_hash from SQL equals the DSL expression") {
    val df = Seq("the quick brown fox jumps", "a b", "").toDF("text")
    df.createOrReplaceTempView("t_sh")
    val sql = spark.sql("SELECT shingle_hash(text, 3) AS h FROM t_sh").collect()
    val dsl = df.select(TextFns.shingleHashes(col("text"), 3).as("h")).collect()
    assert(sql.map(_.getSeq[Long](0).toSet).toSeq == dsl.map(_.getSeq[Long](0).toSet).toSeq)
    // default n
    assert(spark.sql("SELECT shingle_hash('a b c d')").head().getSeq[Long](0).size == 2)
  }

  test("dot_product and array_eq_count from SQL equal the DSL expressions") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    df.createOrReplaceTempView("t_dp")
    assert(spark.sql("SELECT dot_product(a, b) AS d FROM t_dp").head().getDouble(0) == 32.0)
    assert(spark.sql(
      "SELECT array_eq_count(array(1L,2L,3L), array(1L,9L,3L)) AS c").head().getInt(0) == 2)
  }

  test("char_stats and repetition_stats from SQL equal the DSL expressions") {
    val df = Seq("a b a b a", "x\nx\ny").toDF("text")
    df.createOrReplaceTempView("t_cs")
    val sqlCs = spark.sql("SELECT char_stats(text) AS s FROM t_cs").collect()
    val dslCs = df.select(TextFns.charStats(col("text")).as("s")).collect()
    assert(sqlCs.map(_.toString).toSeq == dslCs.map(_.toString).toSeq)
    val sqlRs = spark.sql("SELECT repetition_stats(text) AS s FROM t_cs").collect()
    val dslRs = df.select(TextFns.repetitionStats(col("text")).as("s")).collect()
    assert(sqlRs.map(_.toString).toSeq == dslRs.map(_.toString).toSeq)
  }

  test("minhash_agg from SQL equals the DSL aggregate") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "zz yy xx ww vv"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("t_mh")
    val sql = spark.sql(
      """SELECT doc_id AS id, minhash_agg(hx, 16, 42) AS sig
        |FROM (SELECT doc_id, explode(shingle_hash(text, 3)) AS hx FROM t_mh)
        |GROUP BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val dsl = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 16, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sql == dsl)
  }

  test("literal-argument validation raises a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT t.c FROM (SELECT shingle_hash('a b c', length('xx')) AS c) t").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("shingle_hash"))
  }

  test("DESCRIBE FUNCTION shows name and usage in the right slots") {
    // regression: the 3-arg ExpressionInfo constructor is (className, db,
    // name) — usage passed there scrambled DESCRIBE output
    val rows = spark.sql("DESCRIBE FUNCTION shingle_hash")
      .collect().map(_.getString(0))
    assert(rows.exists(_.contains("Function: shingle_hash")), rows.mkString("\n"))
    assert(rows.exists(_.contains("shingle_hash(text[, n])")), rows.mkString("\n"))
  }

  test("SQL macros (clean_text/redact_pii/...) equal their Column-API twins") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.sql.GraftFunctions.registerSqlMacros(spark)
    val d = Seq(
      "<p>Hi</p> mail a.b@c.io call +1 (555) 123-4567 at https://x.y/z 1.2.3.4",
      "ssn 123-45-6789 and   spaced   text",
      "plain").toDF("s")
    d.createOrReplaceTempView("macro_probe")
    val viaSql = spark.sql(
      """SELECT clean_text(s) AS c, redact_pii(s) AS r, strip_html(s) AS h,
        |strip_urls(s) AS u, ws_token_count(s) AS n FROM macro_probe""".stripMargin)
    val viaCols = d.select(
      graft.text.TextFns.cleanText(col("s")).as("c"),
      graft.text.TextFns.redactPii(col("s")).as("r"),
      graft.text.TextFns.stripHtml(col("s")).as("h"),
      graft.text.TextFns.stripUrls(col("s")).as("u"),
      graft.text.TextFns.tokenCount(col("s")).cast("long").as("n"))
    assert(viaSql.exceptAll(viaCols).isEmpty && viaCols.exceptAll(viaSql).isEmpty)
  }

  test("retrieval macros: SQL-composed bm25/tfidf/rrf equal the Scala verbs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.sql.GraftFunctions.registerSqlMacros(spark)
    val docs = Seq(
      (1L, "apple banana apple kiwi"),
      (2L, "banana cherry banana date"),
      (3L, "cherry cherry cherry date fig"),
      (4L, "kiwi fig date plum apple")).toDF("doc_id", "text")
    val queries = Seq((10L, "apple cherry"), (11L, "date kiwi")).toDF("qid", "qt")
    docs.createOrReplaceTempView("ret_docs")
    queries.createOrReplaceTempView("ret_queries")
    // full bm25 ranking in pure SQL: postings + corpus stats + bm25_score,
    // mirroring Search.bm25's tokenization (ws split of trimmed lowercase)
    val viaSql = spark.sql(
      """WITH tok AS (SELECT doc_id, split(trim(lower(text)), '\\s+') AS w
        |  FROM ret_docs),
        |post AS (SELECT doc_id, CAST(size(w) AS BIGINT) AS dl,
        |    term, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok LATERAL VIEW explode(w) AS term
        |  GROUP BY doc_id, dl, term),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM post GROUP BY term),
        |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(size(split(trim(lower(text)), '\\s+'))) AS BIGINT) AS sum_dl
        |  FROM ret_docs),
        |qterm AS (SELECT qid AS query_id, term
        |  FROM ret_queries
        |  LATERAL VIEW explode(array_distinct(split(trim(lower(qt)), '\\s+')))
        |    AS term),
        |scored AS (SELECT query_id, doc_id AS id,
        |    round(sum(bm25_score(tf, df, dl, n_docs, sum_dl, 1.2d, 0.75d)), 4)
        |      AS score
        |  FROM qterm JOIN post USING (term) JOIN dfreq USING (term)
        |  CROSS JOIN corpus
        |  GROUP BY query_id, doc_id)
        |, ranked AS (SELECT query_id, id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, id) AS BIGINT) AS rank
        |FROM scored)
        |SELECT * FROM ranked WHERE rank <= 10""".stripMargin)
    val viaScala = graft.text.Search.bm25(docs, "doc_id", "text",
      queries, "qid", "qt", k1 = 1.2, b = 0.75, topK = 10)
    TestSpark.assertSameRows(viaSql, viaScala, "bm25 sql vs scala")
    // tfidf_score against tfidfTerms' per-term scores
    val viaSqlTfidf = spark.sql(
      """WITH tok AS (SELECT doc_id, split(trim(lower(text)), '\\s+') AS w
        |  FROM ret_docs),
        |post AS (SELECT doc_id AS id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok LATERAL VIEW explode(w) AS term GROUP BY doc_id, term),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM post GROUP BY term),
        |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM ret_docs),
        |s AS (SELECT id, term, round(tfidf_score(tf, df, n_docs), 4) AS score
        |  FROM post JOIN dfreq USING (term) CROSS JOIN corpus)
        |, ranked AS (SELECT id, term, score,
        |  CAST(row_number() OVER (PARTITION BY id
        |    ORDER BY score DESC, term) AS BIGINT) AS rank
        |FROM s)
        |SELECT * FROM ranked WHERE rank <= 3""".stripMargin)
    val viaScalaTfidf = graft.text.Search.tfidfTerms(docs, "doc_id", "text",
      topK = 3)
    TestSpark.assertSameRows(viaSqlTfidf, viaScalaTfidf, "tfidf sql vs scala")
    // rrf_term against rrfFuse on two lists
    val l1 = viaScala.where(col("query_id") === 10L)
      .select(col("query_id"), col("id"), col("rank"))
    val l2 = viaScala.where(col("query_id") === 11L)
      .select(lit(10L).as("query_id"), col("id"), col("rank"))
    l1.createOrReplaceTempView("rrf_l1"); l2.createOrReplaceTempView("rrf_l2")
    val viaSqlRrf = spark.sql(
      """WITH t AS (SELECT query_id, id, rrf_term(rank, 60) AS tm FROM rrf_l1
        |  UNION ALL SELECT query_id, id, rrf_term(rank, 60) FROM rrf_l2),
        |f AS (SELECT query_id, id, sum(tm) AS s,
        |    CAST(count(*) AS BIGINT) AS n_lists
        |  FROM t GROUP BY query_id, id)
        |, ranked AS (SELECT query_id, id, round(s, 6) AS rrf, n_lists,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY s DESC, id) AS BIGINT) AS rank
        |FROM f)
        |SELECT * FROM ranked WHERE rank <= 10""".stripMargin)
    val viaScalaRrf = graft.text.Search.rrfFuse(Seq(l1, l2), k0 = 60, topK = 10)
    TestSpark.assertSameRows(viaSqlRrf, viaScalaRrf, "rrf sql vs scala")
  }

  test("DESCRIBE FUNCTION shows the retrieval macros") {
    graft.sql.GraftFunctions.registerSqlMacros(spark)
    for (fn <- Seq("bm25_score", "tfidf_score", "rrf_term")) {
      val d = spark.sql(s"DESCRIBE FUNCTION $fn").collect().map(_.getString(0))
      assert(d.exists(_.contains(fn)), s"$fn: ${d.mkString("|")}")
    }
  }

  test("text macros (quality_score/lang_id) equal their Column-API twins") {
    graft.sql.GraftFunctions.registerSqlMacros(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("sq9t_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, quality_score(text) AS q, lang_id(text) AS l
        |FROM sq9t_docs""".stripMargin)
    val viaCol = docs.select(col("doc_id"),
      graft.text.TextFns.qualityScore(col("text")).as("q"),
      graft.text.TextFns.langId(col("text")).as("l"))
    TestSpark.assertSameRows(viaSql, viaCol, "quality_score/lang_id")
    // cascade edges: zero stopword hits -> 'und'; de text routes de
    val edge = spark.sql(
      """SELECT lang_id('zzz qqq xxx') AS a,
        |  lang_id('der hund und die katze ist das') AS b,
        |  quality_score('1234 5678') AS c""".stripMargin).collect()(0)
    assert(edge.getString(0) === "und" && edge.getString(1) === "de")
    assert(edge.getDouble(2) < 0.9)
  }

  test("round-9 macros (cm_bucket/es_priority/zorder16) equal their Column-API twins") {
    graft.sql.GraftFunctions.registerSqlMacros(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("sq9_docs")
    // cm_bucket == the bucket Sketch.countMin uses
    val viaSql = spark.sql(
      """SELECT doc_id, cm_bucket(1, CAST(lang AS STRING), 64) AS b
        |FROM sq9_docs""".stripMargin)
    val viaCol = docs.select(col("doc_id"),
      pmod(graft.ops.Sketch.portableHash(
        concat(lit("1"), lit("|"), col("lang").cast("string"))), lit(64)).as("b"))
    TestSpark.assertSameRows(viaSql, viaCol, "cm_bucket")
    // es_priority reproduces the weightedSampleBy ordering key
    val viaSqlP = spark.sql(
      """SELECT doc_id,
        |  es_priority(CAST(doc_id AS STRING), CAST(doc_id + 1 AS DOUBLE), '42') AS p
        |FROM sq9_docs""".stripMargin)
    val u = (graft.ops.Sketch.portableHash(
        concat(col("doc_id").cast("string"), lit("|42"))) + lit(1L))
      .cast("double") / lit(math.pow(2, 60))
    val viaColP = docs.select(col("doc_id"),
      (log(u) / (col("doc_id") + 1).cast("double")).as("p"))
    TestSpark.assertSameRows(viaSqlP, viaColP, "es_priority")
    // zorder16 == Scale.zorderValue at 16 bits
    val viaSqlZ = spark.sql(
      """SELECT doc_id,
        |  zorder16(doc_id % 65536, (doc_id * 7) % 65536) AS z
        |FROM sq9_docs""".stripMargin)
    val viaColZ = docs.select(col("doc_id"),
      graft.ops.Scale.zorderValue(Seq(
        pmod(col("doc_id"), lit(65536)), pmod(col("doc_id") * 7, lit(65536))),
        16).as("z"))
    TestSpark.assertSameRows(viaSqlZ, viaColZ, "zorder16")
    for (fn <- Seq("cm_bucket", "es_priority", "zorder16")) {
      val d = spark.sql(s"DESCRIBE FUNCTION $fn").collect().map(_.getString(0))
      assert(d.exists(_.contains(fn)), s"$fn: ${d.mkString("|")}")
    }
  }

  test("sketch family in pure SQL: count_min_agg/cm_estimate and qsketch_estimate equal the Sketch verbs") {
    graft.sql.GraftFunctions.register(spark)
    graft.sql.GraftFunctions.registerSqlMacros(spark)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.createOrReplaceTempView("sq10_events")
    // a complete pure-SQL count-min workflow: ONE aggregate call builds the
    // flattened counter array, the macro probes estimates out of it — must
    // equal the relational Sketch.countMin/countMinEstimate pair cell-for-cell
    val viaSql = spark.sql(
      """WITH sk AS (SELECT count_min_agg(CAST(user_id AS STRING), 64, 3) AS c
        |  FROM sq10_events WHERE user_id IS NOT NULL),
        |ks AS (SELECT DISTINCT CAST(user_id AS STRING) AS k FROM sq10_events
        |  WHERE user_id < 100)
        |SELECT k, cm_estimate(sk.c, k, 64, 3) AS est FROM ks, sk""".stripMargin)
    val sk = graft.ops.Sketch.countMin(ev, col("user_id"), 64, 3)
    val viaOps = graft.ops.Sketch.countMinEstimate(sk,
      ev.filter(col("user_id") < 100), col("user_id"), 64, 3)
    TestSpark.assertSameRows(viaSql, viaOps, "count_min_agg + cm_estimate")
    // qsketch_estimate over the relational sketch's weighted points (k=8 so
    // compaction fires and weights > 1 are exercised) == quantileEstimate
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val qs = graft.ops.Sketch.quantileSketchByGroup(cust,
      Seq("c_mktsegment"), col("c_acctbal"), 8)
    qs.createOrReplaceTempView("sq10_qs")
    val viaSqlQ = spark.sql(
      """WITH g AS (SELECT c_mktsegment, collect_list(struct(v, w)) AS pts
        |  FROM sq10_qs GROUP BY 1)
        |SELECT c_mktsegment, bp / 10000.0D AS q,
        |  qsketch_estimate(pts, bp) AS est
        |FROM g LATERAL VIEW explode(array(2500, 5000, 7500)) t AS bp""".stripMargin)
    val viaOpsQ = graft.ops.Sketch.quantileEstimate(qs,
      Seq("c_mktsegment"), Seq(2500, 5000, 7500))
    TestSpark.assertSameRows(viaSqlQ, viaOpsQ, "qsketch_estimate")
    for (fn <- Seq("count_min_agg", "cm_estimate", "qsketch_estimate")) {
      val d = spark.sql(s"DESCRIBE FUNCTION $fn").collect().map(_.getString(0))
      assert(d.exists(_.contains(fn)), s"$fn: ${d.mkString("|")}")
    }
  }

  test("qsketch_agg builds the quantile sketch in pure SQL: exact-regime " +
       "parity with quantileSketchByGroup, compaction-regime invariants") {
    graft.sql.GraftFunctions.register(spark)
    graft.sql.GraftFunctions.registerSqlMacros(spark)
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    cust.createOrReplaceTempView("sq11_cust")
    // exact regime (k above every segment count): the aggregate's points ARE
    // the relational builder's rows — explode and compare bit-for-bit
    val viaSql = spark.sql(
      """SELECT c_mktsegment, p.lvl AS lvl, p.v AS v, p.w AS w
        |FROM (SELECT c_mktsegment,
        |        qsketch_agg(CAST(c_acctbal AS DOUBLE), 8192) AS pts
        |      FROM sq11_cust GROUP BY 1)
        |LATERAL VIEW explode(pts) t AS p""".stripMargin)
    val viaOps = graft.ops.Sketch.quantileSketchByGroup(cust,
      Seq("c_mktsegment"), col("c_acctbal"), 8192)
    TestSpark.assertSameRows(viaSql, viaOps, "qsketch_agg exact regime")
    // the full pure-SQL build -> estimate loop equals the Scala pair
    val estSql = spark.sql(
      """WITH sk AS (SELECT c_mktsegment,
        |    qsketch_agg(CAST(c_acctbal AS DOUBLE), 8192) AS pts
        |  FROM sq11_cust GROUP BY 1)
        |SELECT c_mktsegment, bp / 10000.0D AS q,
        |  qsketch_estimate(transform(pts, p -> struct(p.v, p.w)), bp) AS est
        |FROM sk LATERAL VIEW explode(array(2500, 5000, 7500)) t AS bp"""
        .stripMargin)
    val estOps = graft.ops.Sketch.quantileEstimate(viaOps,
      Seq("c_mktsegment"), Seq(2500, 5000, 7500))
    TestSpark.assertSameRows(estSql, estOps, "qsketch_agg + qsketch_estimate")
    // compaction regime (k=16): weight conservation, per-level capacity,
    // and the median estimate lands inside the exact interquartile range
    // (the relational path's accuracy pin lives in SketchSpec; here the
    // aggregate's own invariants are under test)
    val nonNull = cust.where(col("c_acctbal").isNotNull)
    val counts = nonNull.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val quart = nonNull.groupBy("c_mktsegment")
      .agg(expr("percentile(c_acctbal, array(0.2, 0.8))").as("iqr")).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val sk16 = spark.sql(
      """SELECT c_mktsegment, qsketch_agg(CAST(c_acctbal AS DOUBLE), 16) AS pts
        |FROM sq11_cust GROUP BY 1""".stripMargin).collect()
    assert(sk16.nonEmpty)
    for (r <- sk16) {
      val seg = r.getString(0)
      val pts = r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getInt(0), p.getDouble(1), p.getLong(2)))
      assert(pts.map(_._3).sum == counts(seg),
        s"$seg: total weight must equal the non-null row count")
      assert(pts.forall { case (lvl, _, w) => w == (1L << lvl) },
        s"$seg: weights must be 2^lvl")
      for ((lvl, n) <- pts.groupBy(_._1).view.mapValues(_.size))
        assert(n <= 16, s"$seg level $lvl holds $n > k points")
      // weighted median from the sketch vs exact 20th/80th percentiles
      val w = counts(seg)
      val target = (5000L * w + 9999L) / 10000L
      var cw = 0L
      val med = pts.sortBy(_._2).collectFirst {
        case (_, v, pw) if { cw += pw; cw >= target } => v }.get
      assert(med >= quart(seg)(0) && med <= quart(seg)(1),
        s"$seg: sketch median $med outside exact (p20, p80) ${quart(seg)}")
    }
    // NULL and NaN values are not counted
    val edge = spark.sql(
      """SELECT qsketch_agg(v, 4) AS pts FROM VALUES
        |  (CAST(1.0 AS DOUBLE)), (CAST(NULL AS DOUBLE)),
        |  (CAST('NaN' AS DOUBLE)), (CAST(2.0 AS DOUBLE)) AS t(v)"""
        .stripMargin).collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(edge.map(_.getLong(2)).sum == 2L &&
      edge.map(_.getDouble(1)).sorted == Seq(1.0, 2.0))
    val d = spark.sql("DESCRIBE FUNCTION qsketch_agg").collect()
      .map(_.getString(0))
    assert(d.exists(_.contains("qsketch_agg")), d.mkString("|"))
  }

  test("qsketch_merge_agg folds persisted sketch points in pure SQL: " +
       "exact-regime parity with quantileSketchMerge") {
    graft.sql.GraftFunctions.register(spark)
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    // two independently-built relational sketches (the even/odd custkey
    // "batches" of q_qsketch_merge), persisted as plain rows
    val a = graft.ops.Sketch.quantileSketchByGroup(
      cust.where(col("c_custkey") % 2 === 0), Seq("c_mktsegment"),
      col("c_acctbal"), 8192)
    val b = graft.ops.Sketch.quantileSketchByGroup(
      cust.where(col("c_custkey") % 2 === 1), Seq("c_mktsegment"),
      col("c_acctbal"), 8192)
    a.unionByName(b).createOrReplaceTempView("sq12_parts")
    // the SQL merge over the unioned point rows == the relational merge
    val viaSql = spark.sql(
      """SELECT c_mktsegment, p.lvl AS lvl, p.v AS v, p.w AS w
        |FROM (SELECT c_mktsegment,
        |        qsketch_merge_agg(CAST(lvl AS INT), v, 8192) AS pts
        |      FROM sq12_parts GROUP BY 1)
        |LATERAL VIEW explode(pts) t AS p""".stripMargin)
    val viaOps = graft.ops.Sketch.quantileSketchMerge(a, b,
      Seq("c_mktsegment"), 8192)
    TestSpark.assertSameRows(viaSql, viaOps, "qsketch_merge_agg exact regime")
    // compaction-regime invariants survive the SQL merge: weight
    // conservation and per-level capacity under a small k
    val a16 = graft.ops.Sketch.quantileSketchByGroup(
      cust.where(col("c_custkey") % 2 === 0), Seq("c_mktsegment"),
      col("c_acctbal"), 16)
    val b16 = graft.ops.Sketch.quantileSketchByGroup(
      cust.where(col("c_custkey") % 2 === 1), Seq("c_mktsegment"),
      col("c_acctbal"), 16)
    a16.unionByName(b16).createOrReplaceTempView("sq12_parts16")
    val w0 = cust.where(col("c_acctbal").isNotNull)
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- spark.sql(
        """SELECT c_mktsegment, qsketch_merge_agg(CAST(lvl AS INT), v, 16) AS pts
          |FROM sq12_parts16 GROUP BY 1""".stripMargin).collect()) {
      val pts = r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getInt(0), p.getLong(2)))
      assert(pts.map(_._2).sum == w0(r.getString(0)),
        s"${r.getString(0)}: merged total weight must equal the row count")
      for ((lvl, n) <- pts.groupBy(_._1).view.mapValues(_.size))
        assert(n <= 16, s"${r.getString(0)} level $lvl holds $n > k points")
    }
  }

  test("GraftExtensions injects the functions at session build time") {
    // verify the injection shape is valid by applying it to a fresh builder-
    // style extensions object (a full new SparkSession would conflict with
    // the shared test session's local metastore)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.sql.GraftExtensions().apply(ext)
    // injection registers builders; reaching here without throwing is the check
    succeed
  }
}
