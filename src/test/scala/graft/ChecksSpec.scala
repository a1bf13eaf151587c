package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Checks

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("duplicate keys, nulls, range, orphans — exact violation counts") {
    val child = Seq(
      (1L, Some(10L), Some(5.0)),
      (1L, Some(10L), Some(60.0)),  // dup key (1,10); out of range
      (2L, Some(99L), None),        // orphan parent; null v
      (3L, None, Some(7.0)),        // null key: not an orphan
      (4L, Some(20L), Some(-1.0))   // out of range
    ).toDF("id", "pid", "v")
    val parent = Seq(10L, 20L).toDF("pk")

    assert(Checks.duplicateKeyCount(child, Seq("id", "pid"))
      .head().getLong(0) == 1L)
    val nulls = Checks.nullCounts(child, Seq("pid", "v")).head()
    assert(nulls.getLong(0) == 1L && nulls.getLong(1) == 1L)
    assert(Checks.outOfRangeCount(child, col("v"), lit(0.0), lit(50.0))
      .head().getLong(0) == 2L)
    assert(Checks.orphanCount(child, "pid", parent, "pk")
      .head().getLong(0) == 1L)
    val gate = Checks.gate(child, Seq("id", "pid"), Seq("v")).head()
    assert(gate.getLong(0) == 1L && gate.getLong(1) == 1L)
  }

  test("keySkew: hand-checked gini, shares, and degenerate distributions") {
    import spark.implicits._
    import graft.ops.Checks
    def report(rows: Seq[String], topK: Int = 10) =
      Checks.keySkew(rows.toDF("k"), Seq("k"), topK).collect()(0)
    // uniform 4 keys x 3 rows: gini 0, max_share 1/4
    val uni = report(Seq("a","a","a","b","b","b","c","c","c","d","d","d"))
    assert(uni.getLong(0) === 4L && uni.getLong(1) === 12L)
    assert(uni.getDouble(2) === 0.25 && uni.getDouble(4) === 0.0)
    // one hot key of 9 + three singletons: counts (1,1,1,9) ascending,
    // gini = (2*(1+2+3+36) - 5*12) / (4*12) = 24/48 = 0.5
    val hot = report(Seq.fill(9)("hot") ++ Seq("x","y","z"))
    assert(hot.getDouble(2) === 0.75 && hot.getDouble(4) === 0.5)
    // topK smaller than n_keys: top-1 share of the hot distribution
    assert(report(Seq.fill(9)("hot") ++ Seq("x","y","z"), topK = 1)
      .getDouble(3) === 0.75)
    // NULL keys are a key like any other
    val withNull = Checks.keySkew(
      Seq(Some("a"), None, None, Some("b")).toDF("k"), Seq("k"), 10)
      .collect()(0)
    assert(withNull.getLong(0) === 3L && withNull.getDouble(2) === 0.5)
    // partition invariance (two-phase rank, exact arithmetic)
    val big = (1L to 5000L).map(i => (i % 977).toString).toDF("k")
    TestSpark.assertSameRows(
      Checks.keySkew(big, Seq("k"), 10),
      Checks.keySkew(big.repartition(13), Seq("k"), 10))
    assertThrows[IllegalArgumentException](
      Checks.keySkew(big, Seq.empty, 10))
    assertThrows[IllegalArgumentException](
      Checks.keySkew(big, Seq("k"), 0))
  }

  test("importanceResample: target-like docs win the draw; no-bigram docs excluded") {
    import spark.implicits._
    import graft.text.TextFns
    // pool: 20 docs speaking language A, 20 speaking language B (disjoint
    // vocab), plus one single-token doc (no bigrams). Target corpus speaks
    // A (importance ratio ~7.6x, hand-replayed): the ES draw is weighted,
    // not a hard filter, so A-speakers dominate but need not sweep — the
    // replay puts 10 of 12 A-side, pinned here with one doc of margin.
    val aDocs = (0 until 20).map(i =>
      (i.toLong, "alpha beta gamma delta alpha beta gamma delta", "g"))
    val bDocs = (0 until 20).map(i =>
      (100L + i, "omega psi chi phi omega psi chi phi", "g"))
    val pool = (aDocs ++ bDocs :+ ((999L, "solo", "g"))).toDF("id", "text", "grp")
    val target = ((0 until 5).map(_ =>
        "alpha beta gamma delta alpha beta gamma delta") :+
      (0 until 26).map(j => s"fill$j").mkString(" ")).toDF("text")
    val picked = TextFns.importanceResample(pool, "id", "text", target,
      "text", Seq("grp"), k = 12).select("id").as[Long].collect().toSet
    assert(picked.size === 12)
    assert(picked.count(_ < 100L) >= 9, s"A-speakers underrepresented: $picked")
    assert(!picked.contains(999L))
    // deterministic: same seed -> same sample
    val again = TextFns.importanceResample(pool, "id", "text", target,
      "text", Seq("grp"), k = 12).select("id").as[Long].collect().toSet
    assert(again === picked)
  }

  test("joinAdvisor: all three strategies; estimate is one-sided") {
    import spark.implicits._
    import graft.ops.Checks
    val uniform = (1L to 600L).map(i => i % 100).toDF("k")
    val skewed = ((1L to 300L).map(_ => 0L) ++ (1L to 300L)).toDF("k")
    val small = (1L to 50L).map(i => i % 100).toDF("k")
    def advise(a: org.apache.spark.sql.DataFrame,
               b: org.apache.spark.sql.DataFrame,
               bc: Long = 100L) =
      Checks.joinAdvisor(a, col("k"), b, col("k"), width = 1024, depth = 3,
        broadcastRows = bc, hotShare = 0.2).collect()(0)
    // small side under the budget -> broadcast wins even if skewed
    assert(advise(skewed, small).getString(5) === "broadcast")
    // both big, one hot key owns half a side -> salted
    val s = advise(uniform, skewed, bc = 10L)
    assert(s.getString(5) === "salted_shuffle")
    assert(s.getDouble(4) === 0.5, s"max_share_b ${s.getDouble(4)}")
    // both big, no skew -> plain shuffle; estimate >= the true join size
    val p = advise(uniform, uniform, bc = 10L)
    assert(p.getString(5) === "shuffle")
    assert(p.getLong(2) >= uniform.as("a").join(uniform.as("b"), "k").count())
  }

  test("adaptiveJoin executes the advisor's choice; results strategy-invariant") {
    import spark.implicits._
    import graft.ops.Scale
    val uniform = (1L to 600L).map(i => (i, i % 100)).toDF("a_id", "k")
    val skewed = ((1L to 300L).map(i => (i, 0L)) ++
      (301L to 600L).map(i => (i, i % 100))).toDF("a_id", "k")
    val right = (0L to 99L).map(i => (i, s"v$i")).toDF("k", "v")
    def plan(df: org.apache.spark.sql.DataFrame): String = {
      df.count(); df.queryExecution.executedPlan.toString
    }
    // hot key owns half the left side + tiny broadcast budget -> the salted
    // plan (join keys extended with the deterministic salt)
    val salted = Scale.adaptiveJoin(skewed, right, "k",
      broadcastRows = 10, hotShare = 0.2)
    assert(plan(salted).contains("__salt"), "expected the salted join shape")
    TestSpark.assertSameRows(salted,
      skewed.join(right, Seq("k")).select("k", "a_id", "v"))
    // uniform keys + tiny budget -> plain shuffle join, no salt anywhere
    val plain = Scale.adaptiveJoin(uniform, right, "k",
      broadcastRows = 10, hotShare = 0.2)
    assert(!plan(plain).contains("__salt"), "uniform input must not salt")
    TestSpark.assertSameRows(plain,
      uniform.join(right, Seq("k")).select("k", "a_id", "v"))
    // small side within the default budget -> broadcast hash join
    val bc = Scale.adaptiveJoin(uniform, right, "k")
    val bcPlan = plan(bc)
    assert(bcPlan.contains("BroadcastHashJoin") ||
      bcPlan.contains("BroadcastExchange"), bcPlan)
    TestSpark.assertSameRows(bc, plain)
  }

  test("joinAdvisorFromProfiles == joinAdvisor from persisted one-row " +
      "profiles; adaptiveJoinFromStats picks the identical strategy with " +
      "ZERO data-table scans in the advisor") {
    import spark.implicits._
    import graft.ops.{Checks, Scale}
    val skewed = ((1L to 300L).map(i => (i, 0L)) ++
      (301L to 600L).map(i => (i, i % 100))).toDF("a_id", "k")
    val right = (0L to 99L).map(i => (i, s"v$i")).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-profiles")
    try {
    // persist-once: the standing artifacts a production pipeline keeps
    Checks.joinProfile(skewed.select("k"), col("k"))
      .write.parquet(s"$dir/pa")
    Checks.joinProfile(right.select("k"), col("k"))
      .write.parquet(s"$dir/pb")
    val pa = spark.read.parquet(s"$dir/pa")
    val pb = spark.read.parquet(s"$dir/pb")
    // the recomputed advisor row equals the inline advisor EXACTLY —
    // counts, shares, CM join-size estimate, and strategy
    val inline = Checks.joinAdvisor(skewed, col("k"), right, col("k"),
      broadcastRows = 10L, hotShare = 0.2)
    val fromProfiles = Checks.joinAdvisorFromProfiles(pa, pb,
      broadcastRows = 10L, hotShare = 0.2)
    TestSpark.assertSameRows(inline, fromProfiles)
    // the from-profiles advisor's plan reads ONLY the profile parquet —
    // no scan of the data tables (their columns/paths never appear)
    val advisorPlan = fromProfiles.queryExecution.executedPlan.toString
    assert(advisorPlan.contains(s"$dir/pa") && advisorPlan.contains(s"$dir/pb"))
    assert(!advisorPlan.contains("a_id") && !advisorPlan.contains("v#"),
      "advisor-from-profiles must not touch the data tables")
    // the executed join: identical strategy (salted here) and rows
    val viaStats = Scale.adaptiveJoinFromStats(skewed, right, "k",
      pa, pb, broadcastRows = 10L, hotShare = 0.2)
    viaStats.count()
    assert(viaStats.queryExecution.executedPlan.toString.contains("__salt"),
      "expected the salted shape from persisted stats")
    TestSpark.assertSameRows(viaStats,
      skewed.join(right, Seq("k")).select("k", "a_id", "v"))
    // geometry guards: profiles built with a different (width, depth) — or
    // fed a mismatched depth argument — must fail fast, not silently min
    // over incomparable bucket spaces
    val pbNarrow = Checks.joinProfile(right.select("k"), col("k"), width = 64)
    val eGeom = intercept[IllegalArgumentException] {
      Checks.joinAdvisorFromProfiles(pa, pbNarrow)
    }
    assert(eGeom.getMessage.contains("geometr"), eGeom.getMessage)
    val eDepth = intercept[IllegalArgumentException] {
      Checks.joinAdvisorFromProfiles(pa, pb, depth = 5)
    }
    assert(eDepth.getMessage.contains("depth"), eDepth.getMessage)
    val eOld = intercept[IllegalArgumentException] {
      Checks.joinAdvisorFromProfiles(pa.drop("width"), pb)
    }
    assert(eOld.getMessage.contains("rebuild"), eOld.getMessage)
    // raw-key n/max_share: NULL keys count toward n (the inline advisor's
    // convention) while the sketch cells exclude them, and the recorded
    // geometry rides the row
    val prof = Checks.joinProfile(
      Seq(Some(1L), Some(1L), None).toDF("k"), col("k"))
    val row = prof.select("n", "max_share", "width", "depth").head()
    assert(row.getLong(0) == 3L && row.getDouble(1) == 2.0 / 3.0 &&
      row.getInt(2) == 1024 && row.getInt(3) == 3,
      s"raw-key grouping + geometry record: $row")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("adaptiveJoin guards: NULL advisor stats (empty side) and duplicate " +
      "non-key columns fail fast with a clear message") {
    import spark.implicits._
    import graft.ops.Scale
    val left = (1L to 10L).map(i => (i, i % 3)).toDF("a_id", "k")
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val e1 = intercept[IllegalArgumentException] {
      Scale.adaptiveJoin(left, empty, "k")
    }
    assert(e1.getMessage.contains("empty"), e1.getMessage)
    val dup = (1L to 10L).map(i => (i, i % 3)).toDF("a_id", "k")
    val e2 = intercept[IllegalArgumentException] {
      Scale.adaptiveJoin(left, dup, "k")
    }
    assert(e2.getMessage.contains("a_id"), e2.getMessage)
  }

  test("pairMetrics: hand-checked P/R/F1; duplicates collapse; empty sides") {
    import spark.implicits._
    import graft.ops.Checks
    val pred = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 2L)).toDF("id_a", "id_b")
    val truth = Seq((1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val r = Checks.pairMetrics(pred, truth).collect()(0)
    // pred dedupes to 3 pairs; tp = {(1,2)}; P=1/3, R=1/2, F1=2/5
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L && r.getLong(2) === 1L)
    assert(r.getDouble(3) === 1.0 / 3 && r.getDouble(4) === 0.5)
    assert(r.getDouble(5) === 0.4)
    // empty prediction: counts 0, ratios NULL (0/0 has no answer)
    val e = Checks.pairMetrics(pred.limit(0), truth).collect()(0)
    assert(e.getLong(0) === 0L && e.getLong(1) === 2L && e.getLong(2) === 0L)
    assert(e.isNullAt(3) && e.getDouble(4) === 0.0)
  }

  test("corpusReport: hand-checked card on a tiny planted corpus") {
    import spark.implicits._
    import graft.ops.Checks
    val good = "the quick brown fox jumps over the lazy dog and runs to the den is deep"
    val docs = Seq(
      (1L, good),                         // quality 1.0, en
      (2L, good),                         // exact duplicate of 1
      (3L, "der hund und die katze und das haus ist hier und der baum und die tur ist alt"), // de
      (4L, "1234 5678 9999 0000 1111 2222 3333 4444 5555 6666")  // digit junk
    ).toDF("doc_id", "text")
    val r = Checks.corpusReport(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(r.fieldIndex("n_docs")) === 4L)
    assert(r.getLong(r.fieldIndex("dup_docs")) === 1L)
    assert(r.getString(r.fieldIndex("top_lang")) === "en")
    assert(r.getLong(r.fieldIndex("top_lang_docs")) === 2L)
    val ntok = r.getLong(r.fieldIndex("n_tokens"))
    assert(ntok === (16 + 16 + 18 + 10L))
    // doc 4 fails the digit and length checks; mean = (1+1+1+q4)/4
    val mq = r.getDouble(r.fieldIndex("mean_quality"))
    assert(mq < 1.0 && mq > 0.5, s"mean_quality $mq")
  }

  test("corpusReport blank-doc seam: blank text counts ONE token (split('')" +
      " = ['']) on both engines — the oracle carries no blank guard") {
    import spark.implicits._
    import graft.ops.Checks
    import graft.text.TextFns
    // pin the kernel first: CharStats/tokenCount on blank and
    // whitespace-only text is 1 (Spark's split('') = ['']; DuckDB's
    // regexp_split_to_array('', '\s+') is also [''] — the
    // corpusReportOracleSql comment documents the parity)
    // ("\t\n" is 2: SQL trim strips 0x20 only, and Pattern.split keeps
    // the leading and trailing empties — ["", ""])
    val toks = Seq("", "   ", "\t\n", "one two").toDF("t")
      .select(TextFns.tokenCount(col("t")).cast("long").as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(toks === Seq(1L, 1L, 2L, 2L))
    // and the card over a corpus CONTAINING blanks: no NULLs, no NaNs,
    // n_tokens includes the blanks' 1s
    val docs = Seq((1L, ""), (2L, "   "),
      (3L, "the and of to is here now then when why")).toDF("doc_id", "text")
    val r = Checks.corpusReport(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(r.fieldIndex("n_docs")) === 3L)
    assert(r.getLong(r.fieldIndex("n_tokens")) === (1 + 1 + 10L))
    val mq = r.getDouble(r.fieldIndex("mean_quality"))
    assert(!mq.isNaN && mq > 0.0, s"mean_quality $mq")
    // the two blanks normalize to the same fingerprint -> one dup
    assert(r.getLong(r.fieldIndex("dup_docs")) === 1L)
  }

  test("rows_insert/update/upsert/delete follow the dplyr contract") {
    val target = Tbl(Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v"))
    // patch omits v; includes existing key 2 and new key 9
    val patch = Tbl(Seq((2L, "B!"), (9L, "NEW")).toDF("k", "s"))

    def rows(t: Tbl): Set[(Long, String, Option[Double])] =
      t.df.collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

    assert(rows(target.rowsInsert(patch, Seq("k"))) == Set(
      (1L, "a", Some(10.0)), (2L, "b", Some(20.0)), (3L, "c", Some(30.0)),
      (9L, "NEW", None)))
    assert(rows(target.rowsUpdate(patch, Seq("k"))) == Set(
      (1L, "a", Some(10.0)), (2L, "B!", Some(20.0)), (3L, "c", Some(30.0))))
    assert(rows(target.rowsUpsert(patch, Seq("k"))) == Set(
      (1L, "a", Some(10.0)), (2L, "B!", Some(20.0)), (3L, "c", Some(30.0)),
      (9L, "NEW", None)))
    assert(rows(target.rowsDelete(patch, Seq("k"))) == Set(
      (1L, "a", Some(10.0)), (3L, "c", Some(30.0))))
    // NULLs in the source DO overwrite (rows_update semantics)
    val nullPatch = Tbl(Seq((1L, null.asInstanceOf[String])).toDF("k", "s"))
    assert(rows(target.rowsUpdate(nullPatch, Seq("k")))
      .contains((1L, null, Some(10.0))))
    // source column not in target -> loud error
    intercept[Exception] {
      target.rowsInsert(Tbl(Seq((1L, 2L)).toDF("k", "zz")), Seq("k"))
    }
  }
}
