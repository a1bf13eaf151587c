package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextFns

/** Differential tests for the one-pass RepetitionStats expression against a
  * naive regex/Map reimplementation of the documented semantics (Java
  * split(-1) empties, first-seen duplicate accounting, overlap-counted
  * n-grams, binary-order tie-break).
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixtures = Seq(
    "a b c d e a b c d e a b c d e",               // heavy 5-gram repetition
    "one two three four five six seven",           // no repetition
    "x\nx\nx\ny",                                  // duplicate lines
    "p q\n\np q\n\nr s",                           // duplicate paragraphs
    "\n\nleading\n\n\ntrailing\n\n",               // empty line/para segments
    "",                                            // empty doc
    " ",                                           // whitespace only
    "t t t t t t t t t t",                         // one word repeated
    "A a A a a A",                                 // tie-break: 'A a' vs 'a A'
    "tab\tsep words tab\tsep words",
    "ünï códé ünï códé ünï",                       // non-ASCII code points
    "😀 x 😀 x 😀 x",                              // supplementary plane
    "single\nnewlines\ninside\nparagraph",
    "a b a b a b c d c d c d",
    ("lorem ipsum dolor sit amet " * 4).trim
  )

  // --- naive reference implementation (independent formulation) ---
  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong
  private def naiveWords(s: String): Seq[String] =
    s.split("\\s+", -1).filter(_.nonEmpty).toSeq
  private def naiveGrams(ws: Seq[String], n: Int): Seq[String] =
    if (ws.length < n) Seq.empty else ws.sliding(n).map(_.mkString(" ")).toSeq
  private def naiveDup(segs: Seq[String]): (Long, Long, Long, Long) = {
    val counts = segs.groupBy(identity).view.mapValues(_.size)
    val dups = counts.map { case (_, c) => (c - 1).toLong }.sum
    val dupChars = counts.map { case (s, c) => (c - 1).toLong * cp(s) }.sum
    (segs.length.toLong, dups, segs.map(cp).sum, dupChars)
  }

  private def naive(s: String): Map[String, Long] = {
    val (nl, dl, lc, dlc) = naiveDup(s.split("\n", -1).toSeq)
    val (np, dp, pc, dpc) = naiveDup(s.split("\n{2,}", -1).toSeq)
    val ws = naiveWords(s)
    val base = Map(
      "lines" -> nl, "dup_lines" -> dl, "line_chars" -> lc, "dup_line_chars" -> dlc,
      "paras" -> np, "dup_paras" -> dp, "para_chars" -> pc, "dup_para_chars" -> dpc,
      "words" -> ws.length.toLong, "chars" -> cp(s))
    val tops = Seq(2, 3, 4).flatMap { n =>
      val gs = naiveGrams(ws, n)
      if (gs.isEmpty) Seq(s"top${n}gram_count" -> 0L, s"top${n}gram_len" -> 0L)
      else {
        val counts = gs.groupBy(identity).view.mapValues(_.size).toMap
        val maxC = counts.values.max
        val best = counts.filter(_._2 == maxC).keys.min
        Seq(s"top${n}gram_count" -> maxC.toLong, s"top${n}gram_len" -> cp(best))
      }
    }
    val dups = Seq(5, 8).map { n =>
      val counts = naiveGrams(ws, n).groupBy(identity).view.mapValues(_.size)
      s"dup${n}gram_chars" ->
        counts.collect { case (g, c) if c >= 2 => c.toLong * cp(g) }.sum
    }
    base ++ tops ++ dups
  }

  test("RepetitionStats equals the naive formulation on adversarial fixtures") {
    val df = fixtures.toDF("text")
      .withColumn("st", TextFns.repetitionStats(col("text")))
    val rows = df.select(col("text"), col("st.*")).collect()
    assert(rows.length == fixtures.length)
    rows.foreach { r =>
      val text = r.getString(0)
      val expected = naive(text)
      val schema = r.schema.fields.drop(1)
      schema.zipWithIndex.foreach { case (f, i) =>
        assert(r.getLong(i + 1) == expected(f.name),
          s"field ${f.name} on ${text.take(40).replace("\n", "\\n")}: " +
          s"got ${r.getLong(i + 1)}, expected ${expected(f.name)}")
      }
    }
  }

  test("repetitionKeep drops the repetitive docs and keeps clean prose") {
    val df = Seq(
      ("spam", "buy now " * 40),
      ("dupline", Seq.fill(10)("same line").mkString("\n")),
      ("clean", "a quick brown fox jumps over the lazy dog near a riverbank " +
        "while birds sing different melodies every single morning in spring"))
      .toDF("id", "text")
      .withColumn("keep", TextFns.repetitionKeep(col("text")))
    val keep = df.where(col("keep")).select("id").as[String].collect().toSet
    assert(keep == Set("clean"))
  }

  test("randomized differential: 20 seeds of generated text equal the naive formulation") {
    val vocab = Seq("a", "b", "cc", "ddd", "xy", "Z", "émi", "😀")
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val texts = (1 to 8).map { _ =>
        val n = rnd.nextInt(60)
        (0 until n).map { _ =>
          val w = vocab(rnd.nextInt(vocab.size))
          val sep = rnd.nextInt(10) match {
            case 0 => "\n"
            case 1 => "\n\n"
            case 2 => "\t"
            case _ => " "
          }
          w + sep
        }.mkString
      }
      val rows = texts.toDF("text")
        .withColumn("st", TextFns.repetitionStats(col("text")))
        .select(col("text"), col("st.*")).collect()
      rows.foreach { r =>
        val expected = naive(r.getString(0))
        r.schema.fields.drop(1).zipWithIndex.foreach { case (f, i) =>
          assert(r.getLong(i + 1) == expected(f.name),
            s"seed $seed field ${f.name} on '${r.getString(0).take(50)}'")
        }
      }
    }
  }

  test("dropFrequentLines is invariant to input partitioning") {
    val docs = (1L to 60L).map { i =>
      val lines = (0 until (i % 5).toInt + 1).map {
        j => if ((i + j) % 3 == 0) "common boilerplate line" else s"unique $i $j"
      }
      (i, lines.mkString("\n"))
    }.toDF("doc_id", "text")
    val a = graft.ml.Dedup.dropFrequentLines(docs, "doc_id", "text", 4, 3)
    val b = graft.ml.Dedup.dropFrequentLines(docs.repartition(7), "doc_id", "text", 4, 3)
    TestSpark.assertSameRows(a, b, "dropFrequentLines repartition")
    // the boilerplate actually got dropped somewhere
    assert(a.where(col("text").contains("common boilerplate")).count() == 0)
  }

  test("dropFrequentLines removes corpus-wide boilerplate, keeps order, preserves columns") {
    val docs = Seq(
      (1L, "unique alpha\nSUBSCRIBE NOW\nunique beta", "en"),
      (2L, "SUBSCRIBE NOW\nkeep this two", "en"),
      (3L, "keep this three\nSUBSCRIBE NOW\nab", "de"), // 'ab' < minLen: kept
      (4L, "SUBSCRIBE NOW", "fr"),                      // becomes empty
      (5L, "only once line\nSUBSCRIBE NOW", "zh"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ml.Dedup.dropFrequentLines(
        docs, "doc_id", "text", maxDocFreq = 3, minLen = 3)
      .orderBy("doc_id")
      .select("doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(out == Seq(
      (1L, "unique alpha\nunique beta", "en"),
      (2L, "keep this two", "en"),
      (3L, "keep this three\nab", "de"),
      (4L, "", "fr"),
      (5L, "only once line", "zh")))
    // below the threshold nothing is dropped
    val noop = graft.ml.Dedup.dropFrequentLines(
        docs, "doc_id", "text", maxDocFreq = 5, minLen = 3)
    val joined = noop.select(col("doc_id"), col("text").as("got"))
      .join(docs.select(col("doc_id"), col("text").as("want")), "doc_id")
    assert(joined.where(col("got") =!= col("want")).count() == 0)
  }

  test("Fns.cut: closure sides, includeLowest, default labels, out-of-range null") {
    import graft.functions.Fns
    val df = Seq(0.0, 1.0, 2.0, 2.5, 3.0, 5.0, -1.0).toDF("x")
    def got(c: org.apache.spark.sql.Column): Seq[String] =
      df.select(c).collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    // right-closed (default): (0,2], (2,3]; 0 excluded unless includeLowest
    assert(got(Fns.cut(col("x"), Seq(0d, 2d, 3d), Seq("a", "b"))) ==
      Seq(null, "a", "a", "b", "b", null, null))
    assert(got(Fns.cut(col("x"), Seq(0d, 2d, 3d), Seq("a", "b"), includeLowest = true)) ==
      Seq("a", "a", "a", "b", "b", null, null))
    // left-closed: [0,2), [2,3); includeLowest closes the LAST bin's top
    assert(got(Fns.cut(col("x"), Seq(0d, 2d, 3d), Seq("a", "b"), right = false)) ==
      Seq("a", "a", "b", "b", null, null, null))
    assert(got(Fns.cut(col("x"), Seq(0d, 2d, 3d), Seq("a", "b"), right = false,
        includeLowest = true)) ==
      Seq("a", "a", "b", "b", "b", null, null))
    // default pandas-style labels from literal break spellings
    assert(got(Fns.cut(col("x"), Seq(0d, 2d, 3d))) ==
      Seq(null, "(0.0, 2.0]", "(0.0, 2.0]", "(2.0, 3.0]", "(2.0, 3.0]", null, null))
  }

  test("Fns.qcut: quartile edges, ties share a bin, duplicate edges rejected") {
    import graft.functions.Fns
    val df = (1 to 100).map(_.toLong).toDF("x")
    val binned = df.withColumn("b",
      Fns.qcut(df, col("x"), 4, Seq("q1", "q2", "q3", "q4")))
    val counts = binned.groupBy("b").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("q1" -> 25L, "q2" -> 25L, "q3" -> 25L, "q4" -> 25L))
    // heavy ties: all equal values land in ONE bin (interval semantics);
    // with a constant column every quantile edge collapses -> clear error
    val tied = (Seq.fill(50)(1L) ++ Seq.fill(50)(2L)).toDF("x")
    val tb = tied.withColumn("b", Fns.qcut(tied, col("x"), 2, Seq("lo", "hi")))
    assert(tb.where(col("x") === 1L).select("b").distinct().count() == 1)
    val const = Seq.fill(10)(7L).toDF("x")
    intercept[IllegalArgumentException] {
      Fns.qcut(const, col("x"), 2)
    }
  }

  test("null text yields null struct; stats stay inside codegen") {
    val df = Seq(Some("a b a b"), None).toDF("text")
      .withColumn("st", TextFns.repetitionStats(col("text")))
    val got = df.select(col("st").isNull).as[Boolean].collect().toSeq
    assert(got.count(identity) == 1)
    // codegen-friendly: no fallback — a non-local plan keeps the expression
    // inside a WholeStageCodegen span (the local Seq above constant-folds
    // via ConvertToLocalRelation, so probe over range() instead)
    val plan = spark.range(10)
      .select(TextFns.repetitionStats(
        concat_ws(" ", col("id").cast("string"), col("id").cast("string"))).as("st"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // * prefix = codegen'd stage
  }
}
