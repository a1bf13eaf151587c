package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // in-memory reference BPE (Sennrich et al. algorithm 1) for differentials
  private def greedyMerge(ts: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]; var i = 0
    while (i < ts.size) {
      if (i < ts.size - 1 && ts(i) == l && ts(i + 1) == r) { b += (l + r); i += 2 }
      else { b += ts(i); i += 1 }
    }
    b.result()
  }

  private def refTrain(wordCounts: Map[String, Long],
                       n: Int): Seq[(Long, String, String, Long)] = {
    var words = wordCounts.toVector.map { case (w, c) =>
      (w.map(_.toString).toVector :+ "</w>", c) }
    val out = Vector.newBuilder[(Long, String, String, Long)]
    var rank = 1L
    var stop = false
    while (rank <= n && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((ts, c) <- words; i <- 0 until ts.size - 1)
        counts((ts(i), ts(i + 1))) = counts.getOrElse((ts(i), ts(i + 1)), 0L) + c
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), f) = counts.toSeq
          .sortBy { case ((l, r), f) => (-f, l, r) }.head
        out += ((rank, l, r, f))
        words = words.map { case (ts, c) => (greedyMerge(ts, l, r), c) }
        rank += 1
      }
    }
    out.result()
  }

  test("train matches the reference algorithm on the Sennrich-style corpus") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest widest",
      "widest widest").toDF("text")
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val expect = refTrain(wc, 8)
    val got = Bpe.train(corpus, "text", nMerges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    // the canonical first merges: 'es' (9 = newest 6 + widest 3) then 'est'
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._4 == 9L)
    assert(got(1)._2 == "es" && got(1)._3 == "t")
  }

  test("train differential on real documents; a==b run merges stay greedy") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wc = Bpe.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc.nonEmpty)
    val expect = refTrain(wc, 12)
    val got = Bpe.train(docs, "text", nMerges = 12)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"got $got\nexpect $expect")

    // repeated-token runs: greedy leftmost pairs ('aaaa' -> aa,aa; 'aaa' ->
    // aa,a) — the fold must not re-merge across a just-merged pair
    import spark.implicits._
    val runs = Seq("aaaa aaaa aaa").toDF("text")
    val m1 = Bpe.train(runs, "text", nMerges = 1).collect()(0)
    assert((m1.getString(1), m1.getString(2)) == ("a", "a"))
    val enc = Bpe.encodeWords(Seq("aaaa", "aaa", "aaaaa").toDF("w"), "w",
        Bpe.train(runs, "text", nMerges = 1))
      .collect().map(r => r.getString(0) ->
        r.getSeq[String](1).toList).toMap
    assert(enc("aaaa") == List("aa", "aa", "</w>"), enc)
    assert(enc("aaa") == List("aa", "a", "</w>"), enc)
    assert(enc("aaaaa") == List("aa", "aa", "a", "</w>"), enc)
  }

  test("edge cases: no valid words -> empty merge table; non-ascii filtered") {
    import spark.implicits._
    val junk = Seq("123 456 !!!", "ÜBER ÇA").toDF("text")
    val m = Bpe.train(junk, "text", nMerges = 3)
    assert(m.count() == 0L)
    assert(m.columns.toSeq == Seq("rank", "left", "right", "freq"))
    // asciiOnly=false admits them
    assert(Bpe.wordCounts(junk, "text", asciiOnly = false).count() > 0)
    assertThrows[IllegalArgumentException](Bpe.train(junk, "text", 0))
  }

  test("encodeWords replays the learned merges (reference parity)") {
    import spark.implicits._
    val corpus = Seq("low low low lower newest newest widest").toDF("text")
    val merges = Bpe.train(corpus, "text", nMerges = 6)
    val ms = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val words = Seq("lowest", "newest", "wide").toDF("w")
    val got = Bpe.encodeWords(words, "w", merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    for (w <- Seq("lowest", "newest", "wide")) {
      var ts = w.map(_.toString).toVector :+ "</w>"
      for ((l, r) <- ms) ts = greedyMerge(ts, l, r)
      assert(got(w) == ts.toList, s"$w: ${got(w)} vs $ts")
    }
  }

  test("trainIncremental == train bit-identical (Sennrich corpus, runs, early-stop)") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest widest",
      "widest widest").toDF("text")
    def table(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    assert(table(Bpe.trainIncremental(corpus, "text", 8)) ==
      table(Bpe.train(corpus, "text", 8)))
    // repeated-run greedy semantics flow through the delta path too
    val runs = Seq("aaaa aaaa aaa").toDF("text")
    assert(table(Bpe.trainIncremental(runs, "text", 3)) ==
      table(Bpe.train(runs, "text", 3)))
    // early stop: 'ab' exhausts its pairs before nMerges — both variants
    // stop at the same rank with the same table
    val tiny = Seq("ab ab").toDF("text")
    assert(table(Bpe.trainIncremental(tiny, "text", 10)) ==
      table(Bpe.train(tiny, "text", 10)))
    // no valid words -> empty table, same schema as train's
    val junk = Seq("123 !!!").toDF("text")
    val m = Bpe.trainIncremental(junk, "text", 3)
    assert(m.count() == 0L &&
      m.columns.toSeq == Seq("rank", "left", "right", "freq"))
    assert(m.schema.map(_.dataType) ==
      Bpe.train(junk, "text", 3).schema.map(_.dataType))
  }

  test("trainIncremental == train at 512 merges on sf0.01 documents;" +
       " affected-word fraction collapses (delta contract)") {
    import spark.implicits._
    // the synthetic documents' ascii vocabulary is tiny (~31 words) and
    // exhausts its pairs after a couple hundred merges — augment with 400
    // deterministic pseudo-random words (md5-of-index hex digits mapped to
    // letters a..p, 32 chars each) so 512 rounds have real work at a
    // realistic vocabulary size
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text")
    val md = java.security.MessageDigest.getInstance("MD5")
    val extra = (1 to 400).map { i =>
      md.reset()
      md.digest(i.toString.getBytes("UTF-8"))
        .flatMap(b => Seq((b >> 4) & 0xf, b & 0xf))
        .map(n => ('a' + n).toChar).mkString
    }.grouped(8).map(_.mkString(" ")).toSeq.toDF("text")
    val corpus = docs.unionByName(extra)
    def table(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    val full = table(Bpe.train(corpus, "text", nMerges = 512))
    val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val inc = table(Bpe.trainIncremental(corpus, "text", nMerges = 512,
      onRound = (rk, na, nw) => rounds += ((rk, na, nw))))
    assert(inc.size == 512, s"corpus exhausted at ${inc.size} merges")
    // the batched variant: same bit-identity pin, and the round count must
    // come in measurably under one-round-per-merge (the tie-heavy tail
    // bounds how far EXACT batching can compress — see the scaladoc)
    var batRounds = 0
    val batSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val bat = table(Bpe.trainIncrementalBatched(corpus, "text", nMerges = 512,
      onRound = (r, b) => { batRounds = r; batSizes += b }))
    assert(bat == full, {
      val d = bat.zip(full).indexWhere { case (a, b) => a != b }
      s"batched: first divergence at index $d: ${bat.lift(d)} vs ${full.lift(d)}"
    })
    info(s"batched: $batRounds rounds for 512 merges")
    assert(batRounds > 0 && batRounds <= (512 * 3) / 4,
      s"batching must compress rounds: $batRounds rounds for 512 merges")
    // per-round merge-table GROWTH accounting (the wall-clock-free CI
    // slice of the GRAFT_PROF 2048-merge run): every round must land a
    // nonempty prefix batch — a zero-progress round would loop forever at
    // 32k merges — and the batch sizes must sum exactly to the table
    assert(batSizes.size == batRounds && batSizes.forall(_ >= 1) &&
      batSizes.sum == 512,
      s"growth accounting broken: ${batSizes.size} rounds, " +
        s"min ${batSizes.min}, sum ${batSizes.sum}")
    assert(inc == full, {
      val d = inc.zip(full).indexWhere { case (a, b) => a != b }
      s"first divergence at index $d: ${inc.lift(d)} vs ${full.lift(d)}"
    })
    // the delta contract: per-round work tracks the words CONTAINING the
    // winning pair, which collapses once the head of the frequency
    // distribution is merged away. Pin (1) the tail's per-round affected
    // fraction and (2) total affected work across all 512 rounds vs the
    // full-recount's 512 corpus scans.
    val n = rounds.size
    assert(n == 512)
    val nWords = rounds.head._3
    val frac = rounds.sortBy(_._1).map(r => r._2.toDouble / nWords)
    val firstQ = frac.take(n / 4)
    val lastQ = frac.drop(3 * n / 4)
    info(f"affected fraction: first-quarter mean ${firstQ.sum / firstQ.size}%.4f, " +
      f"last-quarter mean ${lastQ.sum / lastQ.size}%.4f, total ${frac.sum}%.1f " +
      s"word-scans vs 512 full scans (nWords=$nWords)")
    assert(lastQ.sum / lastQ.size < (firstQ.sum / firstQ.size) / 2,
      "late rounds must touch a far smaller word fraction than early rounds")
    assert(frac.sum < 512 * 0.25,
      "total affected-word work must be well under the full-recount's 512 scans")
  }

  test("trainIncrementalBatched == reference on randomized tiny-alphabet " +
       "corpora (tie/created-pair stress)") {
    import spark.implicits._
    // tiny alphabets maximize pair collisions, frequency ties, and
    // created-pair interactions — 2-letter trials additionally force
    // DECOMPOSITION COLLISIONS (the same token string reachable via
    // different merge paths, e.g. "aab" via (a, ab) while (aa, b) stands),
    // the structure behind the grown-pair ceiling's augmentation leg.
    // refTrain is the in-memory reference: a divergence pinpoints the
    // first wrong (rank, left, right, freq) row.
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val alphabet = if (trial % 2 == 0) "ab" else "abc"
      val words = (1 to 30).map { _ =>
        (1 to (2 + rng.nextInt(7)))
          .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      }
      val weights = words.map(_ => 1 + rng.nextInt(5))
      val corpus = words.zip(weights)
        .flatMap { case (w, n) => Seq.fill(n)(w) }
        .grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
      val wc = words.zip(weights).groupBy(_._1)
        .view.mapValues(_.map(_._2.toLong).sum).toMap
      val expect = refTrain(wc, 20)
      val got = Bpe.trainIncrementalBatched(corpus, "text", nMerges = 20)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(got == expect,
        s"trial $trial ($alphabet):\n got   $got\n expect $expect\n corpus $wc")
    }
  }

  test("applicableMergeCounts: per-word applicable merges << a 4096-merge table") {
    import spark.implicits._
    val corpus = Seq("low low low lower newest newest widest").toDF("text")
    val real = Bpe.train(corpus, "text", nMerges = 16)
    val nReal = real.count()
    // pad to 4096 with merges whose pieces occur in NO word: the prefilter
    // must discard them all, so per-word fold work tracks word content
    val pad = ((nReal + 1) to 4096).map(i => (i, s"<p$i>", s"<q$i>", 0L))
      .toDF("rank", "left", "right", "freq")
    val big = real.unionByName(pad).localCheckpoint()
    assert(big.count() == 4096)
    val words = Seq("lowest", "newest", "widest", "zzz").toDF("w")
    val counts = Bpe.applicableMergeCounts(words, "w", big).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.max <= nReal,
      s"planted pads must never be applicable: $counts")
    assert(counts("zzz") == 0L, counts.toString)
    // soundness: encoding against the padded table equals the replay of
    // the REAL merges alone — filtered merges could never have fired
    val one = Bpe.encodeWords(words, "w", big).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val rep = Bpe.encodeWordsReplay(words, "w", real).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(one == rep)
  }

  test("one-pass encode == per-merge replay; 512 merges stay ONE query") {
    import spark.implicits._
    val corpus = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump",
      "the five boxing wizards jump quickly").toDF("text")
    val merges = Bpe.train(corpus, "text", nMerges = 24)
    val words = Bpe.wordCounts(corpus, "text").select("word")
    val one = Bpe.encodeWords(words, "word", merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val rep = Bpe.encodeWordsReplay(words, "word", merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(one == rep, "one-pass fold must equal the per-merge replay")
    assert(one.nonEmpty)

    // pad the table to 512 merges with pairs that never occur: the encode
    // must remain a single query — no per-merge checkpoints in the plan,
    // and a handful of jobs total (the replay would schedule 64+). The
    // merge table itself is pinned to ONE checkpoint first so any further
    // LogicalRDD in the encode plan would be the encode's own doing.
    val pad = (25 to 512).map(i => (i.toLong, s"<pad$i>", s"<pad$i>", 0L))
      .toDF("rank", "left", "right", "freq")
    val bigMerges = merges.unionByName(pad).localCheckpoint()
    val enc = Bpe.encodeWords(words, "word", bigMerges)
    assert(enc.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l }.length <= 1,
      "one-pass encode must not add checkpoints of its own")
    val sc = spark.sparkContext
    sc.setJobGroup("bpe-one-pass-512", "BpeSpec job-count pin",
      interruptOnCancel = false)
    val got = try {
      enc.collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    } finally sc.clearJobGroup()
    assert(got == one, "no-op pad merges must not change the encoding")
    // the status store is fed asynchronously — poll until the group's job
    // count is stable, then pin it
    var last = -1; var stable = 0; var tries = 0
    while (stable < 4 && tries < 100) {
      val c = sc.statusTracker.getJobIdsForGroup("bpe-one-pass-512").length
      if (c == last) stable += 1 else { stable = 0; last = c }
      Thread.sleep(50); tries += 1
    }
    assert(last >= 1 && last <= 10,
      s"expected a single-query encode (few jobs), saw $last")
  }

  test("encodeDocs reassembles per-doc token streams in word order") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd"), (2L, ""), (3L, "cd ab"))
      .toDF("doc_id", "text")
    // pair counts: (a,b)=2, (b,</w>)=2, (c,d)=2, (d,</w>)=2 — lexicographic
    // tie-break picks (a,b), so 'ab' -> [ab, </w>], 'cd' -> [c, d, </w>]
    val merges = Bpe.train(docs, "text", nMerges = 1)
    val got = Bpe.encodeDocs(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](r.fieldIndex("tokens")).toList,
          r.getAs[Long]("n_tokens"))).toMap
    assert(got(1L) == ((Seq("ab", "</w>", "ab", "</w>", "c", "d", "</w>"), 7L)))
    // the empty doc keeps its row with an EMPTY token array, not a drop
    assert(got(2L) == ((Seq.empty[String], 0L)))
    // order matters: doc 3 is cd THEN ab — not a bag of words
    assert(got(3L) == ((Seq("c", "d", "</w>", "ab", "</w>"), 5L)))

    // vocab ids are contiguous frequency ranks (count desc, token asc):
    // </w> x5 -> 0, ab x3 -> 1, c x2 -> 2, d x2 -> 3 (tie on count)
    val enc = Bpe.encodeDocs(docs, "doc_id", "text", merges)
    val vocab = Bpe.vocabTable(enc)
    val v = vocab.collect().map(r => r.getAs[String]("token") ->
      (r.getAs[Long]("n_occur"), r.getAs[Long]("token_id"))).toMap
    assert(v == Map("</w>" -> ((5L, 0L)), "ab" -> ((3L, 1L)),
      "c" -> ((2L, 2L)), "d" -> ((2L, 3L))))
    val ids = Bpe.idsFromTokens(enc, "doc_id", vocab).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("ids")).toList)
      .toMap
    assert(ids(1L) == Seq(1L, 0L, 1L, 0L, 2L, 3L, 0L))
    assert(ids(2L) == Seq.empty[Long])
    assert(ids(3L) == Seq(2L, 3L, 0L, 1L, 0L))
  }

  test("decodeIds round-trips encode; truncated vocab maps OOV to UNK") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd"), (2L, ""), (3L, "cd ab"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", nMerges = 1)
    val enc = Bpe.encodeDocs(docs, "doc_id", "text", merges)
    val vocab = Bpe.vocabTable(enc)
    val ids = Bpe.idsFromTokens(enc, "doc_id", vocab)
    // round trip: decode(encode(text)) == normalized text, empty stays ''
    val dec = Bpe.decodeIds(ids, "doc_id", vocab).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec == Map(1L -> "ab ab cd", 2L -> "", 3L -> "cd ab"))
    // vocab </w>->0, ab->1, c->2, d->3; truncate at 2 keeps {</w>, ab},
    // c/d become UNK id 2 — n_tokens still counts every token
    val unk = Bpe.idsFromTokensWithUnk(enc, "doc_id",
        Bpe.vocabTruncate(vocab, 2), unkId = 2).collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](r.fieldIndex("ids")).toList,
          r.getAs[Long]("n_tokens"))).toMap
    assert(unk(1L) == ((List(1L, 0L, 1L, 0L, 2L, 2L, 0L), 7L)))
    assert(unk(2L) == ((Nil, 0L)))
    assert(unk(3L) == ((List(2L, 2L, 0L, 1L, 0L), 5L)))
  }

  test("vocabCoverage: per-group exact token/OOV counts and rate") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd", "s1"), (2L, "", "s1"),
      (3L, "cd ab", "s2"))
      .toDF("doc_id", "text", "src")
    val merges = Bpe.train(docs, "text", nMerges = 1)
    val enc = Bpe.encodeDocs(docs, "doc_id", "text", merges)
    // vocab </w>->0, ab->1, c->2, d->3; cut at 2 keeps {</w>, ab}:
    // doc1 = [ab,</w>,ab,</w>,c,d,</w>] -> 7 tokens, 2 OOV (c, d);
    // doc3 = [c,d,</w>,ab,</w>]        -> 5 tokens, 2 OOV
    val got = Bpe.vocabCoverage(enc, "doc_id",
        Bpe.vocabTruncate(Bpe.vocabTable(enc), 2), docs, "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map("s1" -> ((7L, 2L, 0.285714)),
      "s2" -> ((5L, 2L, 0.4))), got.toString)
    // against the FULL vocab nothing is OOV
    val full = Bpe.vocabCoverage(enc, "doc_id", Bpe.vocabTable(enc),
        docs, "src").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(full == Map("s1" -> 0L, "s2" -> 0L))
  }

  test("sep tokenizer: vocab ids shift consistently by one, meta records " +
      "the reserved id, windows carry boundary seps and doc spans") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd"), (2L, ""), (3L, "cd ab"))
      .toDF("doc_id", "text")
    val plain = java.nio.file.Files.createTempDirectory("graft-tok-p").toString
    val sep = java.nio.file.Files.createTempDirectory("graft-tok-s").toString
    Bpe.buildTokenizer(docs, "text", plain, nMerges = 1)
    Bpe.buildTokenizer(docs, "text", sep, nMerges = 1, sepToken = true)
    def vmap(p: String) = spark.read.parquet(s"$p/vocab").collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("token_id")).toMap
    val vp = vmap(plain); val vs = vmap(sep)
    // the SAME tokens, every id exactly one higher — no reordering
    assert(vs.keySet == vp.keySet)
    assert(vp.forall { case (t, id) => vs(t) == id + 1 },
      s"sep vocab not a uniform +1 shift: plain=$vp sep=$vs")
    assert(!vs.values.exists(_ == 0L), "sep id 0 must not be assigned")
    // meta rows
    assert(Bpe.tokenizerMeta(spark, plain) == ((None, 1L, 0L)))
    assert(Bpe.tokenizerMeta(spark, sep) == ((Some(0L), 1L, 1L)))
    // the boundary-marked stream: ids(1)=[2,1,2,1,3,4,1,0] ids(2)=[0]
    // ids(3)=[3,4,1,2,1,0] — concatenated (15 tokens) and cut at L=4
    val enc = Bpe.encodeDocsFromTokenizer(spark, sep, docs, "doc_id", "text")
    val w = graft.ops.Scale.contextWindows(enc, "doc_id", "ids",
      windowLen = 4, insertSep = Some(0L)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getSeq[Long](r.fieldIndex("ids")).toList,
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("spans")).toList
          .map(s => (s.getLong(0), s.getLong(1), s.getLong(2)))))
      .toMap
    assert(w(0L) == ((4L, 1L, List(2L, 1L, 2L, 1L), List((1L, 0L, 4L)))))
    // doc 1's trailing sep closes INSIDE window 1 — still one doc
    assert(w(1L) == ((4L, 1L, List(3L, 4L, 1L, 0L), List((1L, 0L, 4L)))))
    // window 2 spans documents 2 and 3: the empty doc is ONE lone sep
    assert(w(2L) == ((4L, 2L, List(0L, 3L, 4L, 1L),
      List((2L, 0L, 1L), (3L, 1L, 3L)))))
    assert(w(3L) == ((3L, 1L, List(2L, 1L, 0L), List((3L, 0L, 3L)))))
  }

  test("byte fallback: decode(encode(x)) == normalize(x) for arbitrary " +
      "text — unicode, emoji, punctuation; vocab shifts past 256 byte ids") {
    import spark.implicits._
    val train = Seq((1L, "ab ab cd"), (2L, "cd ab")).toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("graft-tok-b").toString
    Bpe.buildTokenizer(train, "text", p, nMerges = 1, byteFallback = true)
    // layout: no sep, bytes at [0, 256), vocab shifted by 256
    assert(Bpe.tokenizerMeta(spark, p) == ((None, 1L, 256L)))
    assert(Bpe.tokenizerByteBase(spark, p) == Some(0L))
    val vocab = spark.read.parquet(s"$p/vocab")
    assert(vocab.agg(min("token_id")).head().getLong(0) == 256L)
    val merges = spark.read.parquet(s"$p/merges")
    // arbitrary serving text: multi-byte chars, emoji (4-byte UTF-8),
    // punctuation, digits, uppercase needing normalization
    val serve = Seq(
      (1L, "ab ab cd"),                  // fully in-vocab
      (4L, "Héllo 東京 ab!"),             // latin-1, CJK, punctuation
      (5L, "ß café 🙂 42"), // sharp-s, emoji, digits
      (6L, "")).toDF("doc_id", "text")
    val enc = Bpe.encodeDocs(serve, "doc_id", "text", merges,
      asciiOnly = false)
    val ids = Bpe.idsFromTokensBytes(enc, "doc_id", vocab, byteBase = 0L)
    val got = ids.collect().map(r => r.getLong(0) ->
      r.getSeq[Long](r.fieldIndex("ids")).toList).toMap
    // in-vocab docs never fall back; OOV docs really do emit byte ids
    assert(got(1L).forall(_ >= 256L), s"doc 1 fell back: ${got(1L)}")
    assert(got(4L).exists(_ < 256L), "doc 4 emitted no byte ids")
    assert(got(5L).exists(_ < 256L), "doc 5 emitted no byte ids")
    assert(got(6L) == Nil)
    // NO NULL holes, ever — that is the point of the byte tier
    assert(ids.filter(expr("exists(ids, i -> i IS NULL)")).count() == 0)
    // the round trip: decode == the tokenizer's own normalization
    // (lowercase, single-space-joined words)
    val dec = Bpe.decodeIdsBytes(ids, "doc_id", vocab, byteBase = 0L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val norm = serve.select(col("doc_id"),
        concat_ws(" ", filter(split(trim(lower(col("text"))), "\\s+"),
          w => w =!= "")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec == norm, s"round trip broke: $dec vs $norm")
    // sep + bytes compose: bytes at [1, 257), vocab shifted by 257
    val ps = java.nio.file.Files.createTempDirectory("graft-tok-bs").toString
    Bpe.buildTokenizer(train, "text", ps, nMerges = 1, sepToken = true,
      byteFallback = true)
    assert(Bpe.tokenizerMeta(spark, ps) == ((Some(0L), 1L, 257L)))
    assert(Bpe.tokenizerByteBase(spark, ps) == Some(1L))
    val vs = spark.read.parquet(s"$ps/vocab")
    assert(vs.agg(min("token_id")).head().getLong(0) == 257L)
    val ids2 = Bpe.idsFromTokensBytes(enc, "doc_id", vs, byteBase = 1L)
    val dec2 = Bpe.decodeIdsBytes(ids2, "doc_id", vs, byteBase = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec2 == norm, "sep+byte layout broke the round trip")
    // legacy artifacts (no byte_base column) read as None
    val pl = java.nio.file.Files.createTempDirectory("graft-tok-l").toString
    spark.range(1).selectExpr("CAST(NULL AS LONG) AS sep_id",
      "1L AS n_merges", "0L AS vocab_shift")
      .write.parquet(s"$pl/meta")
    assert(Bpe.tokenizerByteBase(spark, pl).isEmpty)
    assert(Bpe.tokenizerMeta(spark, pl) == ((None, 1L, 0L)))
    // the SERVING API dispatches on the artifact's byte tier: one
    // encode call and one decode call, byte ids used, text restored —
    // the whole persisted round trip without touching the internals
    val served = Bpe.encodeDocsFromTokenizer(spark, p, serve,
      "doc_id", "text", asciiOnly = false)
    assert(served.filter(expr("exists(ids, i -> i IS NULL)")).count() == 0)
    assert(served.filter(expr("exists(ids, i -> i < 256)")).count() > 0,
      "served encode never fell back to bytes")
    val dec3 = Bpe.decodeIdsFromTokenizer(spark, p, served, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec3 == norm, "from-tokenizer round trip broke")
  }
}
