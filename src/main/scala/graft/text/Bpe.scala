package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich, Haddow &
  * Birch, "Neural machine translation of rare words with subword units",
  * ACL 2016 — the word-level BPE every GPT/Llama-style tokenizer descends
  * from). Reference scope: siuba has nothing like this; it belongs to the
  * training-data extension layer (vocabulary induction over the corpus the
  * model will be trained on).
  *
  * The word-level formulation is what makes this scale: merges never cross
  * word boundaries, so the working set is the DISTINCT-WORD table with
  * frequencies — |V| rows (millions) instead of corpus tokens (trillions at
  * 100 TB). Each merge round is two small jobs over that cached table:
  *   1. pair statistics: explode adjacent token pairs weighted by word
  *     frequency, one partial-combined count aggregate, argmax via
  *     `orderBy(...).limit(1)` (TakeOrderedAndProject — no global sort);
  *   2. apply: broadcast the 1-row winning pair into every word and replace
  *     its occurrences with one `aggregate()` fold per word (greedy
  *     leftmost non-overlapping, the reference semantics) — map-side, pure
  *     Catalyst lambda, no UDF. The updated word table is localCheckpointed
  *     (bounded: |V| rows) so round N+1 folds into values, not a growing
  *     plan — the [[graft.graph.Graph]] iterative-verb pattern.
  *
  * Determinism: counts are exact integers; the argmax tie-breaks on
  * (freq desc, left asc, right asc); the fold is a pure function of the
  * token array — so the learned merge table is bit-identical under any
  * partitioning and replays exactly in DuckDB (q_bpe's generated oracle
  * re-derives every round: same pair stats, same argmax, same greedy
  * application via the gaps-and-islands equivalent of the fold).
  */
object Bpe {

  /** Checkpoint lifecycle of the iterative trainers: tracks the live
    * localCheckpoint block ids of the round's working tables and releases
    * a round's blocks as soon as the next round's checkpoints are
    * materialized — without this, O(nMerges) superseded word/stat tables
    * stay pinned in the block manager for the life of the session. One
    * instance per training run; `release()` at the end drops the final
    * round's blocks (the merge table is driver-collected, so nothing in
    * the result references them).
    */
  private final class CheckpointRotator(sc: org.apache.spark.SparkContext) {
    private var live = Set.empty[Int]
    private var pending = Set.empty[Int]
    def rotate(body: => Unit): Unit = {
      val pre = sc.getPersistentRDDs.keySet.toSet
      body
      val next = sc.getPersistentRDDs.keySet.toSet -- pre
      val stale = live
      live = next
      stale.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
    /** Track a LAZY (eager=false) checkpoint registered by `body` WITHOUT
      * releasing the previous round's blocks yet — a lazy checkpoint's
      * lineage still READS them until its first materializing job, and a
      * local checkpoint cannot recompute after its input is unpersisted.
      * Call [[settle]] right after the job that materialized it. */
    def deferRotate(body: => Unit): Unit = {
      val pre = sc.getPersistentRDDs.keySet.toSet
      body
      pending = pending ++ (sc.getPersistentRDDs.keySet.toSet -- pre)
    }
    /** Promote the pending (now-materialized) checkpoint to live and
      * release the superseded round's blocks. No-op with nothing pending. */
    def settle(): Unit = if (pending.nonEmpty) {
      val stale = live
      live = pending
      pending = Set.empty
      stale.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
    def release(): Unit = {
      (live ++ pending).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      live = Set.empty
      pending = Set.empty
    }
  }

  /** Normalized word-frequency table for [[train]]: lowercase, whitespace
    * tokenization, optionally restricted to `^[a-z]+$` words (`asciiOnly` —
    * recommended when an engine-replay oracle is in play: per-character
    * slicing of multi-byte text is where engines disagree).
    */
  def wordCounts(df: DataFrame, textCol: String,
                 asciiOnly: Boolean = true): DataFrame =
    // same token classes as before (lower/whitespace/`^[a-z]+$`), via the
    // one-pass codegen'd tokenizer Lm.tokens now routes through — the
    // split + two interpreted array-filter lambdas collapse into one call
    df.select(explode(Lm.tokens(col(textCol), asciiOnly)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial tokenization: one token per character plus the `</w>`
    * end-of-word marker (so merges can learn word-final units). Built by
    * substring indexing — the one char-splitting primitive DuckDB and
    * Spark agree on exactly.
    */
  private def charTokens(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit("</w>")))

  /** Greedy leftmost non-overlapping replacement of adjacent pair
    * (left, right) by their concatenation — the reference BPE application —
    * as a single Catalyst `aggregate` fold over the token array. `left` /
    * `right` may be column references (the broadcast winning pair).
    */
  private val applyMergeExpr: String =
    """IF(size(ts) < 2, ts,
      |  aggregate(sequence(0, size(ts) - 1),
      |    named_struct('acc', CAST(array() AS array<string>), 'skip', false),
      |    (s, i) -> IF(s.skip,
      |      named_struct('acc', s.acc, 'skip', false),
      |      IF(i < size(ts) - 1 AND ts[i] = __l AND ts[i + 1] = __r,
      |        named_struct('acc', array_append(s.acc, concat(__l, __r)),
      |                     'skip', true),
      |        named_struct('acc', array_append(s.acc, ts[i]),
      |                     'skip', false))),
      |    s -> s.acc))""".stripMargin

  /** Learn `nMerges` BPE merges over the corpus; returns the merge table
    * (rank, left, right, freq) — rank 1 is the first (most frequent)
    * merge. Stops early if no adjacent pair remains. The per-round argmax
    * winner is a SINGLE row and IS the round's output, so it is collected
    * to the driver (one TakeOrdered job — no winner checkpoint, no
    * broadcast join) and rides into the apply step as two string literals;
    * the merge table is assembled once at the end from the collected rows.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            asciiOnly: Boolean = true): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val spark = df.sparkSession
    val rot = new CheckpointRotator(spark.sparkContext)
    var words: DataFrame = null
    rot.rotate {
      words = wordCounts(df, textCol, asciiOnly)
        .select(col("cnt"),
          charTokens(col("word")).as("ts"))
        .localCheckpoint()
    }
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var done = false
    for (rank <- 1 to nMerges if !done) {
      // ONE job per round: the argmax aggregate computes every partition
      // of `words`, which MATERIALIZES the previous round's lazy
      // checkpoint as a side effect — settle() then releases the round
      // before it. (The eager-per-round form paid a separate checkpoint
      // job on top of the argmax.)
      val win = words
        .select(col("cnt"), explode(when(size(col("ts")) >= 2,
            expr("transform(sequence(0, size(ts) - 2), " +
              "i -> struct(ts[i] AS l, ts[i + 1] AS r))"))
          .otherwise(expr(
            "CAST(array() AS array<struct<l: string, r: string>>)"))).as("p"))
        .groupBy(col("p.l").as("__l"), col("p.r").as("__r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("__l"), col("__r"))
        .limit(1).collect()
      rot.settle()
      if (win.isEmpty) done = true
      else {
        val (l, r, f) =
          (win(0).getString(0), win(0).getString(1), win(0).getLong(2))
        merges += ((rank.toLong, l, r, f))
        // the final round's applied word table has no consumer (the merge
        // it encodes is already in `merges`; the next iteration's argmax
        // is the only reader) — skip its apply fold entirely
        if (rank < nMerges) {
          val prev = words
          rot.deferRotate {
            words = prev
              .withColumn("__l", lit(l)).withColumn("__r", lit(r))
              .select(col("cnt"), expr(applyMergeExpr).as("ts"))
              .localCheckpoint(false)
          }
        }
      }
    }
    rot.release()
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** Adjacent-pair statistics of a (cnt, ts) word table — the relation
    * [[train]] recounts per round and [[trainIncremental]] keeps standing.
    */
  private def pairStats(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), explode(when(size(col("ts")) >= 2,
          expr("transform(sequence(0, size(ts) - 2), " +
            "i -> struct(ts[i] AS l, ts[i + 1] AS r))"))
        .otherwise(expr(
          "CAST(array() AS array<struct<l: string, r: string>>)"))).as("p"))
      .groupBy(col("p.l").as("__l"), col("p.r").as("__r"))
      .agg(sum(col("cnt")).as("freq"))

  /** [[train]] with INCREMENTAL pair-stat maintenance — the production-
    * merge-count form. The full-recount train re-aggregates the entire
    * word table's adjacent pairs every round: exact, and fine at an
    * oracle's 8 merges, but at a real tokenizer's 32k merges that is 32k
    * corpus-wide explode+shuffle rounds. This variant exploits the BPE
    * delta structure: applying merge (l, r) changes pair counts ONLY in
    * words that contain the adjacent pair, so each round
    *   1. takes the argmax of the STANDING stats table (bounded by
    *      distinct pairs — no corpus scan, no explode) and collects the
    *      single winner row to the driver (the merge it names is the
    *      round's output anyway, so the round-latency floor is one
    *      TakeOrdered job, and the winner rides into the word table as
    *      two string LITERALS — no broadcast join, no winner checkpoint);
    *   2. splits the word table map-side into affected (contains the
    *      winning adjacent pair) and untouched;
    *   3. re-derives pair stats for the AFFECTED words only, folding
    *      (new − old) into the standing stats.
    * The shuffled delta relation is proportional to the affected words'
    * pair count — on a realistic corpus a fast-shrinking fraction of |V|
    * (BpeSpec's "trainIncremental" tests pin bit-identity to [[train]] at
    * 512 merges on sf0.01 documents — augmented with deterministic words,
    * the synthetic corpus' own vocabulary being too small to sustain 512
    * rounds — AND, via `onRound`, that the affected-word fraction
    * collapses after the early rounds) —
    * while results are bit-identical to [[train]]: the deltas are exact
    * integers, the standing table after round k equals a full recount
    * (only freq > 0 pairs exist in both), and the argmax tie-breaks are
    * shared. Round checkpoints are released once superseded and the merge
    * table is assembled ONCE from the driver-collected winner rows
    * (`createDataFrame`, not an nMerges-leaf Union), so both executor
    * memory (~2·(|V| + |pairs|)) and driver plan size stay flat at any
    * merge count. Remaining ceiling: one argmax job per merge — the known
    * escape is batching non-interacting merges per round.
    *
    * `onRound(rank, nAffected, nWords)` is optional instrumentation
    * (specs/audits); it costs two extra counts per round when set.
    */
  def trainIncremental(df: DataFrame, textCol: String, nMerges: Int,
                       asciiOnly: Boolean = true,
                       onRound: (Int, Long, Long) => Unit = null): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val spark = df.sparkSession
    val rot = new CheckpointRotator(spark.sparkContext)
    var words: DataFrame = null
    var stats: DataFrame = null
    rot.rotate {
      words = wordCounts(df, textCol, asciiOnly)
        .select(col("cnt"), charTokens(col("word")).as("ts"))
        .localCheckpoint()
      stats = pairStats(words).localCheckpoint()
    }
    // the per-round affected ∪ untouched union would otherwise DOUBLE the
    // checkpointed word table's partition count every round (2^rounds
    // partitions by round 10 — scheduling, not data, becomes the cost);
    // coalesce (narrow, no shuffle) pins it to the initial layout
    val nPart = words.rdd.getNumPartitions
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var done = false
    for (rank <- 1 to nMerges if !done) {
      val win = stats
        .orderBy(col("freq").desc, col("__l"), col("__r"))
        .limit(1).collect()
      if (win.isEmpty) done = true
      else {
        val (l, r, f) =
          (win(0).getString(0), win(0).getString(1), win(0).getLong(2))
        merges += ((rank.toLong, l, r, f))
        // the winner rides into a map-side contains test as literals; only
        // hit words pay the re-pair + merge work
        val flagged = words
          .withColumn("__l", lit(l)).withColumn("__r", lit(r))
          .withColumn("__hit", size(col("ts")) >= 2 &&
            expr("exists(sequence(0, size(ts) - 2), " +
              "i -> ts[i] = __l AND ts[i + 1] = __r)"))
        val affected = flagged.where(col("__hit")).select("cnt", "ts", "__l", "__r")
        val untouched = flagged.where(!col("__hit")).select("cnt", "ts")
        val merged = affected.select(col("cnt"), expr(applyMergeExpr).as("ts"))
        if (onRound != null) {
          // one job for both instrumentation counts, not two
          val c = flagged.agg(
            coalesce(sum(when(col("__hit"), 1L).otherwise(0L)), lit(0L)),
            count(lit(1))).head()
          onRound(rank, c.getLong(0), c.getLong(1))
        }
        // the final round's updated word/stat tables have no consumer
        // (the next round's argmax is the only reader) — skip their
        // apply-fold + delta-fold checkpoint jobs
        if (rank < nMerges) {
          val delta = pairStats(affected.select("cnt", "ts"))
            .withColumn("freq", -col("freq"))
            .unionByName(pairStats(merged))
          val prevStats = stats
          rot.rotate {
            words = untouched.unionByName(merged).coalesce(nPart)
              .localCheckpoint()
            stats = prevStats.unionByName(delta)
              .groupBy("__l", "__r").agg(sum("freq").as("freq"))
              .where(col("freq") > 0)
              .localCheckpoint()
          }
        }
      }
    }
    rot.release()
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** Greedy leftmost application of EVERY merge in the `__bm` struct array
    * (rank order) to the `ts` token array — [[applyMergeExpr]] folded over
    * a batch. Batch members are token-disjoint by [[trainIncrementalBatched]]
    * construction, so per-word application order cannot matter; rank order
    * is used anyway for clarity.
    */
  private val applyBatchExpr: String =
    """aggregate(__bm, ts,
      |  (ts, mg) -> IF(size(ts) < 2, ts,
      |    aggregate(sequence(0, size(ts) - 1),
      |      named_struct('acc', CAST(array() AS array<string>), 'skip', false),
      |      (s, i) -> IF(s.skip,
      |        named_struct('acc', s.acc, 'skip', false),
      |        IF(i < size(ts) - 1 AND ts[i] = mg.l AND ts[i + 1] = mg.r,
      |          named_struct('acc', array_append(s.acc, concat(mg.l, mg.r)),
      |                       'skip', true),
      |          named_struct('acc', array_append(s.acc, ts[i]),
      |                       'skip', false))),
      |      s -> s.acc)))""".stripMargin

  /** [[trainIncremental]] with MULTIPLE NON-INTERACTING merges applied per
    * round — the escape from the one-argmax-job-per-merge round-latency
    * ceiling. Each round collects the standing table's top `maxBatch`
    * pairs plus their tokens' adjacency maxima (two bounded TakeOrdered/
    * aggregate jobs), then selects the longest PREFIX m_1..m_k of the rank
    * order such that
    *   1. the batch is pairwise token-disjoint, counting each merge's
    *      OUTPUT token l‖r as well as l and r — so applying m_j can change
    *      neither m_i's count (destruction touches only pairs adjacent to
    *      l_j/r_j) nor its identity; and
    *   2. freq(m_i) strictly exceeds every earlier member's GROWN-PAIR
    *      ceiling S_j + B_j, where
    *      B_j = max(max_x freq(x, l_j), max_y freq(r_j, y)) bounds pairs
    *      CREATED by applying (l_j, r_j) — a created pair is
    *      (x, l_j‖r_j) or (l_j‖r_j, y), and each of its instances was an
    *      instance of (x, l_j) / (r_j, y) in the standing table — and
    *      S_j = max freq of STANDING pairs already involving the token
    *      l_j‖r_j covers the augmentation case: if the output string
    *      already exists as a token (reachable through a different merge
    *      decomposition — "abc" via (a, bc) standing while (ab, c) wins),
    *      the created instances ADD to that standing pair's count, so the
    *      post-apply count is bounded by S_j + B_j, not B_j. The strict
    *      inequality means no created-or-augmented pair can overtake (or
    *      tie) m_i in the sequential argmax.
    * The PREFIX discipline (stop at the first rejected pair, never skip
    * over it) is what makes this EXACT: a rejected pair is still standing,
    * still outranks every later candidate, and sequential [[train]] would
    * pick it (or a pair it spawns) next — so the batch must end there.
    * Under 1+2 the sequential argmax provably selects exactly
    * m_1, …, m_k in order with their standing frequencies, hence the merge
    * table is BIT-IDENTICAL to [[train]]/[[trainIncremental]] (BpeSpec
    * pins it at 512 merges, on randomized micro-corpora, and on a planted
    * decomposition-collision corpus aimed at the augmentation case).
    *
    * Cost: ~3 driver jobs per ROUND (argmax, adjacency maxima, delta fold)
    * instead of per MERGE. Honest measured compression: 354 rounds for 512
    * merges on BpeSpec's flat-tail corpus, 302 on a Zipf-weighted one
    * (~1.5–1.7×) — EXACT batching is fundamentally tie-limited, because a
    * candidate whose frequency merely EQUALS an earlier member's
    * created-pair ceiling could lose the sequential argmax on the
    * lexicographic tie-break to a pair that does not exist yet, so the
    * prefix must stop there. Corpora with spread-out tail frequencies
    * batch better; a tie-dense tail degenerates to one merge per round by
    * design, not by accident. `onRound(round, batchSize)` is optional
    * instrumentation.
    */
  def trainIncrementalBatched(df: DataFrame, textCol: String, nMerges: Int,
                              asciiOnly: Boolean = true, maxBatch: Int = 32,
                              onRound: (Int, Int) => Unit = null): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    require(maxBatch >= 1, "maxBatch must be >= 1")
    val spark = df.sparkSession
    val rot = new CheckpointRotator(spark.sparkContext)
    var words: DataFrame = null
    var stats: DataFrame = null
    rot.rotate {
      words = wordCounts(df, textCol, asciiOnly)
        .select(col("cnt"), charTokens(col("word")).as("ts"))
        .localCheckpoint()
      stats = pairStats(words).localCheckpoint()
    }
    val nPart = words.rdd.getNumPartitions
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var round = 0
    var done = false
    while (merges.size < nMerges && !done) {
      val top = stats
        .orderBy(col("freq").desc, col("__l"), col("__r"))
        .limit(maxBatch).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) done = true
      else {
        // adjacency + output-token maxima over the candidates' tokens, ONE
        // bounded job: for each candidate left token a, max freq of
        // standing (x, a); for each right token b, max freq of standing
        // (b, y); for each candidate OUTPUT string a‖b, max freq of
        // standing pairs already involving that token (the augmentation
        // leg of the ceiling)
        val ls = top.map(_._1).distinct.toSeq
        val rs = top.map(_._2).distinct.toSeq
        val outs = top.map(p => p._1 + p._2).distinct.toSeq
        val adj = stats.where(col("__r").isin(ls: _*))
          .groupBy(col("__r").as("tok")).agg(max("freq").as("m"))
          .withColumn("side", lit("asRight"))
          .unionByName(stats.where(col("__l").isin(rs: _*))
            .groupBy(col("__l").as("tok")).agg(max("freq").as("m"))
            .withColumn("side", lit("asLeft")))
          .unionByName(stats
            .where(col("__l").isin(outs: _*) || col("__r").isin(outs: _*))
            .select(explode(array(col("__l"), col("__r"))).as("tok"),
              col("freq"))
            .where(col("tok").isin(outs: _*))
            .groupBy("tok").agg(max("freq").as("m"))
            .withColumn("side", lit("asOut")))
          .collect()
          .map(r => (r.getString(2), r.getString(0)) -> r.getLong(1)).toMap
        // prefix selection under the disjointness + grown-pair bound
        val batch =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var used = Set.empty[String]
        var ceiling = Long.MinValue
        var stop = false
        for ((l, r, f) <- top if !stop) {
          val toks = Set(l, r, l + r)
          if (merges.size + batch.size >= nMerges ||
              toks.exists(used.contains) ||
              (batch.nonEmpty && f <= ceiling)) stop = true
          else {
            batch += ((l, r, f))
            used ++= toks
            val bj = math.max(
              adj.getOrElse(("asRight", l), 0L),
              adj.getOrElse(("asLeft", r), 0L))
            val sj = adj.getOrElse(("asOut", l + r), 0L)
            ceiling = math.max(ceiling, bj + sj)
          }
        }
        round += 1
        if (onRound != null) onRound(round, batch.size)
        for ((l, r, f) <- batch)
          merges += ((merges.size + 1L, l, r, f))
        val bm = array(batch.map { case (l, r, _) =>
          struct(lit(l).as("l"), lit(r).as("r")) }.toSeq: _*)
        // U+0001 is a pair-key SENTINEL, not a parser: with asciiOnly=false
        // a token containing a literal U+0001 could make two different
        // pairs render the same delimited key and falsely flag a word as
        // affected. That is SAFE — the prefilter only routes words into the
        // affected leg, applyBatchExpr re-checks real token equality before
        // merging, and an unmerged affected word contributes +pairStats and
        // -pairStats delta rows that cancel exactly — so the sentinel is a
        // false-positive-only filter by construction, never a correctness
        // input.
        val bk = array(batch.map { case (l, r, _) =>
          lit(l + "\u0001" + r) }.toSeq: _*)
        // the final round's updated word/stat tables have no consumer
        // (the next round's argmax is the only reader) — skip their
        // apply-fold + delta-fold checkpoint jobs once the merge budget
        // is exhausted
        if (merges.size < nMerges) {
          val flagged = words.withColumn("__bm", bm).withColumn("__bk", bk)
            .withColumn("__hit", size(col("ts")) >= 2 &&
              expr("exists(sequence(0, size(ts) - 2), " +
                "i -> array_contains(__bk, concat(ts[i], chr(1), ts[i + 1])))"))
          val affected = flagged.where(col("__hit"))
            .select("cnt", "ts", "__bm")
          val untouched = flagged.where(!col("__hit")).select("cnt", "ts")
          val merged = affected.select(col("cnt"),
            expr(applyBatchExpr).as("ts"))
          val delta = pairStats(affected.select("cnt", "ts"))
            .withColumn("freq", -col("freq"))
            .unionByName(pairStats(merged))
          val prevStats = stats
          rot.rotate {
            words = untouched.unionByName(merged).coalesce(nPart)
              .localCheckpoint()
            stats = prevStats.unionByName(delta)
              .groupBy("__l", "__r").agg(sum("freq").as("freq"))
              .where(col("freq") > 0)
              .localCheckpoint()
          }
        }
      }
    }
    rot.release()
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** Pair-presence prefilter for the one-pass encode: a merge (l, r) can
    * fire on a word ONLY if l||r occurs as a contiguous substring of
    * word||"</w>" — every token the fold ever holds is a contiguous
    * substring of word||"</w>" (single chars + the marker initially;
    * merging adjacent tokens concatenates adjacent substrings — induction),
    * so adjacent tokens equal to (l, r) imply the concatenation occurs.
    * Filtering the broadcast merge array per word on this test is
    * therefore a pure no-op on semantics (filtered merges could never
    * fire) and makes the fold's cost track WORD CONTENT instead of vocab
    * size: at a serving tokenizer's 32k merges a word folds only the few
    * dozen merges whose pieces it actually contains, not all 32k.
    */
  private val applicableMergesExpr: String =
    """filter(__ms,
      |  mg -> instr(concat(word, '</w>'), concat(mg.l, mg.r)) > 0)""".stripMargin

  /** The one-pass encode kernel: fold the rank-ordered merge array —
    * prefiltered per word by [[applicableMergesExpr]] — over a word's char
    * tokens. The outer `aggregate` walks the surviving merges in rank
    * order (filter preserves order), the inner `aggregate` is the same
    * greedy leftmost non-overlapping replacement as [[applyMergeExpr]]
    * with the pair read from the outer lambda's merge struct. Pure
    * Catalyst, so ALL applications are one projection — the per-word cost
    * is the substring prefilter (cheap scalar scans) plus a token-array
    * walk per APPLICABLE merge, without nMerges chained Spark jobs.
    */
  private val encodeAllExpr: String =
    s"""aggregate($applicableMergesExpr,
      |  concat(transform(sequence(1, length(word)),
      |           i -> substr(word, i, 1)),
      |         array('</w>')),
      |  (ts, mg) -> IF(size(ts) < 2, ts,
      |    aggregate(sequence(0, size(ts) - 1),
      |      named_struct('acc', CAST(array() AS array<string>), 'skip', false),
      |      (s, i) -> IF(s.skip,
      |        named_struct('acc', s.acc, 'skip', false),
      |        IF(i < size(ts) - 1 AND ts[i] = mg.l AND ts[i + 1] = mg.r,
      |          named_struct('acc', array_append(s.acc, concat(mg.l, mg.r)),
      |                       'skip', true),
      |          named_struct('acc', array_append(s.acc, ts[i]),
      |                       'skip', false))),
      |      s -> s.acc)))""".stripMargin

  /** Tokenize words with a learned merge table — the encode half (exact,
    * not the fast-path trie a serving tokenizer would build; at pipeline
    * scale tokenization is batch anyway). Returns (word, tokens).
    *
    * ONE job over the word table at any merge-table size: the rank-ordered
    * merges ride a 1-row scalar-aggregate broadcast (`array_sort` of the
    * collected (rank, l, r) structs — struct ordering leads on `rank`) into
    * every word, and [[encodeAllExpr]] applies all of them in a single
    * fold. The earlier formulation replayed merges as nMerges sequential
    * projections (checkpoint every 8) — correct, but at a real tokenizer's
    * 32k merges that is thousands of chained driver-scheduled jobs over a
    * small table. Semantics are identical (BpeSpec pins one-pass == replay
    * and the single-job shape); the replay survives as
    * [[encodeWordsReplay]], the differential oracle.
    */
  def encodeWords(words: DataFrame, wordCol: String,
                  merges: DataFrame): DataFrame = {
    val ms = merges.agg(array_sort(collect_list(struct(
      col("rank"), col("left").as("l"), col("right").as("r")))).as("__ms"))
    words.select(col(wordCol).as("word")).distinct()
      .crossJoin(broadcast(ms))
      .select(col("word"), expr(encodeAllExpr).as("tokens"))
  }

  /** How many merges survive [[applicableMergesExpr]]'s per-word
    * prefilter — the instrumentation behind BpeSpec's pin that the encode
    * fold's work tracks word content, not merge-table size. Output:
    * (word, n_applicable).
    */
  private[graft] def applicableMergeCounts(words: DataFrame, wordCol: String,
                                           merges: DataFrame): DataFrame = {
    val ms = merges.agg(array_sort(collect_list(struct(
      col("rank"), col("left").as("l"), col("right").as("r")))).as("__ms"))
    words.select(col(wordCol).as("word")).distinct()
      .crossJoin(broadcast(ms))
      .select(col("word"),
        size(expr(applicableMergesExpr)).cast("long").as("n_applicable"))
  }

  /** Tokenize WHOLE DOCUMENTS with a learned merge table — the corpus
    * tokenization pass every pretraining pipeline ends with, built on
    * the Zipf economy: the expensive encode ([[encodeWords]]'s one-pass
    * merge fold) runs once per DISTINCT word, and the corpus-sized work
    * is one hash equi-join of the (id, pos, word) stream against that
    * vocabulary plus a position-ordered per-doc reassembly (bounded by
    * document length — chunk book-length outliers upstream with
    * [[TextFns.chunkDocs]], the [[Lm.scoreDocs]] caveat). Same
    * tokenization as [[wordCounts]] (lower/whitespace/`^[a-z]+$`), so
    * train and encode can never disagree on the word universe. Output:
    * (idCol, tokens, n_tokens) — token-less docs get an empty array, not
    * a dropped row. The n_tokens column is what token-budget mixing and
    * packing consume ([[graft.ops.Scale.temperatureQuotasByWeight]],
    * `packByBudget`) — post-BPE counts, not whitespace estimates.
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 merges: DataFrame, asciiOnly: Boolean = true): DataFrame = {
    val toks = docs
      .select(col(idCol), Lm.tokens(col(textCol), asciiOnly).as("__ws"))
      .select(col(idCol), posexplode_outer(col("__ws")).as(Seq("pos", "word")))
    val vocab = encodeWords(toks.filter(col("word").isNotNull),
      "word", merges)
    toks.join(vocab, Seq("word"), "left")
      .groupBy(idCol)
      .agg(collect_list(when(col("word").isNotNull,
        struct(col("pos"), col("tokens")))).as("__ps"))
      .select(col(idCol),
        expr("flatten(transform(array_sort(__ps), s -> s.tokens))")
          .as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Frequency-ranked vocabulary of a tokenized corpus ([[encodeDocs]]
    * output): (token, n_occur, token_id) with contiguous ids 0..V−1
    * assigned by (occurrences desc, token asc) — the id assignment every
    * tokenizer ships. The rank is
    * [[graft.ops.Scale.globalRowNumber]]'s range-partitioned two-phase
    * ordinal, never a global window over the token table (a 32k-merge
    * vocabulary is small, but a char-fallback or corpus-specific token
    * universe need not be, and the plan shape should not depend on that).
    */
  def vocabTable(encoded: DataFrame): DataFrame = {
    val counts = encoded.select(explode(col("tokens")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occur"))
    graft.ops.Scale.globalRowNumber(counts,
        Seq(col("n_occur").desc, col("token").asc), "__rn")
      .select(col("token"), col("n_occur"),
        (col("__rn") - 1L).as("token_id"))
  }

  /** Map a tokenized corpus to ID sequences against a [[vocabTable]]:
    * (idCol, ids, n_tokens) — the (doc → int array) form training data
    * finally ships as. Same shapes as [[encodeDocs]]' reassembly: one
    * hash equi-join of the (id, pos, token) stream against the
    * vocabulary, one position-ordered per-doc fold; a token absent from
    * the vocabulary surfaces as a NULL element at its position — visible
    * in the output, never a silent drop that would shift every later id
    * — so pass a vocab built from the SAME encoded corpus (or a
    * superset) when NULLs are unacceptable.
    */
  def idsFromTokens(encoded: DataFrame, idCol: String,
                    vocab: DataFrame): DataFrame = {
    val ex = encoded.select(col(idCol),
      posexplode_outer(col("tokens")).as(Seq("pos", "token")))
    ex.join(vocab.select("token", "token_id"), Seq("token"), "left")
      .groupBy(idCol)
      .agg(collect_list(when(col("token").isNotNull,
        struct(col("pos"), col("token_id")))).as("__ps"))
      .select(col(idCol),
        expr("transform(array_sort(__ps), s -> s.token_id)").as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** Decode id sequences back to text against a [[vocabTable]] — the
    * tokenizer round trip a dataloader debugger and a detokenizing
    * sampler both need: ids map through the vocabulary (one hash
    * equi-join), each document's tokens concatenate in position order,
    * and word-end markers ("&lt;/w&gt;") become spaces. Exact inverse of
    * [[encodeDocs]]→[[idsFromTokens]] over the normalized token stream:
    * decode(encode(text)) == the tokenizer's own normalization of text
    * (lowercased ascii words joined by single spaces) — the round-trip
    * identity IS q_detokenize's oracle, computed without touching BPE at
    * all. NULL ids (characters unseen at train time,
    * [[idsFromTokens]]' visible sentinel) drop out of the join — decode
    * only what the vocabulary can name. Output: (idCol, text); id-less
    * docs keep an empty-string row.
    */
  def decodeIds(ids: DataFrame, idCol: String, vocab: DataFrame): DataFrame = {
    val ex = ids.select(col(idCol),
      posexplode_outer(col("ids")).as(Seq("pos", "token_id")))
    ex.join(vocab.select("token_id", "token"), Seq("token_id"))
      .groupBy(idCol)
      .agg(collect_list(struct(col("pos"), col("token"))).as("__ps"))
      .select(col(idCol),
        expr("trim(replace(array_join(transform(array_sort(__ps)," +
          " s -> s.token), ''), '</w>', ' '))").as("text"))
      .join(ids.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol), coalesce(col("text"), lit("")).as("text"))
  }

  /** [[vocabTable]] truncated to the `k` most frequent tokens — the
    * fixed-size vocabulary every production tokenizer ships (ids stay the
    * contiguous frequency ranks 0..k−1; the cut is rank-based, so it is
    * deterministic under the same (count desc, token asc) order).
    */
  def vocabTruncate(vocab: DataFrame, k: Long): DataFrame = {
    require(k > 0, "k must be positive")
    vocab.filter(col("token_id") < k)
  }

  /** Per-group VOCABULARY COVERAGE of a tokenized corpus against a
    * (possibly [[vocabTruncate]]d) vocabulary — the data-card column
    * that says how much of each source a closed vocabulary actually
    * represents: total post-BPE tokens, tokens missing from the vocab,
    * and the OOV rate. A rising OOV rate on a new crawl slice is the
    * retrain-the-tokenizer signal; per-source it also localizes WHICH
    * mixture component drifted (the fastText UNK-rate monitoring idea).
    * Exact integer counts + one guarded 6dp division; one explode, one
    * hash join to the group column, one left join against the vocab,
    * one aggregate — nothing scales past the token stream the encode
    * already produced. Output: (byCol, n_tokens, n_oov, oov_rate);
    * groups whose docs carry no tokens do not appear (there is nothing
    * to rate). Oracled end to end (q_vocab_coverage).
    */
  def vocabCoverage(encoded: DataFrame, idCol: String, vocab: DataFrame,
                    by: DataFrame, byCol: String): DataFrame = {
    val toks = encoded.select(col(idCol), explode(col("tokens")).as("token"))
    toks.join(by.select(col(idCol), col(byCol)), Seq(idCol))
      .join(vocab.select(col("token"), lit(1).as("__in")),
        Seq("token"), "left")
      .groupBy(byCol)
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum(when(col("__in").isNull, 1L)), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov") / col("n_tokens"), 6))
  }

  /** ONE INGEST STEP of the cumulative OOV monitor — [[vocabCoverage]]
    * watched on the stream (the
    * [[graft.ml.Eval.eceMonitorIngest]] pattern applied to tokenizer
    * drift): each arriving micro-batch encodes against the FROZEN
    * persisted tokenizer, its per-group (n_tokens, n_oov) counts fold
    * into the standing totals (mergeable exact longs, one row per
    * group — mixture components, bounded like class labels), and the
    * emitted report is the cumulative coverage of everything streamed
    * so far — bit-identical to the one-shot [[vocabCoverage]] over the
    * union (StreamingSpec pins it). A rising per-source `oov_rate` is
    * the live retrain-the-tokenizer signal.
    *
    * Hardening (the [[graft.ops.CarryState]] conventions): marker-swap
    * crash consistency; the foreachBatch `batchId` + the batch's id-set
    * fingerprint (XOR of 60-bit md5 id leaves — the shared ingest
    * convention) ride in meta so a replayed batch RE-EMITS the current
    * report instead of double-counting; and the meta records the
    * tokenizer's identity (merge count, vocab shift, vocab limit) —
    * counts accumulated under one tokenizer cannot silently merge with
    * another's, so a mismatch fails loudly.
    */
  def oovMonitorIngest(spark: org.apache.spark.sql.SparkSession,
                       statePath: String, batch: DataFrame, idCol: String,
                       textCol: String, byCol: String, tokPath: String,
                       vocabLimit: Long = Long.MaxValue,
                       batchId: Long = -1L): DataFrame = {
    val cs = graft.ops.CarryState.open(spark, statePath)
    val hasState = cs.exists
    val meta: Option[org.apache.spark.sql.Row] = if (hasState)
      Some(spark.read.parquet(s"$statePath/carry/meta").head()) else None
    val (_, nMerges, vocabShift) = tokenizerMeta(spark, tokPath)
    meta.foreach { m =>
      require(m.getAs[Long]("n_merges") == nMerges &&
        m.getAs[Long]("vocab_shift") == vocabShift &&
        m.getAs[Long]("vocab_limit") == vocabLimit,
        "oovMonitorIngest: state was accumulated under a different " +
          "tokenizer or vocab limit — coverage counts cannot merge")
    }
    val standing: Map[String, (Long, Long)] = if (hasState)
      spark.read.parquet(s"$statePath/carry/totals").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      else Map.empty
    val merges = readMergesArtifact(spark, tokPath)
    val vocab0 = readVocabArtifact(spark, tokPath)
    val vocab = if (vocabLimit == Long.MaxValue) vocab0
                else vocabTruncate(vocab0, vocabLimit)
    val enc = encodeDocs(batch, idCol, textCol, merges)
    val cov = vocabCoverage(enc, idCol, vocab,
        batch.select(col(idCol), col(byCol).cast("string").as(byCol)),
        byCol)
      .select(col(byCol), col("n_tokens"), col("n_oov")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // replay evidence = the batch's ID SET (the bitXorFpSql convention
    // shared with contextWindowsIngest/shardManifestIngest), not the
    // derived per-group totals: aggregated counts collide far more
    // easily than 60-bit id XORs, and for batchId-less callers a
    // genuinely new batch that happened to reproduce the last totals
    // would be silently swallowed as a replay
    val bst = batch.agg(count(lit(1)).as("n"),
      coalesce(expr(s"bit_xor(${graft.ops.Scale.bitXorFpSql(idCol)})"),
        lit(0L)).as("fp")).head()
    val fp = bst.getAs[Long]("fp")
    val n = bst.getAs[Long]("n")
    import spark.implicits._
    def report(rows: Map[String, (Long, Long)]): DataFrame =
      rows.toSeq.map { case (g, (nt, no)) => (g, nt, no) }
        .toDF(byCol, "n_tokens", "n_oov")
        .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))
    if (graft.ops.CarryState.isReplay("oovMonitorIngest", batchId, fp, n,
        meta))
      return report(standing)
    val merged = (standing.keySet ++ cov.map(_._1)).map { g =>
      val (t0, o0) = standing.getOrElse(g, (0L, 0L))
      val (t1, o1) = cov.toMap.getOrElse(g, (0L, 0L))
      g -> (t0 + t1, o0 + o1)
    }.toMap
    graft.ops.CarryState.commit(cs) { dir =>
      merged.toSeq.map { case (g, (nt, no)) => (g, nt, no) }
        .toDF(byCol, "n_tokens", "n_oov").repartition(1)
        .write.mode("overwrite").parquet(s"$dir/totals")
      spark.range(1).select(lit(nMerges).as("n_merges"),
          lit(vocabShift).as("vocab_shift"),
          lit(vocabLimit).as("vocab_limit"),
          lit(batchId).as("last_batch_id"), lit(fp).as("last_fp"),
          lit(n).as("last_n"))
        .write.mode("overwrite").parquet(s"$dir/meta")
    }
    report(merged)
  }

  /** [[idsFromTokens]] with OOV tokens mapped to a designated `unkId`
    * instead of NULL — the closed-vocabulary serving form (pair with
    * [[vocabTruncate]]; the GPT-2 byte-BPE never needs UNK, but every
    * word-level and truncated vocabulary does). Position arithmetic is
    * identical to [[idsFromTokens]]; only the missing-id policy changes,
    * so n_tokens still counts every token.
    */
  def idsFromTokensWithUnk(encoded: DataFrame, idCol: String,
                           vocab: DataFrame, unkId: Long): DataFrame = {
    val ex = encoded.select(col(idCol),
      posexplode_outer(col("tokens")).as(Seq("pos", "token")))
    ex.join(vocab.select("token", "token_id"), Seq("token"), "left")
      .groupBy(idCol)
      .agg(collect_list(when(col("token").isNotNull,
        struct(col("pos"),
          coalesce(col("token_id"), lit(unkId)).as("token_id")))).as("__ps"))
      .select(col(idCol),
        expr("transform(array_sort(__ps), s -> s.token_id)").as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** [[idsFromTokens]] with BYTE-LEVEL FALLBACK — the lossless-serving
    * tier (sentencepiece's `--byte_fallback`, the reason GPT-2-class
    * tokenizers are byte-level): a token absent from the vocabulary is
    * encoded as its UTF-8 BYTES, one reserved id per byte value
    * (`byteBase + b`, 256 ids), instead of a lossy UNK or a NULL hole —
    * so decode(encode(x)) == x's normalization for ARBITRARY text, any
    * script, any symbol. In-vocabulary tokens map exactly as
    * [[idsFromTokens]]; only the missing-id policy changes. Output:
    * (idCol, ids, n_tokens) — n_tokens counts the emitted IDS (a
    * fallen-back token contributes one id per UTF-8 byte), the number a
    * token-budget packer actually consumes.
    *
    * Same 100 TB shapes as [[idsFromTokens]]: one hash equi-join of the
    * (id, pos, token) stream against the vocabulary, one
    * position-ordered per-doc fold; the byte expansion is a map-side
    * `transform` over the token's own bytes.
    */
  def idsFromTokensBytes(encoded: DataFrame, idCol: String,
                         vocab: DataFrame, byteBase: Long): DataFrame = {
    require(byteBase >= 0, "byteBase must be nonnegative")
    // UTF-8 bytes of the OOV token as reserved ids: hex() renders each
    // byte of a binary as exactly two hex digits, so byte i is
    // conv(hex(substring(bin, i, 1)), 16, 10)
    val byteIds =
      s"""transform(sequence(1, octet_length(encode(token, 'UTF-8'))),
         |  i -> $byteBase + CAST(conv(hex(substring(
         |    encode(token, 'UTF-8'), i, 1)), 16, 10) AS LONG))""".stripMargin
    val ex = encoded.select(col(idCol),
      posexplode_outer(col("tokens")).as(Seq("pos", "token")))
    ex.join(vocab.select("token", "token_id"), Seq("token"), "left")
      .groupBy(idCol)
      .agg(collect_list(when(col("token").isNotNull,
        struct(col("pos"),
          when(col("token_id").isNotNull, array(col("token_id")))
            .otherwise(expr(byteIds)).as("tids")))).as("__ps"))
      .select(col(idCol),
        expr("flatten(transform(array_sort(__ps), s -> s.tids))").as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }

  /** [[decodeIds]] for id sequences that may contain BYTE-FALLBACK ids
    * ([[idsFromTokensBytes]]): vocabulary ids decode through the vocab
    * join as before; ids in [byteBase, byteBase+256) decode to their
    * raw byte. Bytes and token strings are assembled as BINARY in
    * position order and UTF-8-decoded ONCE per document — a multi-byte
    * character split across several byte ids reassembles exactly
    * (decoding byte-by-byte would mangle it), then word-end markers
    * become spaces. Ids that are neither (vocabulary holes) drop out,
    * [[decodeIds]]' contract. Output: (idCol, text); id-less docs keep
    * an empty-string row.
    */
  def decodeIdsBytes(ids: DataFrame, idCol: String, vocab: DataFrame,
                     byteBase: Long): DataFrame = {
    require(byteBase >= 0, "byteBase must be nonnegative")
    val ex = ids.select(col(idCol),
      posexplode_outer(col("ids")).as(Seq("pos", "token_id")))
    ex.join(vocab.select("token_id", "token"), Seq("token_id"), "left")
      .withColumn("__bin",
        when(col("token_id").between(byteBase, byteBase + 255L),
          expr(s"unhex(lpad(hex(token_id - $byteBase), 2, '0'))"))
          .otherwise(expr("encode(token, 'UTF-8')")))
      .filter(col("__bin").isNotNull)
      .groupBy(idCol)
      .agg(collect_list(struct(col("pos"), col("__bin"))).as("__ps"))
      .select(col(idCol),
        expr("trim(replace(decode(aggregate(" +
          "transform(array_sort(__ps), s -> s.__bin), " +
          "CAST('' AS BINARY), (a, x) -> concat(a, x)), 'UTF-8')," +
          " '</w>', ' '))").as("text"))
      .join(ids.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol), coalesce(col("text"), lit("")).as("text"))
  }

  /** Persist a trained tokenizer as a standing artifact — `<path>/merges`
    * (the rank-ordered merge table) and `<path>/vocab` (the
    * frequency-ranked id table) — the train-once / serve-forever split
    * of [[graft.text.Lm.buildBackoffModel]] / [[graft.ml.Sq.buildSqIndex]]
    * applied to the tokenizer: the training corpus is scanned once, and
    * every future batch or stream encodes against the frozen parquet
    * ([[encodeDocsFromTokenizer]],
    * [[graft.streaming.StreamVerbs.streamingTokenize]]). The vocabulary
    * is computed WITHOUT re-tokenizing the corpus: each distinct word's
    * token multiset rides its word count, so token occurrences are
    * Σ cnt(word) · multiplicity — integer-identical to counting over the
    * fully encoded corpus ([[vocabTable]]), at vocabulary cost.
    *
    * `sepToken=true` reserves a document-separator id — GPT-2's
    * `<|endoftext|>` convention, placed at id 0 with every vocabulary id
    * shifted up by one (id = rank instead of rank−1) — and records it in
    * `<path>/meta` (one row: sep_id, n_merges, vocab_shift, byte_base).
    * The separator never appears as a `vocab` row (it is not a corpus
    * token); consumers read its id from meta and thread it into
    * [[graft.ops.Scale.contextWindows]]' `insertSep`. `<path>/meta` is
    * written for plain tokenizers too (sep_id NULL, vocab_shift 0), so
    * readers need one code path.
    *
    * `byteFallback=true` additionally reserves 256 BYTE ids right after
    * the separator (ids [byte_base, byte_base+256), byte_base = 1 with
    * a sep, 0 without; the vocabulary shifts past them) and records
    * `byte_base` in meta — the lossless-serving tier: encoding via
    * [[idsFromTokensBytes]] maps out-of-vocabulary tokens to their
    * UTF-8 byte ids instead of UNK/NULL, so
    * [[decodeIdsBytes]](encode(x)) == normalize(x) for ARBITRARY text
    * (sentencepiece `--byte_fallback` semantics). Like the separator,
    * byte ids never appear as `vocab` rows.
    */
  def buildTokenizer(df: DataFrame, textCol: String, path: String,
                     nMerges: Int, asciiOnly: Boolean = true,
                     sepToken: Boolean = false,
                     byteFallback: Boolean = false): Unit = {
    val merges = train(df, textCol, nMerges, asciiOnly)
    merges.write.mode("overwrite").parquet(s"$path/merges")
    val spark = df.sparkSession
    val frozen = readMergesArtifact(spark, path)
    val wc = wordCounts(df, textCol, asciiOnly)
    val counts = encodeWords(wc, "word", frozen)
      .join(wc, Seq("word"))
      .select(explode(col("tokens")).as("token"), col("cnt"))
      .groupBy("token").agg(sum("cnt").as("n_occur"))
    // reserved-id layout: [sep?][256 bytes?][vocab…] — vocab ids start
    // at the total shift (plain: rank−1; sep only: rank; +bytes: +256)
    val shift = (if (sepToken) 1L else 0L) + (if (byteFallback) 256L else 0L)
    graft.ops.Scale.globalRowNumber(counts,
        Seq(col("n_occur").desc, col("token").asc), "__rn")
      .select(col("token"), col("n_occur"),
        (col("__rn") - 1L + shift).as("token_id"))
      .write.mode("overwrite").parquet(s"$path/vocab")
    import spark.implicits._
    Seq((if (sepToken) Some(0L) else None, nMerges.toLong, shift,
        if (byteFallback) Some(if (sepToken) 1L else 0L) else None))
      .toDF("sep_id", "n_merges", "vocab_shift", "byte_base")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Persisted-tokenizer artifact readers with EXPLICIT schemas —
    * schema inference over merges/vocab/meta is a one-job footer read
    * per open, and every persisted-tokenizer query opens 2-4 of them.
    * The meta schema lists byte_base even for pre-byte-tier artifacts:
    * a missing parquet column reads back NULL, which is exactly the
    * "no byte tier" answer [[tokenizerByteBase]] gives for them. */
  private def readMergesArtifact(spark: org.apache.spark.sql.SparkSession,
                                 path: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.read.schema(StructType(Seq(
        StructField("rank", LongType), StructField("left", StringType),
        StructField("right", StringType), StructField("freq", LongType))))
      .parquet(s"$path/merges")
  }

  private def readVocabArtifact(spark: org.apache.spark.sql.SparkSession,
                                path: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.read.schema(StructType(Seq(
        StructField("token", StringType),
        StructField("n_occur", LongType),
        StructField("token_id", LongType))))
      .parquet(s"$path/vocab")
  }

  private def readMetaArtifact(spark: org.apache.spark.sql.SparkSession,
                               path: String): org.apache.spark.sql.Row = {
    import org.apache.spark.sql.types._
    spark.read.schema(StructType(Seq(
        StructField("sep_id", LongType), StructField("n_merges", LongType),
        StructField("vocab_shift", LongType),
        StructField("byte_base", LongType))))
      .parquet(s"$path/meta").head()
  }

  /** Read a persisted tokenizer's `<path>/meta` row: (sep_id — NULL for
    * a plain tokenizer, n_merges, vocab_shift). One driver-side row, the
    * [[graft.ml.Sq]] index-metadata pattern. Reads by NAME, so it
    * accepts both pre- and post-byte-fallback artifacts; the byte tier
    * is read separately by [[tokenizerByteBase]]. */
  def tokenizerMeta(spark: org.apache.spark.sql.SparkSession,
                    path: String): (Option[Long], Long, Long) = {
    val r = readMetaArtifact(spark, path)
    (if (r.isNullAt(0)) None else Some(r.getLong(0)),
      r.getAs[Long]("n_merges"), r.getAs[Long]("vocab_shift"))
  }

  /** The byte-fallback base id of a persisted tokenizer, when it was
    * built with `byteFallback=true` — None for plain artifacts AND for
    * artifacts written before the byte tier existed (their meta has no
    * byte_base column), so old artifacts keep working unchanged. */
  def tokenizerByteBase(spark: org.apache.spark.sql.SparkSession,
                        path: String): Option[Long] = {
    // pre-byte-tier artifacts have no byte_base column; under the
    // explicit schema it reads back NULL — the same None answer the old
    // columns-contains check gave, one schema-inference job cheaper
    val r = readMetaArtifact(spark, path)
    val i = r.fieldIndex("byte_base")
    if (r.isNullAt(i)) None else Some(r.getLong(i))
  }

  /** Encode documents to id sequences against a persisted
    * [[buildTokenizer]] artifact — bit-identical to the inline
    * [[encodeDocs]] → [[idsFromTokens]] pipeline over the same corpus
    * (q_tokenizer_persisted shares q_token_ids' oracle VERBATIM). Words
    * unseen at train time still encode (the merge fold falls back to
    * characters); only a character absent from the training corpus
    * yields a NULL id ([[idsFromTokens]]' visible-sentinel contract) —
    * UNLESS the artifact was built with `byteFallback=true`, in which
    * case the serving path dispatches on the recorded byte_base and
    * such tokens become UTF-8 byte ids instead
    * ([[idsFromTokensBytes]] — no NULL holes, ever).
    */
  def encodeDocsFromTokenizer(spark: org.apache.spark.sql.SparkSession,
                              path: String, docs: DataFrame, idCol: String,
                              textCol: String,
                              asciiOnly: Boolean = true): DataFrame = {
    val merges = readMergesArtifact(spark, path)
    val vocab = readVocabArtifact(spark, path)
    val enc = encodeDocs(docs, idCol, textCol, merges, asciiOnly)
    tokenizerByteBase(spark, path) match {
      case Some(bb) => idsFromTokensBytes(enc, idCol, vocab, bb)
      case None => idsFromTokens(enc, idCol, vocab)
    }
  }

  /** Decode id sequences against a persisted [[buildTokenizer]]
    * artifact — the serving inverse of [[encodeDocsFromTokenizer]],
    * dispatching on the artifact's byte tier exactly like the encode
    * side ([[decodeIdsBytes]] when byte_base is recorded,
    * [[decodeIds]] otherwise), so a dataloader debugger needs one call
    * regardless of how the tokenizer was built.
    */
  def decodeIdsFromTokenizer(spark: org.apache.spark.sql.SparkSession,
                             path: String, ids: DataFrame,
                             idCol: String): DataFrame = {
    val vocab = readVocabArtifact(spark, path)
    tokenizerByteBase(spark, path) match {
      case Some(bb) => decodeIdsBytes(ids, idCol, vocab, bb)
      case None => decodeIds(ids, idCol, vocab)
    }
  }

  /** Per-merge replay encode — the differential oracle for [[encodeWords]]
    * (one projection per merge; do not use at serving merge-table sizes).
    */
  private[graft] def encodeWordsReplay(words: DataFrame, wordCol: String,
                                       merges: DataFrame): DataFrame = {
    val ms = merges.orderBy("rank").collect()
      .map(r => (r.getString(r.fieldIndex("left")),
        r.getString(r.fieldIndex("right"))))
    var out = words.select(col(wordCol).as("word")).distinct()
      .select(col("word"),
        charTokens(col("word")).as("ts"))
    for (((l, r), k) <- ms.zipWithIndex) {
      out = out
        .withColumn("__l", lit(l)).withColumn("__r", lit(r))
        .select(col("word"), expr(applyMergeExpr).as("ts"))
      // bound the plan like train() does, but only every few merges —
      // literals don't double-reference anything
      if ((k + 1) % 8 == 0) out = out.localCheckpoint()
    }
    out.select(col("word"), col("ts").as("tokens"))
  }
}
