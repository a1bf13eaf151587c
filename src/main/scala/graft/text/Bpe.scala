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

  /** Normalized word-frequency table for [[train]]: lowercase, whitespace
    * tokenization, optionally restricted to `^[a-z]+$` words (`asciiOnly` —
    * recommended when an engine-replay oracle is in play: per-character
    * slicing of multi-byte text is where engines disagree).
    */
  def wordCounts(df: DataFrame, textCol: String,
                 asciiOnly: Boolean = true): DataFrame = {
    val words = df
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .where(col("word") =!= "")
    (if (asciiOnly) words.where(col("word").rlike("^[a-z]+$")) else words)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
  }

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
    * merge. Stops early if no adjacent pair remains.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            asciiOnly: Boolean = true): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    var words = wordCounts(df, textCol, asciiOnly)
      .select(col("cnt"),
        charTokens(col("word")).as("ts"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var done = false
    for (rank <- 1 to nMerges if !done) {
      val pair = words
        .select(col("cnt"), explode(when(size(col("ts")) >= 2,
            expr("transform(sequence(0, size(ts) - 2), " +
              "i -> struct(ts[i] AS l, ts[i + 1] AS r))"))
          .otherwise(expr(
            "CAST(array() AS array<struct<l: string, r: string>>)"))).as("p"))
        .groupBy(col("p.l").as("__l"), col("p.r").as("__r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("__l"), col("__r"))
        .limit(1)
        .localCheckpoint()
      if (pair.isEmpty) done = true
      else {
        merges += pair.select(lit(rank.toLong).as("rank"),
          col("__l").as("left"), col("__r").as("right"), col("freq"))
        words = words.crossJoin(broadcast(pair.select("__l", "__r")))
          .select(col("cnt"), expr(applyMergeExpr).as("ts"))
          .localCheckpoint()
      }
    }
    if (merges.isEmpty)
      df.sparkSession.emptyDataFrame
        .select(lit(0L).as("rank"), lit("").as("left"), lit("").as("right"),
          lit(0L).as("freq")).limit(0)
    else merges.reduce(_ unionByName _)
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
    *      distinct pairs — no corpus scan, no explode);
    *   2. splits the word table map-side into affected (contains the
    *      winning adjacent pair) and untouched;
    *   3. re-derives pair stats for the AFFECTED words only, folding
    *      (new − old) into the standing stats.
    * The shuffled delta relation is proportional to the affected words'
    * pair count — on a realistic corpus a fast-shrinking fraction of |V|
    * (BpeSpec pins the proportionality at 512 merges via `onRound` row
    * counts) — while results are bit-identical to [[train]]: the deltas
    * are exact integers, the standing table after round k equals a full
    * recount (only freq > 0 pairs exist in both), and the argmax
    * tie-breaks are shared. Round checkpoints are released once
    * superseded, so memory stays ~2·(|V| + |pairs|) at any merge count.
    *
    * `onRound(rank, nAffected, nWords)` is optional instrumentation
    * (specs/audits); it costs two extra counts per round when set.
    */
  def trainIncremental(df: DataFrame, textCol: String, nMerges: Int,
                       asciiOnly: Boolean = true,
                       onRound: (Int, Long, Long) => Unit = null): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val sc = df.sparkSession.sparkContext
    // `live` tracks the CURRENT round's words/stats checkpoint ids —
    // released as soon as the next round supersedes them (and at the end);
    // the 1-row winner checkpoints stay out of it: the returned merge
    // table references them
    def capturing(body: => Unit): Set[Int] = {
      val pre = sc.getPersistentRDDs.keySet.toSet
      body
      sc.getPersistentRDDs.keySet.toSet -- pre
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    var words: DataFrame = null
    var stats: DataFrame = null
    var live = capturing {
      words = wordCounts(df, textCol, asciiOnly)
        .select(col("cnt"), charTokens(col("word")).as("ts"))
        .localCheckpoint()
      stats = pairStats(words).localCheckpoint()
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var done = false
    for (rank <- 1 to nMerges if !done) {
      val pair = stats
        .orderBy(col("freq").desc, col("__l"), col("__r"))
        .limit(1)
        .localCheckpoint()
      if (pair.isEmpty) done = true
      else {
        merges += pair.select(lit(rank.toLong).as("rank"),
          col("__l").as("left"), col("__r").as("right"), col("freq"))
        // the winner rides a broadcast into a map-side contains test; only
        // hit words pay the re-pair + merge work
        val flagged = words.crossJoin(broadcast(pair.select("__l", "__r")))
          .withColumn("__hit", size(col("ts")) >= 2 &&
            expr("exists(sequence(0, size(ts) - 2), " +
              "i -> ts[i] = __l AND ts[i + 1] = __r)"))
        val affected = flagged.where(col("__hit")).select("cnt", "ts", "__l", "__r")
        val untouched = flagged.where(!col("__hit")).select("cnt", "ts")
        val merged = affected.select(col("cnt"), expr(applyMergeExpr).as("ts"))
        if (onRound != null)
          onRound(rank, affected.count(), words.count())
        val delta = pairStats(affected.select("cnt", "ts"))
          .withColumn("freq", -col("freq"))
          .unionByName(pairStats(merged))
        val prevStats = stats
        val next = capturing {
          words = untouched.unionByName(merged).localCheckpoint()
          stats = prevStats.unionByName(delta)
            .groupBy("__l", "__r").agg(sum("freq").as("freq"))
            .where(col("freq") > 0)
            .localCheckpoint()
        }
        release(live)
        live = next
      }
    }
    release(live)
    if (merges.isEmpty)
      df.sparkSession.emptyDataFrame
        .select(lit(0L).as("rank"), lit("").as("left"), lit("").as("right"),
          lit(0L).as("freq")).limit(0)
    else merges.reduce(_ unionByName _)
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
