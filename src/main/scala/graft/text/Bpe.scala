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

  /** The one-pass encode kernel: fold the whole rank-ordered merge array
    * over a word's char tokens — outer `aggregate` walks the merges in rank
    * order, inner `aggregate` is the same greedy leftmost non-overlapping
    * replacement as [[applyMergeExpr]] with the pair read from the outer
    * lambda's merge struct. Pure Catalyst, so ALL nMerges applications are
    * one projection — the per-word cost is the same token-array walk the
    * replay did, without nMerges chained Spark jobs.
    */
  private val encodeAllExpr: String =
    """aggregate(__ms,
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
