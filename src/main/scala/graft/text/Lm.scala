package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word n-gram language-model scoring — the CCNet-style quality filter
  * (Wenzek et al., "CCNet: Extracting high quality monolingual datasets
  * from web crawl data", LREC 2020: score candidate documents with a
  * language model trained on a high-quality reference corpus and keep the
  * low-perplexity head). Reference scope: siuba has nothing like this; it
  * belongs to the training-data extension layer next to [[TextFns]]'
  * heuristic quality score — the heuristics are free, the LM score is the
  * statistically-grounded second pass.
  *
  * Relation to [[TextFns.lmScore]] (the round-8 inline bigram scorer):
  * that verb recomputes corpus counts inside every call and emits a
  * rounded mean — right for one-shot triage. This module is the
  * PRODUCTION form of the same idea: the model is a standing, persistable
  * (ctx, w, cnt) relation trained ONCE (on a reference corpus that need
  * not be the scored corpus), n is a parameter, α and |V| are explicit,
  * scoring replays against the frozen relation (batch and streaming), and
  * the per-doc sum is position-ordered so scores are bitwise
  * partition-invariant.
  *
  * The model here is a plain add-α smoothed word n-gram LM, NOT KenLM's
  * Kneser–Ney: exact integer counts + one closed-form conditional per
  * gram keep every number an exact function of the corpus, so the whole
  * train→score pipeline replays in an external engine (q_lm_score_ngram's
  * DuckDB oracle) — the repo-wide determinism contract. At 100 TB the
  * shapes are what matter and they carry over to any smoothing: the model
  * is a (ctx, w, cnt) RELATION (one explode + one count aggregate —
  * map-side combined, shuffles counter rows, persists as parquet), and
  * scoring is two hash equi-joins of the doc gram stream against that
  * relation — no broadcast assumption on the model (a web-scale 5-gram
  * table is itself distributed), no all-pairs anything, per-doc state
  * bounded by document length.
  *
  * Determinism: counts are exact; the smoothed conditional is one
  * division; `ln` agrees bitwise between the JVM and DuckDB on these
  * inputs (the q_bm25 family already leans on that); and the per-document
  * sum folds the gram log-probs in POSITION order (sort + left fold on
  * both engines), so float addition order can never perturb a score.
  */
object Lm {

  /** Ordered lowercase word array — the ORDERED sibling of
    * [[Bpe.wordCounts]]'s tokenization (same lower/whitespace/`^[a-z]+$`
    * normalization), kept in document order because scoring is positional.
    */
  private def tokens(textCol: Column, asciiOnly: Boolean): Column = {
    val ws = filter(split(trim(lower(textCol)), "\\s+"), w => w =!= "")
    if (asciiOnly) filter(ws, w => w.rlike("^[a-z]+$")) else ws
  }

  /** The (pos, ctx, w) gram array of a token array: ctx is the n−1
    * preceding words joined with ' ' ("" for unigrams), w the word at the
    * gram's end. Shared by training and scoring so the two sides can
    * never tokenize differently.
    */
  private def gramExpr(n: Int): String =
    s"""IF(size(__ts) >= $n,
       |  transform(sequence(0, size(__ts) - $n), i -> named_struct(
       |    'ctx', array_join(slice(__ts, i + 1, ${n - 1}), ' '),
       |    'w', __ts[i + ${n - 1}])),
       |  CAST(array() AS array<struct<ctx: string, w: string>>))""".stripMargin

  /** Train the model: one row per distinct n-gram — (ctx, w, cnt), exact
    * counts over the corpus. One explode + one map-side-combined count
    * aggregate; persist the result as parquet next to the corpus it
    * summarizes and feed it to [[scoreDocs]] forever (the standing-
    * artifact shape of [[graft.ops.Checks.joinProfile]] and the BM25
    * stats tables). Context counts derive with [[ctxCounts]].
    */
  def ngramCounts(df: DataFrame, textCol: String, n: Int,
                  asciiOnly: Boolean = true): DataFrame = {
    require(n >= 1, "n must be >= 1")
    df.select(tokens(col(textCol), asciiOnly).as("__ts"))
      .select(explode(expr(gramExpr(n))).as("g"))
      .groupBy(col("g.ctx").as("ctx"), col("g.w").as("w"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Context totals of a gram table: (ctx, ctx_cnt). */
  def ctxCounts(grams: DataFrame): DataFrame =
    grams.groupBy("ctx").agg(sum("cnt").as("ctx_cnt"))

  /** Distinct-word vocabulary size of a corpus under the same
    * tokenization — the smoothing denominator's |V|.
    */
  def vocabSize(df: DataFrame, textCol: String,
                asciiOnly: Boolean = true): Long =
    df.select(explode(tokens(col(textCol), asciiOnly)).as("w"))
      .agg(count_distinct(col("w"))).head().getLong(0)

  /** Score documents against a trained gram table: per doc, the add-α
    * smoothed log-probability of its grams,
    *   lp(ctx, w) = ln((cnt + α) / (ctx_cnt + α·|V|)),
    * with cnt/ctx_cnt = 0 for unseen grams/contexts (an unseen context
    * scores −ln|V| exactly). Output: (idCol, n_grams, sum_lp, avg_lp) —
    * avg_lp is the per-gram mean log-prob (−avg_lp is log-perplexity;
    * filter low-quality docs on it). Documents with fewer than n tokens
    * get n_grams = 0, sum_lp = 0.0, avg_lp NULL.
    *
    * Shapes: the doc gram stream equi-joins the gram and context tables
    * on their keys (both hash joins — the model is NOT assumed
    * broadcastable), then one per-doc aggregate collects (pos, lp) pairs
    * — bounded by document length — and folds them in position order, so
    * the sum is a pure function of the document. ONE pass over `docs`:
    * zero-gram documents survive through `posexplode_outer`'s null row
    * (no second scan + distinct just to recover them). `idCol` identifies
    * the document — rows sharing an id aggregate together.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                grams: DataFrame, n: Int, vocab: Long, alpha: Double = 1.0,
                asciiOnly: Boolean = true): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(vocab > 0, "vocab must be positive")
    require(alpha > 0, "alpha must be positive")
    val ctx = ctxCounts(grams)
    val ex = docs
      .select(col(idCol), tokens(col(textCol), asciiOnly).as("__ts"))
      .select(col(idCol),
        posexplode_outer(expr(gramExpr(n))).as(Seq("pos", "g")))
      .select(col(idCol), col("pos"), col("g.ctx").as("ctx"),
        col("g.w").as("w"))
    val lp = ex
      .join(grams, Seq("ctx", "w"), "left")
      .join(ctx, Seq("ctx"), "left")
      .withColumn("lp", when(col("w").isNotNull, log(
        (coalesce(col("cnt"), lit(0L)) + lit(alpha)) /
          (coalesce(col("ctx_cnt"), lit(0L)) + lit(alpha) * vocab))))
    lp.groupBy(idCol)
      .agg(count(col("w")).as("n_grams"),
        // nulls (the outer row of a gram-less doc) drop out of the list
        collect_list(when(col("w").isNotNull,
          struct(col("pos"), col("lp")))).as("__ps"))
      .select(col(idCol), col("n_grams"),
        expr("aggregate(transform(array_sort(__ps), s -> s.lp), 0.0D," +
          " (a, x) -> a + x)").as("sum_lp"))
      // 0-gram docs score NULL avg (guarded: ANSI division by zero throws)
      .withColumn("avg_lp",
        when(col("n_grams") > 0, col("sum_lp") / col("n_grams")))
  }
}
