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
  * Two smoothings are provided, both exact count arithmetic (NOT KenLM's
  * Kneser–Ney): add-α ([[Lm.ngramCounts]]/[[Lm.scoreDocs]] — one
  * closed-form conditional per gram) and Stupid Backoff
  * ([[Lm.backoffCounts]]/[[Lm.scoreDocsBackoff]] — Brants et al. 2007,
  * the web-scale choice; see that section). Exact integer counts keep
  * every number an exact function of the corpus, so the whole
  * train→score pipeline replays in an external engine (q_lm_score_ngram's
  * and q_lm_backoff's DuckDB oracles) — the repo-wide determinism
  * contract. At 100 TB the
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
  private[text] def tokens(textCol: Column, asciiOnly: Boolean): Column =
    org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.AsciiWords(
        org.apache.spark.sql.graftshim.Shim.exprOf(textCol), asciiOnly))

  /** Composed-built-ins form of [[tokens]] — the differential oracle for
    * [[graft.plans.AsciiWords]] (values must agree exactly). */
  private[graft] def tokensComposed(textCol: Column,
                                    asciiOnly: Boolean): Column = {
    val ws = filter(split(trim(lower(textCol)), "\\s+"), w => w =!= "")
    if (asciiOnly) filter(ws, w => w.rlike("^[a-z]+$")) else ws
  }

  private def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftshim.Shim.columnOf(e)
  private def exprOf(c: Column) =
    org.apache.spark.sql.graftshim.Shim.exprOf(c)

  /** The (pos, ctx, w) gram array of a token array: ctx is the n−1
    * preceding words joined with ' ' ("" for unigrams), w the word at the
    * gram's end. Shared by training and scoring so the two sides can
    * never tokenize differently.
    */
  private[graft] def gramExpr(n: Int): String =
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
      .select(explode(colOf(graft.plans.NGramPairs(exprOf(col("__ts")), n)))
        .as("g"))
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
    * the sum is a pure function of the document. That per-doc collect is
    * the one state concentration here: a book-length outlier (10⁶+
    * tokens) lands its whole (pos, lp) buffer on one executor. The
    * mitigation already exists UPSTREAM — run [[TextFns.chunkDocs]] first
    * and score chunks as documents (chunk scores sum to a per-doc score
    * by one more exact aggregate if needed); a two-level in-aggregate
    * fold is deliberately NOT offered because re-associating float
    * addition would break the bitwise replay contract this module is
    * built around. ONE pass over `docs`:
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
        posexplode_outer(colOf(graft.plans.NGramPairs(exprOf(col("__ts")),
          n))).as(Seq("pos", "g")))
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

  // ---------------------------------------------------------------------
  // Stupid Backoff (Brants et al., "Large language models in machine
  // translation", EMNLP 2007) — the web-scale smoothing: score with raw
  // count RATIOS, backing off to a shorter context with a fixed 0.4
  // multiplier when the full n-gram is unseen, terminating at the unigram
  // MLE. No discounting, no normalization pass — every number is a pure
  // function of corpus counts, so the whole train→score pipeline replays
  // in DuckDB (q_lm_backoff). Unlike add-α (which gives every unseen gram
  // the same −ln(ctx_cnt + α|V|)-ish mass and over-penalizes
  // rare-but-fluent text as n grows), backoff preserves the ordering
  // "seen n-gram ≻ unseen n-gram with plausible shorter context ≻
  // gibberish" — LmSpec pins a corpus where add-α INVERTS the first
  // relation and backoff does not.
  // ---------------------------------------------------------------------

  /** The SQL fragment producing every suffix-gram of orders 1..n of the
    * token array `__ts` as (ord, gram): for each order o and 0-based end
    * position i in [o−1, size−1], the o words ending at i joined with ' '.
    * Prefix containment makes this the one relation backoff needs: the
    * order-(o−1) context of any counted o-gram is itself counted (a prefix
    * occurrence rides along with every o-gram occurrence), so denominators
    * are always ≥ numerators and never zero when the numerator is seen.
    */
  private[graft] def allGramExpr(n: Int): String =
    s"""flatten(transform(sequence(1, $n), o ->
       |  IF(size(__ts) >= o,
       |    transform(sequence(o - 1, size(__ts) - 1), i -> named_struct(
       |      'ord', o, 'gram', array_join(slice(__ts, i - o + 2, o), ' '))),
       |    CAST(array() AS array<struct<ord: int, gram: string>>))))""".stripMargin

  /** Train the Stupid Backoff model: one relation holding EXACT counts of
    * every gram at every order 1..n — (ord, gram, cnt). One pass over the
    * corpus (a single explode emits all orders' grams) + one map-side-
    * combined count aggregate; persist next to the corpus (or via
    * [[buildBackoffModel]]) and score against it forever. The relation is
    * the model: n = max(ord), total token count = Σ cnt at ord 1
    * ([[tokenTotal]]).
    */
  def backoffCounts(df: DataFrame, textCol: String, n: Int,
                    asciiOnly: Boolean = true): DataFrame = {
    require(n >= 1, "n must be >= 1")
    df.select(tokens(col(textCol), asciiOnly).as("__ts"))
      .select(explode(colOf(graft.plans.AllOrderGrams(exprOf(col("__ts")),
        n))).as("g"))
      .groupBy(col("g.ord").as("ord"), col("g.gram").as("gram"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Corpus token total of a [[backoffCounts]] relation — the unigram MLE
    * denominator N (Σ cnt at ord 1; every token is exactly one unigram).
    */
  def tokenTotal(grams: DataFrame): Long =
    grams.filter(col("ord") === 1)
      .agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)

  /** Per-scored-position lookup keys against the gram relation: for each
    * full-window position (0-based gram index `pos`), the NUMERATOR gram
    * at every level o in 1..n (the o words ending at the position) and the
    * DENOMINATOR context at every level o in 2..n (the o−1 words ending
    * one earlier, counted at ord o−1). 2n−1 slim (pos, lvl, role, ord,
    * gram) rows per position — the model joins back in ONE hash equi-join.
    */
  private[graft] def lookupExpr(n: Int): String = {
    val num =
      s"""transform(sequence(1, $n), o -> named_struct(
         |  'pos', i - ${n - 1}, 'lvl', o, 'role', 'n',
         |  'ord', o, 'gram', array_join(slice(__ts, i - o + 2, o), ' ')))""".stripMargin
    val den =
      s"""transform(sequence(2, $n), o -> named_struct(
         |  'pos', i - ${n - 1}, 'lvl', o, 'role', 'd',
         |  'ord', o - 1, 'gram', array_join(slice(__ts, i - o + 2, o - 1), ' ')))""".stripMargin
    // n = 1 has no denominators (sequence(2, 1) would run DESCENDING —
    // Spark's default step is -1 when start > stop — so it must not appear)
    val perPos = if (n == 1) num else s"concat($num,\n$den)"
    s"""IF(size(__ts) >= $n,
       |  flatten(transform(sequence(${n - 1}, size(__ts) - 1), i ->
       |    $perPos)),
       |  CAST(array() AS array<struct<
       |    pos: int, lvl: int, role: string, ord: int, gram: string>>))""".stripMargin
  }

  /** Score documents with Stupid Backoff against a trained
    * [[backoffCounts]] relation:
    *   S(w | ctx_o) = cnt(o-gram) / cnt(context as (o−1)-gram)  if seen,
    *                  0.4 · S(w | ctx_{o−1})                    otherwise,
    * terminating at the unigram MLE cnt(w)/N; a word unseen even as a
    * unigram scores the deterministic floor 0.4^(n−1)/N (one virtual
    * count — keeps ln finite and the whole pipeline count-arithmetic).
    * Scoring positions are the full-window gram positions (documents with
    * fewer than n tokens get n_grams 0 — [[scoreDocs]]' convention), and
    * lp(pos) = ln(ratio) + (n−o)·ln(0.4) for the LARGEST seen order o.
    * Output: (idCol, n_grams, sum_lp, avg_lp), avg_lp NULL for 0-gram
    * docs. `idCol` must uniquely identify rows (positions pivot per id).
    *
    * Shapes at 100 TB: the doc stream explodes to 2n−1 slim lookup rows
    * per position, ONE hash equi-join against the (ord, gram) model (not
    * assumed broadcastable — a web-scale 5-gram table is itself
    * distributed), one (id, pos) pivot aggregate, then the position-
    * ordered per-doc fold of [[scoreDocs]] — partition-invariant to the
    * bit (and with the same long-document caveat: chunk book-length
    * outliers with [[TextFns.chunkDocs]] upstream rather than asking one
    * executor to buffer a 10⁶-entry (pos, lp) list). The backoff cascade itself is a per-row CASE, evaluated lazily
    * branch-by-branch (ANSI-safe: a division only runs on its matched
    * branch, where the denominator is provably positive).
    */
  def scoreDocsBackoff(docs: DataFrame, idCol: String, textCol: String,
                       grams: DataFrame, n: Int, totalTokens: Long,
                       backoff: Double = 0.4,
                       asciiOnly: Boolean = true): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(totalTokens > 0, "totalTokens must be positive")
    require(backoff > 0 && backoff <= 1, "backoff must be in (0, 1]")
    val ex = docs
      .select(col(idCol), tokens(col(textCol), asciiOnly).as("__ts"))
      .select(col(idCol), posexplode_outer(colOf(
        graft.plans.BackoffLookupGrams(exprOf(col("__ts")), n)))
        .as(Seq("__i", "g")))
      .select(col(idCol), col("g.pos").as("pos"), col("g.lvl").as("lvl"),
        col("g.role").as("role"), col("g.ord").as("ord"),
        col("g.gram").as("gram"))
    val joined = ex.join(grams.select("ord", "gram", "cnt"),
      Seq("ord", "gram"), "left")
    val aggs = pivotAggs(n, "cnt", "")
    val per = joined.groupBy(col(idCol), col("pos"))
      .agg(aggs.head, aggs.tail: _*)
    val lp = per.withColumn("lp",
      backoffCascade(n, totalTokens, backoff, ""))
    lp.groupBy(idCol)
      .agg(count(col("pos")).as("n_grams"),
        // the pos-null row of a <n-token doc drops out of the list
        collect_list(when(col("pos").isNotNull,
          struct(col("pos"), col("lp")))).as("__ps"))
      .select(col(idCol), col("n_grams"),
        expr("aggregate(transform(array_sort(__ps), s -> s.lp), 0.0D," +
          " (a, x) -> a + x)").as("sum_lp"))
      .withColumn("avg_lp",
        when(col("n_grams") > 0, col("sum_lp") / col("n_grams")))
  }

  // ---------------------------------------------------------------------
  // Interpolated Kneser–Ney (Kneser & Ney 1995; Chen & Goodman, "An
  // empirical study of smoothing techniques for language modeling", 1999)
  // with a FIXED absolute discount — the smoothing family KenLM (and hence
  // CCNet's actual filter) implements, in its deterministic form: no
  // count-of-count discount estimation, one explicit D in (0, 1), so every
  // probability is exact count arithmetic over the corpus and the whole
  // train→score pipeline replays in DuckDB (q_lm_kneser / q_lm_kneser3).
  // What KN adds over Stupid Backoff: lower-order distributions use
  // CONTINUATION counts (how many distinct contexts a word follows), not
  // raw counts — the classic "francisco" fix: a word that is frequent but
  // only ever follows one context gets a LOW unigram weight, so unseen
  // bigrams ending in it stop outranking genuinely promiscuous words.
  // LmSpec pins a corpus where backoff and KN order two docs OPPOSITELY.
  // ---------------------------------------------------------------------

  /** Train the interpolated-KN model: ONE relation (kind, k, gram, cnt)
    * holding every count the scorer needs, all derived from a single
    * corpus pass ([[backoffCounts]]' multi-order explode) plus aggregates
    * over the resulting TYPE relation (small — distinct grams, not corpus
    * rows):
    *   - `('r', o, g, c(g))`      raw counts, orders 1..n;
    *   - `('c', o, g, N1+(·g))`   continuation counts of each o-gram g,
    *     o in 1..n−1: the number of distinct (o+1)-gram TYPES whose o-word
    *     suffix is g (how many distinct words precede g);
    *   - `('m', j, x, N1+(·x·))`  mid denominators, j in 1..n−2: distinct
    *     (j+2)-gram types whose middle j words are x;
    *   - `('g', j, x, |{w: N1+(·xw)>0}|)` mid interpolation weights:
    *     distinct final words among those same types;
    *   - `('f', n−1, x, N1+(x·))` top interpolation weights: distinct
    *     n-gram types with prefix x.
    * Tokens cannot contain whitespace (the tokenizer splits on it), so the
    * space-joined gram strings split back unambiguously. Persist the
    * relation as parquet and score against it forever.
    */
  def kneserNeyCounts(df: DataFrame, textCol: String, n: Int,
                      asciiOnly: Boolean = true): DataFrame = {
    require(n >= 2, "interpolated KN needs n >= 2")
    val raw = backoffCounts(df, textCol, n, asciiOnly)
    val r = raw.select(lit("r").as("kind"), col("ord").as("k"),
      col("gram"), col("cnt"))
    // suffix = drop the first word; counting rows counts TYPES
    val c = raw.filter(col("ord") >= 2)
      .select((col("ord") - 1).as("k"),
        expr("substring(gram, instr(gram, ' ') + 1)").as("gram"))
      .groupBy("k", "gram").agg(count(lit(1)).as("cnt"))
      .select(lit("c").as("kind"), col("k"), col("gram"), col("cnt"))
    val f = raw.filter(col("ord") === n)
      .select(expr(s"substring_index(gram, ' ', ${n - 1})").as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .select(lit("f").as("kind"), lit(n - 1).as("k"), col("gram"),
        col("cnt"))
    val mids = if (n >= 3) {
      val mg = raw.filter(col("ord") >= 3)
        .select((col("ord") - 2).as("k"),
          // middle = drop first word, keep the next ord−2
          expr("substring_index(substring(gram, instr(gram, ' ') + 1)," +
            " ' ', ord - 2)").as("gram"),
          expr("substring_index(gram, ' ', -1)").as("__last"))
      val m = mg.groupBy("k", "gram").agg(count(lit(1)).as("cnt"))
        .select(lit("m").as("kind"), col("k"), col("gram"), col("cnt"))
      val g = mg.groupBy("k", "gram")
        .agg(count_distinct(col("__last")).as("cnt"))
        .select(lit("g").as("kind"), col("k"), col("gram"), col("cnt"))
      Seq(m, g)
    } else Seq.empty
    (Seq(r, c, f) ++ mids).reduce(_.unionByName(_))
  }

  /** The three scalars of a [[kneserNeyCounts]] model, read once on the
    * driver (the [[tokenTotal]] pattern): vocabulary size V (distinct
    * unigram types), bigram type count N1+(··) (the continuation-unigram
    * denominator), and U1 = |{w: N1+(·w) > 0}| (distinct words with at
    * least one predecessor — the unigram interpolation weight's count).
    */
  def knStats(model: DataFrame): (Long, Long, Long) = {
    val r = model.agg(
      coalesce(sum(when(col("kind") === "r" && col("k") === 1, 1L)),
        lit(0L)).as("v"),
      coalesce(sum(when(col("kind") === "r" && col("k") === 2, 1L)),
        lit(0L)).as("bt"),
      coalesce(sum(when(col("kind") === "c" && col("k") === 1, 1L)),
        lit(0L)).as("u1")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** The Ney absolute-discount estimate D = n₁ / (n₁ + 2·n₂) from the
    * TOP-order count-of-counts of a [[kneserNeyCounts]] model (Ney, Essen
    * & Kneser 1994; Chen & Goodman 1999 §3) — the leave-one-out discount
    * KenLM estimates per order, here computed once at the order where the
    * raw counts live and applied at every level ([[scoreDocsKN]] takes
    * one D). n₁/n₂ are the numbers of n-gram TYPES seen exactly once /
    * twice; both are driver-read from the tiny model relation. Exact
    * integer counts + one division, so the estimate replays bitwise in
    * the oracle. Throws when no singleton n-grams exist (nothing to
    * estimate from); returns 1.0 when no doubleton exists — a boundary
    * [[scoreDocsKN]] rejects, so callers on degenerate corpora should
    * fall back to a fixed D.
    */
  def neyDiscount(model: DataFrame, n: Int): Double = {
    val r = model.filter(col("kind") === "r" && col("k") === n)
      .agg(coalesce(sum(when(col("cnt") === 1, 1L)), lit(0L)).as("n1"),
        coalesce(sum(when(col("cnt") === 2, 1L)), lit(0L)).as("n2"))
      .head()
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    require(n1 > 0, "no singleton n-grams: cannot estimate a discount")
    n1.toDouble / (n1 + 2 * n2)
  }

  /** Score documents with interpolated Kneser–Ney against a trained
    * [[kneserNeyCounts]] relation. Per full-window position, bottom-up:
    *   P₁(w)      = max(N1+(·w) − D, 0)/BT + D·U1/BT · 1/V
    *   Pₒ(w|x)    = max(N1+(·xw) − D, 0)/N1+(·x·)
    *                  + D·|{w: N1+(·xw)>0}|/N1+(·x·) · Pₒ₋₁   (1 < o < n,
    *                  when N1+(·x·) > 0; else Pₒ₋₁)
    *   Pₙ(w|x)    = max(c(xw) − D, 0)/c(x) + D·N1+(x·)/c(x) · Pₙ₋₁
    *                  (when c(x) > 0 AND N1+(x·) > 0; else Pₙ₋₁ — a
    *                  context seen only document-finally has no follower
    *                  types, so its discount mass is undefined and the
    *                  scorer backs off entirely, keeping every score
    *                  finite)
    * and lp = ln Pₙ. P₁ > 0 even for OOV words (the D·U1/BT/V floor), so
    * ln never sees 0. Output/convention identical to [[scoreDocsBackoff]]:
    * (idCol, n_grams, sum_lp, avg_lp), position-ordered fold, < n-token
    * docs get n_grams 0. V/BT/U1 come from [[knStats]] (driver-read
    * scalars, like [[tokenTotal]]).
    *
    * Shapes at 100 TB: like [[scoreDocsBackoff]] — 2n−1 PIVOTED lookup
    * rows per position ([[knLookupExprPivot]]/[[pivotKnModel]]: the
    * context's raw and follower counts ride one row), ONE hash
    * equi-join against the model (never
    * assumed broadcastable), one (id, pos) pivot aggregate, the
    * position-ordered fold (chunk book-length outliers upstream with
    * [[TextFns.chunkDocs]]). Every float op's association order is fixed
    * and mirrored by the DuckDB oracle, so scores replay bitwise up to the
    * 6dp-rounded ln.
    */
  def scoreDocsKN(docs: DataFrame, idCol: String, textCol: String,
                  model: DataFrame, n: Int, vocab: Long, bigramTypes: Long,
                  u1: Long, discount: Double = 0.75,
                  asciiOnly: Boolean = true): DataFrame = {
    require(n >= 2, "interpolated KN needs n >= 2")
    require(vocab > 0, "vocab must be positive")
    require(bigramTypes > 0, "the training corpus must contain a bigram")
    require(u1 > 0, "the training corpus must contain a bigram")
    require(discount > 0 && discount < 1, "discount must be in (0, 1)")
    val ex = docs
      .select(col(idCol), tokens(col(textCol), asciiOnly).as("__ts"))
      .select(col(idCol),
        posexplode_outer(colOf(graft.plans.KnLookupGrams(
          exprOf(col("__ts")), n))).as(Seq("__i", "g")))
      .select(col(idCol), col("g.pos").as("pos"), col("g.role").as("role"),
        col("g.k").as("k"), col("g.gram").as("gram"))
    val joined = ex.join(pivotKnModel(model), Seq("k", "gram"), "left")
    // pivoted probes: 'F' carries the context's raw count AND follower
    // count, 'G_o' the mid context's total and follower-type count —
    // same values the per-kind shape read, one row instead of 2–3
    val aggs = Seq(
      max(when(col("role") === "a", col("r_cnt"))).as("__a"),
      max(when(col("role") === "F", col("r_cnt"))).as("__b"),
      max(when(col("role") === "F", col("f_cnt"))).as("__c")) ++
      (2 until n).flatMap(o => Seq(
        max(when(col("role") === s"n$o", col("c_cnt"))).as(s"__n$o"),
        max(when(col("role") === s"G$o", col("m_cnt"))).as(s"__m$o"),
        max(when(col("role") === s"G$o", col("g_cnt"))).as(s"__g$o"))) ++
      Seq(max(when(col("role") === "u", col("c_cnt"))).as("__u"))
    val per = joined.groupBy(col(idCol), col("pos"))
      .agg(aggs.head, aggs.tail: _*)
    val d = lit(discount)
    def num(c: Column): Column =
      greatest(coalesce(c, lit(0L)) - d, lit(0.0))
    // association mirrors the oracle SQL exactly:
    //   num/den + D*wt/den*lower  ==  ((num/den) + (((D*wt)/den)*lower))
    val p1: Column = num(col("__u")) / lit(bigramTypes.toDouble) +
      d * lit(u1.toDouble) / lit(bigramTypes.toDouble) / lit(vocab.toDouble)
    def level(o: Int, lower: Column): Column = {
      val (nc, dc, wc) =
        if (o == n) (col("__a"), col("__b"), col("__c"))
        else (col(s"__n$o"), col(s"__m$o"), col(s"__g$o"))
      val interp = num(nc) / dc + d * wc / dc * lower
      if (o == n)
        when(coalesce(dc, lit(0L)) > 0 && coalesce(wc, lit(0L)) > 0, interp)
          .otherwise(lower)
      else
        when(coalesce(dc, lit(0L)) > 0, interp).otherwise(lower)
    }
    var p: Column = p1
    for (o <- 2 to n) p = level(o, p)
    val lp = per.withColumn("lp", log(p))
    lp.groupBy(idCol)
      .agg(count(col("pos")).as("n_grams"),
        collect_list(when(col("pos").isNotNull,
          struct(col("pos"), col("lp")))).as("__ps"))
      .select(col(idCol), col("n_grams"),
        expr("aggregate(transform(array_sort(__ps), s -> s.lp), 0.0D," +
          " (a, x) -> a + x)").as("sum_lp"))
      .withColumn("avg_lp",
        when(col("n_grams") > 0, col("sum_lp") / col("n_grams")))
  }

  /** Persist an interpolated-KN model as a standing artifact —
    * `<path>/model` (the [[kneserNeyCounts]] relation) and `<path>/meta`
    * (one row: n, vocab, bigram_types, u1) — [[buildBackoffModel]]'s
    * train-once / score-forever split for the KN scorer. The scalars are
    * computed from the WRITTEN relation so model and meta can never
    * disagree.
    */
  def buildKnModel(df: DataFrame, textCol: String, path: String, n: Int,
                   asciiOnly: Boolean = true): Unit = {
    kneserNeyCounts(df, textCol, n, asciiOnly)
      .write.mode("overwrite").parquet(s"$path/model")
    val spark = df.sparkSession
    val (v, bt, u1) = knStats(spark.read.parquet(s"$path/model"))
    spark.range(1)
      .select(lit(n).as("n"), lit(v).as("vocab"),
        lit(bt).as("bigram_types"), lit(u1).as("u1"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Score documents against a persisted [[buildKnModel]] artifact —
    * reads the scalars from `<path>/meta` (1-row driver read) and runs
    * [[scoreDocsKN]] against the frozen relation, bit-identical to the
    * in-memory pipeline (LmSpec pins it).
    */
  def scoreDocsKNFromModel(spark: org.apache.spark.sql.SparkSession,
                           path: String, docs: DataFrame, idCol: String,
                           textCol: String, discount: Double = 0.75,
                           asciiOnly: Boolean = true): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head()
    scoreDocsKN(docs, idCol, textCol, spark.read.parquet(s"$path/model"),
      meta.getAs[Int]("n"), meta.getAs[Long]("vocab"),
      meta.getAs[Long]("bigram_types"), meta.getAs[Long]("u1"),
      discount, asciiOnly)
  }

  /** MODIFIED Kneser–Ney model relation (Chen & Goodman 1999 §3): the
    * [[kneserNeyCounts]] base extended with per-context follower counts
    * split BY COUNT CLASS (1, 2, 3+), the statistics the three-discount
    * backoff weight γ(x) = (D₁·N₁(x·) + D₂·N₂(x·) + D₃·N₃₊(x·)) / den
    * needs. Added kinds, all derived from the base relation itself (no
    * second corpus pass):
    *   'f1'/'f2'/'f3' at k=n−1 — followers of a raw (n−1)-gram context
    *     whose raw n-gram count is 1 / 2 / ≥3 (class-split of 'f'),
    *   'g1'/'g2'/'g3' at k=o−1 (2 ≤ o < n) — followers of a mid context
    *     whose CONTINUATION count N1+(·xw) is 1 / 2 / ≥3 (class-split
    *     of 'g').
    * Same (kind, k, gram, cnt) schema, so the scorer stays one hash
    * equi-join; the class relations are GROUP-BYs of the base model —
    * micro work next to the corpus pass that built it.
    */
  def kneserNeyCountsCG(df: DataFrame, textCol: String, n: Int,
                        asciiOnly: Boolean = true): DataFrame = {
    require(n >= 2, "modified KN needs n >= 2")
    val base = kneserNeyCounts(df, textCol, n, asciiOnly)
    val cls = when(col("cnt") === 1, "1").when(col("cnt") === 2, "2")
      .otherwise("3")
    val fc = base.filter(col("kind") === "r" && col("k") === n)
      .select(expr(s"substring_index(gram, ' ', ${n - 1})").as("gram"),
        cls.as("__cls"))
      .groupBy("gram", "__cls").agg(count(lit(1)).as("cnt"))
      .select(concat(lit("f"), col("__cls")).as("kind"),
        lit(n - 1).as("k"), col("gram"), col("cnt"))
    val gcs = (2 until n).map { o =>
      base.filter(col("kind") === "c" && col("k") === o)
        .select(expr(s"substring_index(gram, ' ', ${o - 1})").as("gram"),
          cls.as("__cls"))
        .groupBy("gram", "__cls").agg(count(lit(1)).as("cnt"))
        .select(concat(lit("g"), col("__cls")).as("kind"),
          lit(o - 1).as("k"), col("gram"), col("cnt"))
    }
    (Seq(base, fc) ++ gcs).reduce(_.unionByName(_))
  }

  /** The unigram-level class counts of a KN model — U₁/U₂/U₃₊ = number
    * of word types whose continuation count N1+(·w) is exactly 1 /
    * exactly 2 / ≥ 3 (U₁+U₂+U₃₊ = [[knStats]]' u1) — the modified-KN
    * unigram backoff weight's statistics, driver-read like [[knStats]].
    */
  def knUnigramClassStats(model: DataFrame): (Long, Long, Long) = {
    val r = model.filter(col("kind") === "c" && col("k") === 1).agg(
      coalesce(sum(when(col("cnt") === 1, 1L)), lit(0L)),
      coalesce(sum(when(col("cnt") === 2, 1L)), lit(0L)),
      coalesce(sum(when(col("cnt") >= 3, 1L)), lit(0L))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** The Chen–Goodman per-order discount triples (D₁, D₂, D₃₊) for
    * levels 1..n of a KN model, from each level's count-of-counts
    * n₁..n₄ — n-gram TYPES with (adjusted) count exactly 1..4: raw
    * counts at the top order ('r'@n), continuation counts below
    * ('c'@o), matching what each level's numerator actually discounts.
    *
    *   Y  = n₁ / (n₁ + 2·n₂)
    *   D₁ = 1 − 2·Y·n₂/n₁,  D₂ = 2 − 3·Y·n₃/n₂,  D₃₊ = 3 − 4·Y·n₄/n₃
    *
    * (Chen & Goodman 1999 eq. 26; KenLM's default estimate.) All counts
    * are driver-read from ONE aggregate over the tiny model relation;
    * float arithmetic order is pinned (left-assoc, exactly as written)
    * so the oracle's scalar subqueries replay it bitwise. A level whose
    * estimate is unavailable or invalid — n₁, n₂ or n₃ zero (nothing to
    * estimate from, e.g. a closed small vocabulary where every word has
    * many predecessors), or an estimated Dᵢ outside [0, i] (KenLM's
    * validity rule; an out-of-range discount makes backoff mass, and
    * therefore probabilities, negative) — gets KenLM's
    * `--discount_fallback` defaults (D₁, D₂, D₃₊) = (0.5, 1.0, 1.5).
    * Both conditions replay exactly in the oracle: the counts are
    * integers and the candidate discounts are computed with identical
    * float ops before the range test. n₄ = 0 merely degrades D₃₊ to 3.
    */
  def cgDiscounts(model: DataFrame, n: Int): Map[Int, (Double, Double, Double)] = {
    val lev = when(col("kind") === "r" && col("k") === n, lit(n))
      .when(col("kind") === "c", col("k"))
    val rows = model.withColumn("__lev", lev).filter(col("__lev").isNotNull)
      .groupBy("__lev").agg(
        coalesce(sum(when(col("cnt") === 1, 1L)), lit(0L)).as("n1"),
        coalesce(sum(when(col("cnt") === 2, 1L)), lit(0L)).as("n2"),
        coalesce(sum(when(col("cnt") === 3, 1L)), lit(0L)).as("n3"),
        coalesce(sum(when(col("cnt") === 4, 1L)), lit(0L)).as("n4"))
      .collect()
    rows.map { r =>
      val k = r.get(0).toString.toInt
      val (n1, n2, n3, n4) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (n1 == 0 || n2 == 0 || n3 == 0) (k, (0.5, 1.0, 1.5))
      else {
        val y = n1.toDouble / (n1 + 2 * n2)
        val (d1, d2, d3) =
          (1 - 2 * y * n2 / n1, 2 - 3 * y * n3 / n2, 3 - 4 * y * n4 / n3)
        if (d1 < 0 || d1 > 1 || d2 < 0 || d2 > 2 || d3 < 0 || d3 > 3)
          (k, (0.5, 1.0, 1.5))
        else (k, (d1, d2, d3))
      }
    }.toMap
  }

  /** The PIVOTED probe lookup both Kneser–Ney scorers share: instead of
    * one probe row per (kind, k, gram) — which made every kind its own
    * join row (3(n−1)+1 for single-D, 3n+2 for the class-split CG
    * scorer) — the model's kinds are pivoted into one count struct per
    * DISTINCT (k, gram) at join time ([[pivotKnModel]]), so each
    * position emits one probe per distinct coordinate: the top gram
    * ('a'), its context ('F' — raw count + follower kinds in one row),
    * each mid level's gram ('n_o') and context ('G_o' — m + g kinds),
    * and the unigram ('u') — 2n−1 slim rows per position (5 at n=3,
    * down from 7 / 11), one hash equi-join on (k, gram).
    */
  private[graft] def knLookupExprPivot(n: Int): String = {
    def st(role: String, k: Int, gram: String): String =
      s"""named_struct('pos', i - ${n - 1}, 'role', '$role',
         |  'k', $k, 'gram', $gram)""".stripMargin
    def words(o: Int): String =
      s"array_join(slice(__ts, i - ${n - 1} + ${n - o} + 1, $o), ' ')"
    def ctxWords(o: Int): String =
      s"array_join(slice(__ts, i - ${n - 1} + ${n - o} + 1, ${o - 1}), ' ')"
    val top = Seq(
      st("a", n, words(n)),
      st("F", n - 1, ctxWords(n)))
    val mids = (2 until n).flatMap { o => Seq(
      st(s"n$o", o, words(o)),
      st(s"G$o", o - 1, ctxWords(o)))
    }
    val uni = Seq(st("u", 1, "__ts[i]"))
    val all = (top ++ mids ++ uni).mkString(",\n")
    s"""IF(size(__ts) >= $n,
       |  flatten(transform(sequence(${n - 1}, size(__ts) - 1), i -> array(
       |    $all))),
       |  CAST(array() AS array<struct<
       |    pos: int, role: string, k: int, gram: string>>))""".stripMargin
  }

  /** Pivot a [[kneserNeyCounts]]/[[kneserNeyCountsCG]] relation to ONE
    * row per (k, gram) carrying every kind's count as a separate column
    * — the join-side half of the 2n−1 probe shape: the scorer's lookup
    * joins once per distinct (k, gram) and reads whichever counts its
    * role needs (role 'F' reads r_cnt plus the plain follower count or
    * the f-class triple from the same row that used to cost 2–4 probe
    * rows). One micro group-by over the model relation — the same rows,
    * just wider and fewer; kinds a given scorer does not use simply
    * pivot to NULL columns it never reads.
    */
  private def pivotKnModel(model: DataFrame): DataFrame =
    model.groupBy("k", "gram").agg(
      max(when(col("kind") === "r", col("cnt"))).as("r_cnt"),
      max(when(col("kind") === "c", col("cnt"))).as("c_cnt"),
      max(when(col("kind") === "m", col("cnt"))).as("m_cnt"),
      max(when(col("kind") === "f", col("cnt"))).as("f_cnt"),
      max(when(col("kind") === "g", col("cnt"))).as("g_cnt"),
      max(when(col("kind") === "f1", col("cnt"))).as("f1c"),
      max(when(col("kind") === "f2", col("cnt"))).as("f2c"),
      max(when(col("kind") === "f3", col("cnt"))).as("f3c"),
      max(when(col("kind") === "g1", col("cnt"))).as("g1c"),
      max(when(col("kind") === "g2", col("cnt"))).as("g2c"),
      max(when(col("kind") === "g3", col("cnt"))).as("g3c"))

  /** Score documents with MODIFIED Kneser–Ney (Chen & Goodman 1999 §3)
    * against a [[kneserNeyCountsCG]] relation: [[scoreDocsKN]] with the
    * single discount replaced by per-level class triples — the numerator
    * subtracts D(c) chosen by ITS count class (c=1→D₁, c=2→D₂, c≥3→D₃₊)
    * and the backoff weight becomes the class-weighted mass
    * (D₁·N₁ + D₂·N₂ + D₃₊·N₃₊)/den:
    *   P₁(w)   = max(N1+(·w) − D(·), 0)/BT + (D₁·U₁+D₂·U₂+D₃·U₃₊)/BT · 1/V
    *   Pₒ(w|x) = max(N1+(·xw) − D(·), 0)/N1+(·x·)
    *               + (ΣDᵢ·gᵢ)/N1+(·x·) · Pₒ₋₁            (1 < o < n)
    *   Pₙ(w|x) = max(c(xw) − D(·), 0)/c(x) + (ΣDᵢ·fᵢ)/c(x) · Pₙ₋₁
    * with the same guards as [[scoreDocsKN]] (top level backs off
    * entirely when the context has no followers). `discounts` maps level
    * → (D₁, D₂, D₃₊) ([[cgDiscounts]]); `uClass` is
    * [[knUnigramClassStats]]. The unigram backoff mass is a DRIVER
    * scalar (class counts and discounts are all scalars), so it rides as
    * one literal. Output/convention identical to [[scoreDocsKN]]; same
    * 100 TB shapes (2n−1 pivoted lookup rows per position — see
    * [[knLookupExprPivot]]/[[pivotKnModel]] — one model equi-join,
    * position-ordered fold).
    */
  def scoreDocsKNCG(docs: DataFrame, idCol: String, textCol: String,
                    model: DataFrame, n: Int, vocab: Long,
                    bigramTypes: Long, uClass: (Long, Long, Long),
                    discounts: Map[Int, (Double, Double, Double)],
                    asciiOnly: Boolean = true): DataFrame = {
    require(n >= 2, "modified KN needs n >= 2")
    require(vocab > 0, "vocab must be positive")
    require(bigramTypes > 0, "the training corpus must contain a bigram")
    require((1 to n).forall(discounts.contains),
      s"need discounts for every level 1..$n")
    val ex = docs
      .select(col(idCol), tokens(col(textCol), asciiOnly).as("__ts"))
      .select(col(idCol),
        posexplode_outer(colOf(graft.plans.KnLookupGrams(
          exprOf(col("__ts")), n))).as(Seq("__i", "g")))
      .select(col(idCol), col("g.pos").as("pos"), col("g.role").as("role"),
        col("g.k").as("k"), col("g.gram").as("gram"))
    val joined = ex.join(pivotKnModel(model), Seq("k", "gram"), "left")
    // each pivoted probe row carries every kind's count at its (k, gram);
    // the role decides which fields feed which scoring column — same
    // values the 3n+2-row shape read, one row where it read four
    val aggs = Seq(
      max(when(col("role") === "a", col("r_cnt"))).as("__a"),
      max(when(col("role") === "F", col("r_cnt"))).as("__b"),
      max(when(col("role") === "F", col("f1c"))).as("__f1"),
      max(when(col("role") === "F", col("f2c"))).as("__f2"),
      max(when(col("role") === "F", col("f3c"))).as("__f3")) ++
      (2 until n).flatMap(o => Seq(
        max(when(col("role") === s"n$o", col("c_cnt"))).as(s"__n$o"),
        max(when(col("role") === s"G$o", col("m_cnt"))).as(s"__m$o"),
        max(when(col("role") === s"G$o", col("g1c"))).as(s"__g1$o"),
        max(when(col("role") === s"G$o", col("g2c"))).as(s"__g2$o"),
        max(when(col("role") === s"G$o", col("g3c"))).as(s"__g3$o"))) ++
      Seq(max(when(col("role") === "u", col("c_cnt"))).as("__u"))
    val per = joined.groupBy(col(idCol), col("pos"))
      .agg(aggs.head, aggs.tail: _*)
    // num = max(c − D(class of c), 0); c = 0 falls through to the ELSE
    // discount but greatest(,0) zeroes it — same CASE the oracle renders
    def num(c: Column, lev: Int): Column = {
      val (d1, d2, d3) = discounts(lev)
      val dsel = when(coalesce(c, lit(0L)) === 1, lit(d1))
        .when(coalesce(c, lit(0L)) === 2, lit(d2)).otherwise(lit(d3))
      greatest(coalesce(c, lit(0L)) - dsel, lit(0.0))
    }
    // class-weighted backoff mass: D1*k1 + D2*k2 + D3*k3 (left-assoc)
    def mass(lev: Int, k1: Column, k2: Column, k3: Column): Column = {
      val (d1, d2, d3) = discounts(lev)
      lit(d1) * coalesce(k1, lit(0L)) + lit(d2) * coalesce(k2, lit(0L)) +
        lit(d3) * coalesce(k3, lit(0L))
    }
    val (ud1, ud2, ud3) = discounts(1)
    val (u1c, u2c, u3c) = uClass
    // driver scalar: the unigram level's whole backoff numerator
    val gu = ud1 * u1c + ud2 * u2c + ud3 * u3c
    val p1: Column = num(col("__u"), 1) / lit(bigramTypes.toDouble) +
      lit(gu) / lit(bigramTypes.toDouble) / lit(vocab.toDouble)
    def level(o: Int, lower: Column): Column = {
      val (nc, dc, w1, w2, w3) =
        if (o == n) (col("__a"), col("__b"), col("__f1"), col("__f2"),
          col("__f3"))
        else (col(s"__n$o"), col(s"__m$o"), col(s"__g1$o"), col(s"__g2$o"),
          col(s"__g3$o"))
      val interp = num(nc, o) / dc + mass(o, w1, w2, w3) / dc * lower
      if (o == n)
        when(coalesce(dc, lit(0L)) > 0 &&
          coalesce(w1, lit(0L)) + coalesce(w2, lit(0L)) +
            coalesce(w3, lit(0L)) > 0, interp)
          .otherwise(lower)
      else
        when(coalesce(dc, lit(0L)) > 0, interp).otherwise(lower)
    }
    var p: Column = p1
    for (o <- 2 to n) p = level(o, p)
    val lp = per.withColumn("lp", log(p))
    lp.groupBy(idCol)
      .agg(count(col("pos")).as("n_grams"),
        collect_list(when(col("pos").isNotNull,
          struct(col("pos"), col("lp")))).as("__ps"))
      .select(col(idCol), col("n_grams"),
        expr("aggregate(transform(array_sort(__ps), s -> s.lp), 0.0D," +
          " (a, x) -> a + x)").as("sum_lp"))
      .withColumn("avg_lp",
        when(col("n_grams") > 0, col("sum_lp") / col("n_grams")))
  }

  /** Persist a MODIFIED-KN model as a standing artifact —
    * `<path>/model` (the [[kneserNeyCountsCG]] relation), `<path>/meta`
    * (one row: n, vocab, bigram_types, u1c, u2c, u3c) and
    * `<path>/discounts` (n rows: lev, d1, d2, d3 — the [[cgDiscounts]]
    * triples) — [[buildKnModel]]'s train-once / score-forever split for
    * the Chen–Goodman scorer. Scalars AND discounts are computed from
    * the WRITTEN relation so model and meta can never disagree.
    */
  def buildKnModelCG(df: DataFrame, textCol: String, path: String, n: Int,
                     asciiOnly: Boolean = true): Unit = {
    kneserNeyCountsCG(df, textCol, n, asciiOnly)
      .write.mode("overwrite").parquet(s"$path/model")
    val spark = df.sparkSession
    val frozen = spark.read.parquet(s"$path/model")
    val (v, bt, _) = knStats(frozen)
    val (u1c, u2c, u3c) = knUnigramClassStats(frozen)
    spark.range(1)
      .select(lit(n).as("n"), lit(v).as("vocab"),
        lit(bt).as("bigram_types"), lit(u1c).as("u1c"),
        lit(u2c).as("u2c"), lit(u3c).as("u3c"))
      .write.mode("overwrite").parquet(s"$path/meta")
    import spark.implicits._
    cgDiscounts(frozen, n).toSeq.sortBy(_._1)
      .map { case (lev, (d1, d2, d3)) => (lev, d1, d2, d3) }
      .toDF("lev", "d1", "d2", "d3")
      .write.mode("overwrite").parquet(s"$path/discounts")
  }

  /** Score documents against a persisted [[buildKnModelCG]] artifact —
    * meta and discounts are driver reads (1 + n rows), the model joins
    * as a relation; bit-identical to the in-memory
    * [[kneserNeyCountsCG]] → [[scoreDocsKNCG]] pipeline over the same
    * corpus (q_lm_kneser_cg_pers shares q_lm_kneser_cg's oracle
    * VERBATIM).
    */
  def scoreDocsKNCGFromModel(spark: org.apache.spark.sql.SparkSession,
                             path: String, docs: DataFrame, idCol: String,
                             textCol: String,
                             asciiOnly: Boolean = true): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val ds = spark.read.parquet(s"$path/discounts").collect()
      .map(r => r.getAs[Int]("lev") ->
        (r.getAs[Double]("d1"), r.getAs[Double]("d2"),
          r.getAs[Double]("d3"))).toMap
    scoreDocsKNCG(docs, idCol, textCol,
      spark.read.parquet(s"$path/model"), meta.getAs[Int]("n"),
      meta.getAs[Long]("vocab"), meta.getAs[Long]("bigram_types"),
      (meta.getAs[Long]("u1c"), meta.getAs[Long]("u2c"),
        meta.getAs[Long]("u3c")), ds, asciiOnly)
  }

  /** Persist a Stupid Backoff model as a standing artifact —
    * `<path>/grams` (the [[backoffCounts]] relation) and `<path>/meta`
    * (one row: n, total_tokens) — the train-once / score-forever split of
    * [[graft.ml.Pq.buildIvfPqIndex]] applied to the LM: the reference
    * corpus is scanned exactly once, and every future batch or stream
    * scores against the frozen parquet ([[scoreDocsFromModel]],
    * [[graft.streaming.StreamVerbs.streamingLmScoreBackoff]]). The meta
    * row makes the artifact self-describing; the token total is summed
    * from the WRITTEN grams so model and meta can never disagree.
    */
  def buildBackoffModel(df: DataFrame, textCol: String, path: String, n: Int,
                        asciiOnly: Boolean = true): Unit = {
    backoffCounts(df, textCol, n, asciiOnly)
      .write.mode("overwrite").parquet(s"$path/grams")
    val spark = df.sparkSession
    val total = tokenTotal(spark.read.parquet(s"$path/grams"))
    spark.range(1)
      .select(lit(n).as("n"), lit(total).as("total_tokens"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The per-position pivot aggregates of the backoff scorer: numerator
    * count at each level 1..n, denominator context count at 2..n, reading
    * `cntCol` and writing `__${pfx}n$o` / `__${pfx}d$o` — prefixed so TWO
    * models' pivots can share one aggregate ([[scoreDocsContrast]]).
    */
  private def pivotAggs(n: Int, cntCol: String, pfx: String): Seq[Column] =
    (1 to n).map(o => max(when(col("role") === "n" && col("lvl") === o,
      col(cntCol))).as(s"__${pfx}n$o")) ++
      (2 to n).map(o => max(when(col("role") === "d" && col("lvl") === o,
        col(cntCol))).as(s"__${pfx}d$o"))

  /** The Stupid Backoff CASE cascade over a [[pivotAggs]] row: largest
    * seen order wins, ln(ratio) + (n−o)·ln(backoff), OOV floor 1/N at the
    * bottom. Pure expression construction — shared by the single-model
    * scorer and the two-model contrast so the cascades can never drift.
    */
  private def backoffCascade(n: Int, totalTokens: Long, backoff: Double,
                             pfx: String): Column = {
    val lnB = log(lit(backoff))
    def term(o: Int): Column = {
      val ratio =
        if (o == 1) col(s"__${pfx}n1") / lit(totalTokens)
        else col(s"__${pfx}n$o") / col(s"__${pfx}d$o")
      if (o == n) log(ratio)
      else log(ratio) + lit((n - o).toDouble) * lnB
    }
    val oov = {
      val base = log(lit(1.0) / lit(totalTokens))
      if (n == 1) base else base + lit((n - 1).toDouble) * lnB
    }
    var cascade: Column =
      when(coalesce(col(s"__${pfx}n$n"), lit(0L)) > 0, term(n))
    for (o <- (n - 1) to 1 by -1)
      cascade = cascade.when(
        coalesce(col(s"__${pfx}n$o"), lit(0L)) > 0, term(o))
    cascade.otherwise(oov)
  }

  /** Moore–Lewis cross-entropy difference scoring (Moore & Lewis,
    * "Intelligent selection of language model training data", ACL 2010) —
    * the classic data-selection criterion: score every document under an
    * IN-DOMAIN model and a GENERAL model (both Stupid Backoff at the same
    * n, so tokenization and gram positions agree exactly) and rank by
    *
    *   ml_score = avg_lp_in − avg_lp_gen
    *
    * (higher = more in-domain-like relative to its general-corpus
    * fluency; Moore–Lewis select ml_score above a threshold). ONE pass
    * over the corpus: the lookup rows explode once, BOTH models join
    * against them (two hash equi-joins), one pivot carries both models'
    * counts, and both position-ordered folds run in one aggregate —
    * bit-identical to composing [[scoreDocsBackoff]] twice (LmSpec pins
    * it) at half the doc-side scan/explode/shuffle cost, which is the
    * dominant cost at corpus scale. Output: (idCol, n_grams, avg_in,
    * avg_gen), unrounded — callers round to the cross-engine 6dp
    * (q_moore_lewis) and derive ml_score/selection. Zero-gram docs carry
    * NULL avgs.
    */
  def scoreDocsContrast(docs: DataFrame, idCol: String, textCol: String,
                        inGrams: DataFrame, genGrams: DataFrame, n: Int,
                        totalIn: Long, totalGen: Long,
                        backoff: Double = 0.4,
                        asciiOnly: Boolean = true): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(totalIn > 0 && totalGen > 0, "token totals must be positive")
    require(backoff > 0 && backoff <= 1, "backoff must be in (0, 1]")
    val ex = docs
      .select(col(idCol), tokens(col(textCol), asciiOnly).as("__ts"))
      .select(col(idCol),
        posexplode_outer(colOf(graft.plans.BackoffLookupGrams(
          exprOf(col("__ts")), n))).as(Seq("__i", "g")))
      .select(col(idCol), col("g.pos").as("pos"), col("g.lvl").as("lvl"),
        col("g.role").as("role"), col("g.ord").as("ord"),
        col("g.gram").as("gram"))
    val joined = ex
      .join(inGrams.select(col("ord"), col("gram"), col("cnt").as("__ci")),
        Seq("ord", "gram"), "left")
      .join(genGrams.select(col("ord"), col("gram"), col("cnt").as("__cg")),
        Seq("ord", "gram"), "left")
    val aggs = pivotAggs(n, "__ci", "i_") ++ pivotAggs(n, "__cg", "g_")
    val per = joined.groupBy(col(idCol), col("pos"))
      .agg(aggs.head, aggs.tail: _*)
    val lp = per
      .withColumn("lp_i", backoffCascade(n, totalIn, backoff, "i_"))
      .withColumn("lp_g", backoffCascade(n, totalGen, backoff, "g_"))
    lp.groupBy(idCol)
      .agg(count(col("pos")).as("n_grams"),
        collect_list(when(col("pos").isNotNull,
          struct(col("pos"), col("lp_i"), col("lp_g")))).as("__ps"))
      .select(col(idCol), col("n_grams"),
        expr("aggregate(transform(array_sort(__ps), s -> s.lp_i), 0.0D," +
          " (a, x) -> a + x)").as("__si"),
        expr("aggregate(transform(array_sort(__ps), s -> s.lp_g), 0.0D," +
          " (a, x) -> a + x)").as("__sg"))
      .select(col(idCol), col("n_grams"),
        when(col("n_grams") > 0, col("__si") / col("n_grams")).as("avg_in"),
        when(col("n_grams") > 0, col("__sg") / col("n_grams")).as("avg_gen"))
  }

  /** Score documents against a persisted [[buildBackoffModel]] artifact:
    * reads n and the token total from `<path>/meta` (1-row driver read,
    * the [[graft.ml.Pq.adcTopKFromIndex]] self-describing-index pattern)
    * and runs [[scoreDocsBackoff]] against the frozen gram relation —
    * bit-identical to scoring with the in-memory model (LmSpec pins it).
    */
  def scoreDocsFromModel(spark: org.apache.spark.sql.SparkSession,
                         path: String, docs: DataFrame, idCol: String,
                         textCol: String, backoff: Double = 0.4,
                         asciiOnly: Boolean = true): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head()
    scoreDocsBackoff(docs, idCol, textCol,
      spark.read.parquet(s"$path/grams"),
      meta.getAs[Int]("n"), meta.getAs[Long]("total_tokens"),
      backoff, asciiOnly)
  }
}
