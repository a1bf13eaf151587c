package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale corpus pipelines. All pure
  * Catalyst expressions (no UDFs) — they stay inside whole-stage codegen and
  * push down through the parquet scan's column pruning.
  */
object TextFns {

  /** Whitespace tokenization after trim+lower. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Every char-class count quality scoring needs, one codegen'd pass —
    * struct(chars, tokens, nonws, punct, digits, upper). See
    * graft.plans.CharStats for the exact (regex-equivalent) semantics.
    */
  def charStats(text: Column): Column =
    org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.CharStats(org.apache.spark.sql.graftshim.Shim.exprOf(text)))

  def tokenCount(text: Column): Column = charStats(text).getField("tokens")

  /** Reference formulation — the differential oracle for CharStats.tokens. */
  private[graft] def tokenCountComposed(text: Column): Column = size(tokens(text))

  /** Approximate BPE pre-tokenizer token count: GPT-2-style split into
    * space-prefixed letter runs, digit runs, and punctuation runs. Uses the
    * RE2-safe subset (no contraction or lookahead rules) so the same
    * pattern runs in any regex engine; counts pieces, not merges — the
    * standard cheap proxy for LLM token budgeting over a corpus.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+")).cast("long")

  def charCount(text: Column): Column = length(text)

  /** Collapse whitespace + lowercase — canonical form for fingerprinting. */
  def normalize(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Deterministic document fingerprint (hex md5 of the normal form). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** 64-bit fingerprint for joins/bucketing (cheaper than hex strings). */
  def fingerprint64(text: Column): Column = xxhash64(normalize(text))

  // ---- quality scoring ----------------------------------------------------

  private def ratioFrom(st: Column, field: String): Column =
    when(st.getField("chars") > 0,
      st.getField(field).cast("double") / st.getField("chars"))
      .otherwise(lit(0.0))

  /** Fraction of characters that are punctuation `.,!?;:`. */
  def punctRatio(text: Column): Column = ratioFrom(charStats(text), "punct")

  /** Fraction of characters that are digits. */
  def digitRatio(text: Column): Column = ratioFrom(charStats(text), "digits")

  /** Fraction of characters that are uppercase letters. */
  def upperRatio(text: Column): Column = ratioFrom(charStats(text), "upper")

  /** Mean token length — low (<2) or high (>12) suggests junk. */
  def meanTokenLen(text: Column): Column = {
    val st = charStats(text)
    when(st.getField("tokens") > 0,
      st.getField("nonws").cast("double") / st.getField("tokens"))
      .otherwise(lit(0.0))
  }

  // regexp_replace formulations — the differential oracles for CharStats
  private[graft] def ratioOfComposed(text: Column, keepPattern: String): Column =
    when(length(text) > 0,
      length(regexp_replace(text, keepPattern, "")).cast("double") / length(text))
      .otherwise(lit(0.0))
  private[graft] def punctRatioComposed(text: Column): Column = ratioOfComposed(text, "[^.,!?;:]")
  private[graft] def digitRatioComposed(text: Column): Column = ratioOfComposed(text, "[^0-9]")
  private[graft] def upperRatioComposed(text: Column): Column = ratioOfComposed(text, "[^A-Z]")
  private[graft] def meanTokenLenComposed(text: Column): Column =
    when(tokenCountComposed(text) > 0,
      length(regexp_replace(trim(text), "\\s+", "")).cast("double") / tokenCountComposed(text))
      .otherwise(lit(0.0))

  /** Count of whole-token occurrences of `word` (case-insensitive); `word`
    * may be a multi-token phrase. Zero-width lookarounds keep adjacent
    * occurrences countable ("the the" counts 2 — a padded-substring trick
    * consumes the shared space and undercounts) and regexp_count is
    * codegen'd, no per-token lambda.
    */
  def wordCount(text: Column, word: String): Column = {
    val q = java.util.regex.Pattern.quote(word.toLowerCase)
    regexp_count(lower(text), lit(s"(?<!\\S)$q(?!\\S)")).cast("long")
  }

  /** Stopword density: fraction of tokens from the given stopword set.
    * One tokenization pass; the stopword set folds into the filter lambda.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val set = stopwords.map(_.toLowerCase)
    val hits = size(filter(toks, t => t.isInCollection(set)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: long enough, punctuated, not
    * digit/upper-heavy, sane token lengths. Thresholds follow common
    * web-corpus filtering heuristics (Gopher-style rules).
    */
  def qualityScore(text: Column): Column = {
    // one CharStats subtree shared by all five checks: subexpression
    // elimination evaluates it once per row — the whole score is a single
    // pass over the text (the regex formulation rescanned it five times)
    val st = charStats(text)
    val nTok = st.getField("tokens")
    val mtl = when(nTok > 0, st.getField("nonws").cast("double") / nTok)
      .otherwise(lit(0.0))
    val checks = Seq(
      (nTok >= 10) && (nTok <= 100000),
      mtl.between(2.0, 12.0),
      ratioFrom(st, "punct") <= lit(0.2),
      ratioFrom(st, "digits") <= lit(0.2),
      ratioFrom(st, "upper") <= lit(0.3)
    )
    checks.map(c => when(c, 1.0).otherwise(0.0)).reduce(_ + _) / checks.size
  }

  /** Regex formulation of the score — differential oracle for the
    * CharStats-based path.
    */
  private[graft] def qualityScoreComposed(text: Column): Column = {
    val nTok = tokenCountComposed(text)
    val checks = Seq(
      (nTok >= 10) && (nTok <= 100000),
      meanTokenLenComposed(text).between(2.0, 12.0),
      punctRatioComposed(text) <= lit(0.2),
      digitRatioComposed(text) <= lit(0.2),
      upperRatioComposed(text) <= lit(0.3)
    )
    checks.map(c => when(c, 1.0).otherwise(0.0)).reduce(_ + _) / checks.size
  }

  /** Gopher document-quality rules (Rae et al., "Scaling language models:
    * Methods, analysis & insights from training Gopher", 2021, §A1.1) —
    * the published rule set behind MassiveWeb, as one codegen'd struct per
    * row (a single map-only pass; no UDF, no shuffle):
    *   - `word_count`      whitespace tokens, must lie in
    *                       [minWords, maxWords];
    *   - `mean_word_len`   Σ length / count, must lie in
    *                       [minMeanLen, maxMeanLen];
    *   - `symbol_ratio`    ('#' occurrences + ellipsis occurrences) /
    *                       words, ≤ maxSymbolRatio;
    *   - `bullet_frac`     fraction of lines starting with a bullet
    *                       ('-', '*', '•' after left-trim), ≤
    *                       maxBulletFrac;
    *   - `ellipsis_frac`   fraction of lines ending with "..." or "…"
    *                       (after right-trim), ≤ maxEllipsisFrac;
    *   - `alpha_frac`      fraction of words containing ≥1 ASCII letter,
    *                       ≥ minAlphaFrac;
    *   - `stop_hits`       distinct members of the Gopher stop-word list
    *                       {the, be, to, of, and, that, have, with}
    *                       present, ≥ minStopHits;
    *   - `pass`            AND of all seven.
    * Every number is integer counting + one division, so the whole rule
    * set replays exactly in DuckDB (q_gopher_rules). Empty documents get
    * 0-count fields, NULL ratios where the denominator is 0, and fail.
    */
  def gopherStats(text: Column,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletFrac: Double = 0.9,
                  maxEllipsisFrac: Double = 0.3,
                  minAlphaFrac: Double = 0.8,
                  minStopHits: Int = 2): Column = {
    val words = filter(split(trim(text), "\\s+"), w => w =!= "")
    val wc = size(words)
    val totLen = aggregate(transform(words, w => length(w)), lit(0),
      (a, x) => a + x)
    val meanLen = when(wc > 0, totLen.cast("double") / wc)
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellip = regexp_count(text, lit("\\.\\.\\.|…")).cast("int")
    val symbolRatio = when(wc > 0, (hashes + ellip).cast("double") / wc)
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => l =!= "")
    val nl = size(lines)
    val bullets = size(filter(lines, l => l.rlike("^[-*•]")))
    val bulletFrac = when(nl > 0, bullets.cast("double") / nl)
    val ellipLines = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$")))
    val ellipsisFrac = when(nl > 0, ellipLines.cast("double") / nl)
    val alphaWords = size(filter(words, w => w.rlike("[a-zA-Z]")))
    val alphaFrac = when(wc > 0, alphaWords.cast("double") / wc)
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val lowerWords = array_distinct(transform(words, w => lower(w)))
    val stopHits = size(array_intersect(lowerWords,
      array(stops.map(lit): _*)))
    val pass = (wc >= minWords) && (wc <= maxWords) &&
      coalesce(meanLen.between(minMeanLen, maxMeanLen), lit(false)) &&
      coalesce(symbolRatio <= maxSymbolRatio, lit(false)) &&
      coalesce(bulletFrac <= maxBulletFrac, lit(true)) &&
      coalesce(ellipsisFrac <= maxEllipsisFrac, lit(true)) &&
      coalesce(alphaFrac >= minAlphaFrac, lit(false)) &&
      (stopHits >= minStopHits)
    struct(wc.cast("long").as("word_count"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      stopHits.cast("long").as("stop_hits"), pass.as("pass"))
  }

  /** C4 filtering rules (Raffel et al., "Exploring the limits of transfer
    * learning with a unified text-to-text transformer", 2020, §2.2) as a
    * codegen'd per-row struct. Line rule: a line survives iff (after
    * trimming) it ends in terminal punctuation (. ! ? " '), has ≥
    * minLineWords words, and does not contain "javascript"
    * (case-insensitive). Page rules over the SURVIVING text: ≥
    * minSentences sentences (terminal-punctuation count), no
    * "lorem ipsum", no '{'. Fields: n_lines, kept_lines, n_sentences,
    * has_lorem, has_brace, pass. [[c4Clean]] returns the surviving text
    * itself (kept lines re-joined with newlines) — the filter and the
    * transform share one definition so they can never disagree.
    */
  def c4Stats(text: Column, minLineWords: Int = 5,
              minSentences: Int = 3): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => l =!= "")
    val kept = c4KeptLines(text, minLineWords)
    val cleanTxt = array_join(kept, "\n")
    val sentences = regexp_count(cleanTxt, lit("[.!?]")).cast("long")
    val hasLorem = lower(text).contains("lorem ipsum")
    val hasBrace = text.contains("{")
    val pass = (sentences >= minSentences) && !hasLorem && !hasBrace
    struct(size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("kept_lines"),
      sentences.as("n_sentences"), hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"), pass.as("pass"))
  }

  private def c4KeptLines(text: Column, minLineWords: Int): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => l =!= "")
    filter(lines, l =>
      l.rlike("[.!?\"']$") &&
        (size(filter(split(l, "\\s+"), w => w =!= "")) >= minLineWords) &&
        !lower(l).contains("javascript"))
  }

  /** The C4 line filter as a transform: the surviving lines of `text`,
    * re-joined with newlines (empty string when nothing survives). See
    * [[c4Stats]].
    */
  def c4Clean(text: Column, minLineWords: Int = 5): Column =
    array_join(c4KeptLines(text, minLineWords), "\n")

  // ---- language identification -------------------------------------------

  /** Per-language stopword seeds for the n-gram/stopword heuristic. */
  val defaultLangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "de", "la", "que", "es")
  )

  /** Language-ID: argmax over per-language stopword token counts. Ties break
    * to the lexicographically larger language code; zero-hit rows → "und".
    * One tokenize + one array-filter per language — a single map-only
    * projection (the earlier per-word regexp_replace formulation re-scanned
    * the text 5× per language).
    */
  def langId(text: Column,
             profiles: Map[String, Seq[String]] = defaultLangProfiles): Column = {
    val toks = tokens(text)
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))
        .as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash dedup. */
  def wordShingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    array_distinct(
      when(size(w) >= n,
        transform(sequence(lit(1), size(w) - n + 1),
          i => concat_ws(" ", slice(w, i, lit(n)))))
        .otherwise(array(concat_ws(" ", w))))
  }

  /** 64-bit hashes of the word n-gram shingles (distinct). Same equality
    * classes as `wordShingles` (modulo 64-bit collisions) but no per-shingle
    * string is ever materialized — a custom codegen'd Catalyst expression
    * (graft.plans.ShingleHash) hashes tokens once and chains token hashes
    * per window. This is the form every join/minhash consumer should use;
    * `wordShingles` exists for callers that need the text itself.
    */
  def shingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.ShingleHash(
        org.apache.spark.sql.graftshim.Shim.exprOf(text), n))

  /** Reference formulation of `shingleHashes` in composed built-ins — kept
    * as the differential oracle for the custom expression's equality
    * classes (values differ by design; set sizes and overlaps must agree).
    */
  private[graft] def shingleHashesComposed(text: Column, n: Int): Column = {
    val th = transform(tokens(text), t => xxhash64(t))
    array_distinct(
      when(size(th) >= n,
        transform(sequence(lit(1), size(th) - n + 1),
          i => xxhash64(slice(th, i, lit(n)))))
        .otherwise(array(xxhash64(th))))
  }

  /** SQL-portable distinct shingle hashes: 60-bit ints from the md5 hex
    * prefix of each lowercase whitespace-split word n-gram. Every step
    * (split / concat / md5 / hex->int) exists in ANSI-ish SQL engines, so a
    * minhash pipeline seeded from THIS leaf is reproducible outside Spark —
    * the oracle path for `q_dedup_minhash`. Computed by the one-pass
    * codegen'd [[graft.plans.ShingleHashMd5]] expression (tokenize once,
    * digest each gram once, 60 bits straight from the digest bytes) —
    * value-identical to [[shingleHashesPortableComposed]], which stays as
    * the differential oracle. Still slower than [[shingleHashes]] (md5 is
    * the semantic); production callers should keep the default leaf.
    */
  def shingleHashesPortable(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.ShingleHashMd5(
        org.apache.spark.sql.graftshim.Shim.exprOf(text), n))

  /** Reference formulation of [[shingleHashesPortable]] in composed
    * built-ins — kept as the differential oracle for the custom
    * expression (VALUES must agree exactly, unlike the xxhash64 pair
    * where only equality classes match). */
  private[graft] def shingleHashesPortableComposed(text: Column,
                                                   n: Int): Column = {
    val w = split(lower(trim(text)), "\\s+")
    val cnt = size(w) - lit(n - 1)
    val grams = when(cnt >= 1,
        transform(sequence(lit(1), cnt),
          i => concat_ws(" ", (0 until n).map(j => element_at(w, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
    array_distinct(transform(grams,
      g => conv(substring(md5(g), 1, 15), 16, 10).cast("long")))
  }

  /** SQL-portable full 64-bit string hash: the first 16 md5 hex chars as a
    * signed int64, built from 32-bit halves — `(hi << 32) | lo` here;
    * engines with checked shifts (DuckDB) reach the same value via
    * unsigned HUGEINT arithmetic minus 2^64. The token-level sibling of
    * [[shingleHashesPortable]]: feeds oracle-reproducible simhash.
    */
  def portableHash64(s: Column): Column =
    org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.Md5Hash64(org.apache.spark.sql.graftshim.Shim.exprOf(s)))

  /** Reference formulation of [[portableHash64]] in composed built-ins —
    * the differential oracle for [[graft.plans.Md5Hash64]] (values must
    * agree exactly). */
  private[graft] def portableHash64Composed(s: Column): Column =
    shiftleft(conv(substring(md5(s), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(s), 9, 8), 16, 10).cast("long"))

  /** Boilerplate stripping for scraped corpora, each a single codegen'd
    * regexp pass (patterns valid under Java regex AND RE2, like
    * [[piiPatterns]]): drop HTML/XML tags, drop URLs, collapse runs of
    * whitespace. [[cleanText]] chains all three — the standard pre-tokenize
    * normalization for web-scraped training data.
    */
  def stripHtml(text: Column): Column =
    regexp_replace(text, "<[^>]*>", " ")
  def stripUrls(text: Column): Column =
    regexp_replace(text, "(https?|ftp)://[^\\s]+", " ")
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))
  def cleanText(text: Column): Column =
    collapseWhitespace(stripUrls(stripHtml(text)))

  /** Adjacent token pairs as "w1 w2" strings, NON-distinct (unlike
    * [[wordShingles]]) — the unit for language-model counting, where
    * repetition carries signal. Docs under two tokens yield an empty array.
    */
  def bigrams(text: Column): Column = {
    val w = tokens(text)
    when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Bigram language-model quality score — the simplified KenLM-style
    * perplexity filter used to rank corpus documents: per doc, the mean
    * add-one-smoothed bigram log-probability
    * `ln((B(w1,w2) + 1) / (U(w1) + V))` against counts estimated from
    * `corpus` (typically the corpus itself, or a trusted reference slice).
    * Higher (closer to 0) = more LM-typical text; repetitive boilerplate and
    * shuffled-token junk score low.
    *
    * Output: (idCol, n_bigrams, avg_logp) — docs with no bigrams are absent.
    * Scale shape: two count aggregates over the corpus (unigram, bigram) +
    * two equi-joins from the exploded doc bigrams; the vocabulary size rides
    * along as a broadcast single-row cross join, so nothing collects to the
    * driver and every stage is shuffle-bounded on token keys.
    */
  def lmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
              textCol: String, corpus: org.apache.spark.sql.DataFrame,
              corpusText: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count => fcount}
    val spreadC = graft.ops.Scale.spread(corpus)
    val uni = spreadC.select(explode(tokens(col(corpusText))).as("w1"))
      .groupBy("w1").agg(fcount(lit(1)).as("u"))
    val bi = spreadC.select(explode(bigrams(col(corpusText))).as("b"))
      .groupBy("b").agg(fcount(lit(1)).as("bc"))
    val vocab = uni.agg(fcount(lit(1)).as("v"))
    val db = graft.ops.Scale.spread(docs)
      .select(col(idCol).as("id"), explode(bigrams(col(textCol))).as("b"))
      .withColumn("w1", split(col("b"), " ").getItem(0))
    db.join(bi, Seq("b"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((coalesce(col("bc"), lit(0L)) + 1).cast("double") /
            (coalesce(col("u"), lit(0L)) + col("v")).cast("double")))
      .groupBy("id")
      .agg(fcount(lit(1)).as("n_bigrams"),
           round(avg(col("logp")), 4).as("avg_logp"))
      .select(col("id").as(idCol), col("n_bigrams"), col("avg_logp"))
  }

  /** DSIR-style importance resampling (the shape of Xie et al., "Data
    * Selection for Language Models via Importance Resampling", NeurIPS
    * 2023, on the repo's add-one bigram LM instead of hashed n-gram
    * features): score every candidate doc under a TARGET-corpus LM and
    * under the SOURCE (candidate-pool) LM; the importance weight
    * exp(avg_logp_target − avg_logp_source) up-weights documents that look
    * like the target distribution, and the deterministic
    * Efraimidis–Spirakis draw ([[graft.ops.Scale.weightedSampleBy]])
    * selects k per group without replacement — an auditable, replayable
    * data-selection pass. Docs with no bigrams have no likelihood under
    * either model and are excluded (inner-join semantics).
    *
    * Scale shape: the candidate corpus's exploded-bigram relation is built
    * ONCE (pinned) and scored against both count-table models — the same
    * per-bigram arithmetic as [[lmScore]] (same add-one smoothing, same
    * 4dp rounding), so results are identical to two independent lmScore
    * passes at half the explode/join work; models are aggregates, never
    * driver-side; the draw is the WindowGroupLimit sample.
    */
  def importanceResample(docs: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String,
                         target: org.apache.spark.sql.DataFrame,
                         targetText: String, grpCols: Seq[String], k: Int,
                         seed: String = "42"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count => fcount}
    val db = graft.ml.Dedup.trackCache(graft.ops.Scale.spread(docs)
      .select(col(idCol).as("__iid"), explode(bigrams(col(textCol))).as("b"))
      .withColumn("w1", split(col("b"), " ").getItem(0)))
    // one model = (unigram counts, bigram counts, vocab scalar); scoring
    // mirrors lmScore's expression tree exactly
    def scoreAgainst(corpus: org.apache.spark.sql.DataFrame,
                     corpusText: String, out: String) = {
      val spreadC = graft.ops.Scale.spread(corpus)
      val uni = spreadC.select(explode(tokens(col(corpusText))).as("w1"))
        .groupBy("w1").agg(fcount(lit(1)).as("u"))
      val bi = spreadC.select(explode(bigrams(col(corpusText))).as("b"))
        .groupBy("b").agg(fcount(lit(1)).as("bc"))
      val vocab = uni.agg(fcount(lit(1)).as("v"))
      db.join(bi, Seq("b"), "left")
        .join(uni, Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        .withColumn("logp",
          log((coalesce(col("bc"), lit(0L)) + 1).cast("double") /
              (coalesce(col("u"), lit(0L)) + col("v")).cast("double")))
        .groupBy("__iid")
        .agg(round(avg(col("logp")), 4).as(out))
    }
    val scored = docs
      .join(scoreAgainst(target, targetText, "__lt")
        .withColumnRenamed("__iid", idCol), idCol)
      .join(scoreAgainst(docs, textCol, "__ls")
        .withColumnRenamed("__iid", idCol), idCol)
    graft.ops.Scale.weightedSampleBy(scored, grpCols, idCol,
        exp(col("__lt") - col("__ls")), k, seed)
      .drop("__lt", "__ls")
  }

  /** Per-group token-distribution divergence against the whole corpus —
    * the mixture drift diagnostic: for each group g (domain, language,
    * snapshot), the cross-entropy H(p_g, q) = −Σ p·ln q and the
    * support-restricted KL Σ p·ln(p/q) of the group's token distribution
    * p_g against the corpus distribution q, where p = c_g(w)/total_g over
    * the group's OWN support and q is the add-α corpus distribution
    * (q = (c(w)+α)/(T+α|V|) — α keeps ln finite; restricting the sums to
    * the group's support is what makes the whole thing two aggregates and
    * ONE join, no group×vocab cross relation). Rising H or KL for a
    * domain between snapshots = its text is drifting away from the
    * corpus mixture. Output: (group, n_tokens, n_types, cross_entropy,
    * kl).
    *
    * Shapes at 100 TB: one tokenize+count pass (map-side combined), the
    * corpus counts derive from the group counts by one more aggregate,
    * one hash join on the token, and a per-group token-ordered fold — the
    * [[graft.text.Lm]] discipline, so the sums are bitwise
    * partition-invariant (DuckDB-replayable with the 6dp ln rounding);
    * per-group fold state is bounded by the group's distinct-type count.
    */
  def tokenDivergence(df: org.apache.spark.sql.DataFrame, groupCol: String,
                      textCol: String,
                      alpha: Double = 1.0): org.apache.spark.sql.DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val toks = graft.ops.Scale.spread(df).select(col(groupCol).as("__g"),
      explode(filter(split(trim(lower(col(textCol))), "\\s+"),
        w => w.rlike("^[a-z]+$"))).as("w"))
    val gc = toks.groupBy("__g", "w").agg(count(lit(1)).as("c"))
    val gt = gc.groupBy("__g")
      .agg(sum("c").as("gt"), count(lit(1)).as("n_types"))
    val cc = gc.groupBy("w").agg(sum("c").as("cw"))
    val st = cc.agg(count(lit(1)).as("v"), sum("cw").as("t")).head()
    val (v, t) = (st.getLong(0), st.getLong(1))
    val tm = gc.join(gt, Seq("__g")).join(cc, Seq("w"))
      .withColumn("p", col("c") / col("gt"))
      .withColumn("q", (col("cw") + lit(alpha)) /
        (lit(t) + lit(alpha) * lit(v)))
      .withColumn("ce", -(col("p") * log(col("q"))))
      .withColumn("kl", col("p") * log(col("p") / col("q")))
    tm.groupBy("__g")
      .agg(max("gt").as("n_tokens"), max("n_types").as("n_types"),
        collect_list(struct(col("w"), col("ce"), col("kl"))).as("__ts"))
      .select(col("__g").as(groupCol), col("n_tokens"), col("n_types"),
        expr("aggregate(transform(array_sort(__ts), s -> s.ce), 0.0D," +
          " (a, x) -> a + x)").as("cross_entropy"),
        expr("aggregate(transform(array_sort(__ts), s -> s.kl), 0.0D," +
          " (a, x) -> a + x)").as("kl"))
  }

  /** PII patterns for training-data scrubbing, in application order (most
    * specific first so e.g. the phone pattern never eats an SSN). Each is
    * valid under BOTH Java regex (Spark) and RE2 (DuckDB/Go tooling) — no
    * lookarounds, no backrefs — so the scrub is reproducible outside Spark.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn"   -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    // left-anchored on '+' or a word boundary: without it any 10-12 digit
    // window INSIDE a longer run (order keys, ns timestamps) matched; with
    // it a match can only start at the run's head, where the trailing \b
    // then rejects runs longer than 12 digits
    "phone" -> "(\\+|\\b)(\\d{1,2}[-. ]?)?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}\\b",
    // real octets only (0-255): 999.999.999.999-style junk stays
    "ipv4"  -> "\\b(25[0-5]|2[0-4]\\d|1?\\d?\\d)(\\.(25[0-5]|2[0-4]\\d|1?\\d?\\d)){3}\\b")

  /** Redact PII with per-type tokens ([EMAIL], [SSN], [PHONE], [IPV4]).
    * Four codegen'd regexp_replace passes — no UDF, no extra scan.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"[${name.toUpperCase}]")
    }

  /** Per-type PII match counts as a struct(email, ssn, phone, ipv4). Each
    * type is counted on the text with all PRIOR types already redacted —
    * exactly what [[redactPii]] removes at that stage, so
    * sum(counts) == number of replacements performed.
    */
  def piiCounts(text: Column): Column = {
    val (cols, _) = piiPatterns.foldLeft((Seq.empty[Column], text)) {
      case ((acc, cur), (name, pat)) =>
        (acc :+ regexp_count(cur, lit(pat)).cast("long").as(name),
         regexp_replace(cur, pat, s"[${name.toUpperCase}]"))
    }
    struct(cols: _*)
  }

  /** Flesch–Kincaid grade level with the standard regex syllable
    * approximation (vowel-group count, min 1 per word):
    * 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59. Sentences
    * are [.!?]+ runs (min 1). Three regexp_count passes, codegen'd; the
    * inputs are exact integers so the score is engine-deterministic.
    * The classic cheap readability gate for corpus quality filtering.
    */
  def fleschKincaid(text: Column): Column = {
    val words = greatest(size(tokens(text)), lit(1)).cast("long")
    val sentences = greatest(regexp_count(text, lit("[.!?]+")), lit(1))
      .cast("long")
    // vowel groups, floored at one syllable per word
    val vgroups = regexp_count(lower(text), lit("[aeiouy]+")).cast("long")
    val syllables = greatest(vgroups, words)
    lit(0.39) * (words.cast("double") / sentences) +
      lit(11.8) * (syllables.cast("double") / words) - lit(15.59)
  }

  /** Content-defined chunking (the LBFS/Venti rolling-hash boundary
    * technique, token-level): a chunk boundary falls after token p whenever
    * the hash of the n-gram ENDING at p is ≡ 0 (mod divisor) — so chunk
    * boundaries move WITH the content, and an insertion early in a doc
    * re-chunks only its neighborhood (shift-resistant dedup units, unlike
    * fixed-size chunking). Expected chunk length ≈ divisor tokens.
    *
    * `toks` must be a MATERIALIZED token-array column (`tokens(text)`
    * assigned via withColumn first — inlining the split here would re-run
    * it per gram). Returns array<struct<tok_start, n_tok, chunk_md5>>;
    * md5 of the space-joined tokens is the chunk's dedup fingerprint.
    */
  def cdcChunks(toks: Column, n: Int = 5, divisor: Int = 8,
                hash: Column => Column = xxhash64(_)): Column = {
    val nW = size(toks) - (n - 1)
    // 0-based END index of each boundary gram (boundary cuts AFTER it)
    val cuts = filter(
      when(nW >= 1, transform(sequence(lit(1), nW), g =>
        when(pmod(hash(concat_ws(" ", slice(toks, g, lit(n)))),
          lit(divisor.toLong)) === 0, (g + n - 2).cast("int"))
          .otherwise(lit(-1))))
        .otherwise(array().cast("array<int>")),
      x => x >= 0)
    val starts0 = array_distinct(array_sort(
      concat(array(lit(0)), transform(cuts, _ + 1))))
    val starts = filter(starts0, x => x < size(toks))
    val ends = concat(slice(starts, lit(2), greatest(size(starts) - 1, lit(0))),
      array(size(toks)))
    zip_with(starts, ends, (s, e) => struct(
      s.as("tok_start"), (e - s).as("n_tok"),
      md5(concat_ws(" ", slice(toks, s + 1, e - s))).as("chunk_md5")))
  }

  /** T5-style span-corruption pair (Raffel et al. 2020 §3.1.4 denoising
    * objective): tokens are masked by a DETERMINISTIC per-(seed, position)
    * hash coin (rateBp basis points), maximal masked runs collapse to one
    * numbered sentinel on the input side and expand to sentinel-prefixed
    * spans on the target side. Pure array expressions — reproducible
    * across engines (the coin is the portable 60-bit md5 leaf), no RNG
    * state, no UDF; re-running on the same doc always yields the same
    * pair, so the corruption is replayable corpus-wide.
    *
    * Returns struct(input, target). The sentinel-numbering prefix count is
    * O(tokens²) per doc in expression form — fine for context-window-sized
    * docs; chunk first ([[chunkTokens]]) for very long ones.
    */
  def spanCorrupt(text: Column, seed: Column, rateBp: Int = 1500): Column = {
    val w = tokens(text)
    val idx = sequence(lit(0), size(w) - 1)
    def coin(i: Column): Column =
      graft.ops.Sketch.portableHash(concat(seed.cast("string"), lit("|"),
        i.cast("string"))) % 10000 < rateBp
    // single left fold so the hash coin evaluates exactly once per
    // position (a flags-array formulation re-evaluates the producer array
    // inside every element_at — O(n²) md5 calls)
    val empty = array().cast("array<string>")
    val acc0 = struct(empty.as("inp"), empty.as("tgt"),
      lit(0L).as("k"), lit(false).as("prev"))
    val folded = aggregate(idx, acc0, (acc, i) => {
      val tok = element_at(w, i + 1)
      val flag = coin(i)
      val isStart = flag && !acc.getField("prev")
      val sent = concat(lit("<extra_id_"), acc.getField("k").cast("string"),
        lit(">"))
      struct(
        when(!flag, concat(acc.getField("inp"), array(tok)))
          .when(isStart, concat(acc.getField("inp"), array(sent)))
          .otherwise(acc.getField("inp")).as("inp"),
        when(isStart, concat(acc.getField("tgt"), array(sent, tok)))
          .when(flag, concat(acc.getField("tgt"), array(tok)))
          .otherwise(acc.getField("tgt")).as("tgt"),
        (acc.getField("k") + when(isStart, 1L).otherwise(0L)).as("k"),
        flag.as("prev"))
    })
    struct(array_join(folded.getField("inp"), " ").as("input"),
      array_join(folded.getField("tgt"), " ").as("target"))
  }

  /** Split a document into token-window chunks of `chunkSize` tokens with
    * `overlap` tokens shared between consecutive chunks — the standard
    * context-window prep for training pipelines. Chunk starts advance by
    * `chunkSize - overlap`; the count is exactly ceil((n - overlap) / step)
    * so every token is covered and no chunk is pure overlap. One
    * tokenization pass, all array expressions — codegen-friendly, no
    * explode until the caller asks for rows.
    */
  def chunkTokens(text: Column, chunkSize: Int, overlap: Int = 0): Column = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val toks = tokens(text)
    val n = size(toks)
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(
      ceil((n - lit(overlap)).cast("double") / step).cast("int"))
    transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * step + 1, lit(chunkSize)), " "))
  }

  /** Chunk a corpus into (doc_id, chunk_id, chunk) rows. The explode happens
    * AFTER the per-document array build, so chunk generation parallelizes
    * with the scan; `spread` widens narrow scans first (chunking is a
    * CPU-bound per-row pass).
    */
  def chunkDocs(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                chunkSize: Int, overlap: Int = 0): org.apache.spark.sql.DataFrame =
    graft.ops.Scale.spread(df).select(col(idCol).as("doc_id"),
      posexplode(chunkTokens(col(textCol), chunkSize, overlap)))
      .withColumnsRenamed(Map("pos" -> "chunk_id", "col" -> "chunk"))

  /** One-pass Gopher-style repetition counts (struct of exact integers —
    * duplicate lines/paragraphs, top and duplicated word n-grams; see
    * `plans.RepetitionStats` for the precise mirrorable semantics). Map-only:
    * the decision for each document never leaves its partition.
    */
  def repetitionStats(text: Column,
                      topNs: Seq[Int] = Seq(2, 3, 4),
                      dupNs: Seq[Int] = Seq(5, 8)): Column =
    org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.RepetitionStats(
        org.apache.spark.sql.graftshim.Shim.exprOf(text), topNs, dupNs))

  /** Gopher repetition-filter verdict (Rae et al. 2021 table A1 thresholds):
    * keep a document only if every repetition fraction is under its cap.
    * Fractions are plain double ratios of the exact counts — fine for
    * thresholding (oracle queries should compare the integer counts
    * themselves).
    */
  def repetitionKeep(text: Column,
                     maxDupLineFrac: Double = 0.30,
                     maxDupParaFrac: Double = 0.30,
                     maxDupLineCharFrac: Double = 0.20,
                     maxDupParaCharFrac: Double = 0.20,
                     maxTopGramFrac: Map[Int, Double] =
                       Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
                     maxDupGramFrac: Map[Int, Double] =
                       Map(5 -> 0.15, 8 -> 0.10)): Column = {
    val st = repetitionStats(text,
      maxTopGramFrac.keys.toSeq.sorted, maxDupGramFrac.keys.toSeq.sorted)
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den).otherwise(lit(0.0))
    val lineOk =
      frac(st("dup_lines"), st("lines")) <= maxDupLineFrac &&
      frac(st("dup_line_chars"), st("line_chars")) <= maxDupLineCharFrac
    val paraOk =
      frac(st("dup_paras"), st("paras")) <= maxDupParaFrac &&
      frac(st("dup_para_chars"), st("para_chars")) <= maxDupParaCharFrac
    val topOk = maxTopGramFrac.toSeq.sortBy(_._1).map { case (n, cap) =>
      frac(st(s"top${n}gram_count") * st(s"top${n}gram_len"), st("chars")) <= cap
    }.reduce(_ && _)
    val dupOk = maxDupGramFrac.toSeq.sortBy(_._1).map { case (n, cap) =>
      frac(st(s"dup${n}gram_chars"), st("chars")) <= cap
    }.reduce(_ && _)
    lineOk && paraOk && topOk && dupOk
  }
}
