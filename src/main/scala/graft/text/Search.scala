package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over a corpus: inverted index, Okapi BM25 ranking, and
  * tf-idf keyword extraction. The sparse complement of [[graft.ml.Similarity]]'s
  * dense-embedding ANN — a curation pipeline uses both (BM25 recall set,
  * embedding re-rank). Reference scope: siuba has no retrieval verbs; this
  * is part of the training-data-pipeline extension surface.
  *
  * Scale shape: the index is one explode + groupBy (shuffle on term — the
  * classic inverted-index build); scoring joins the (tiny, distinct) query
  * term set via broadcast so only matching postings leave the map side.
  * Nothing corpus-sized is ever collected or broadcast.
  */
object Search {

  /** Postings list: (term, id, tf, dl) — term frequency plus the containing
    * doc's token length (carried through the aggregate so scoring needs no
    * second join against a doc-length table).
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // materialize the token array BEFORE the generate: referencing
    // size(split(text)) next to explode(split(text)) re-runs the regex
    // split once per exploded token row (~dl× the work); over an array
    // column the recompute is an O(1) length read
    df.select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("__w"))
      .select(col("id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("term"))
      .groupBy("term", "id", "dl")
      .agg(count(lit(1)).cast("long").as("tf"))

  /** Okapi BM25 top-k retrieval. `queries` is a (qidCol, qtextCol) table —
    * small by assumption (it is broadcast). Returns
    * (query_id, id, score, rank), the `topK` highest-scoring docs per
    * query; rank ties on the 4-dp-rounded score break by doc id, so
    * results are deterministic and engine-portable.
    *
    * idf is the Lucene/plus-one form ln(1 + (N - df + 0.5)/(df + 0.5)) —
    * always positive, so stop-word-heavy queries degrade instead of
    * flipping sign. N, df, dl and Σdl are exact integers; both engines see
    * identical rationals, so every per-term score is bit-identical and the
    * only cross-engine noise is summation order across a query's few terms
    * (~1e-16, far below the 4-dp rounding).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qidCol: String, qtextCol: String,
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    val w = TextFns.tokens(col(textCol))
    val qterms = queries
      .select(col(qidCol).as("query_id"),
        explode(array_distinct(TextFns.tokens(col(qtextCol)))).as("term"))
    // the query-term restriction happens MAP-SIDE, before any shuffle: the
    // corpus-wide tf/df tables are never built — only tokens matching a
    // (broadcast) query term ever aggregate. At corpus scale this is the
    // difference between shuffling the vocabulary and shuffling a few
    // hundred postings. The semi-join uses the distinct term SET, not the
    // per-query pairs, so a term shared by many queries (or doc-length
    // queries) never duplicates pre-aggregation rows; query_ids attach
    // post-aggregation via the qterms broadcast.
    val qset = qterms.select("term").distinct()
    val tf = docs
      .select(col(idCol).as("id"), w.as("__w"))
      .select(col("id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("term"))
      .join(broadcast(qset), "term", "left_semi")
      .groupBy("term", "id", "dl")
      .agg(count(lit(1)).cast("long").as("tf"))
    // tf is unique per (term, id), so df is a plain count per term — no
    // second corpus scan (AQE reuses tf's exchange)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    // 1-row corpus stats from a plain scan (no shuffle), broadcast-joined
    val corpus = docs.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(size(w)).cast("long").as("sum_dl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val tfPart = (col("tf") * (k1 + 1)).cast("double") /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
    val scored = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfreq.join(corpus)), "term")
      .groupBy("query_id", "id")
      .agg(round(sum(idf * tfPart), 4).as("score"))
    val rw = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(rw).cast("long"))
      .where(col("rank") <= topK)
  }

  /** Frozen-corpus BM25 statistics for a fixed topic set: one row per
    * (topic_id, term) carrying the corpus document frequency (0 for terms
    * the corpus never saw — they keep the maximal idf), plus N and Σdl.
    * Broadcast-sized by construction (|topic terms| rows). Persist it and
    * tag arriving docs with [[bm25TagAgainst]] or the streaming sibling —
    * idf/avgdl stay pinned to the frozen corpus, so backfill and ingest
    * agree. df comes from one per-doc-distinct explode restricted
    * map-side to topic terms; no corpus-wide aggregate is built.
    */
  def bm25TopicStats(docs: DataFrame, idCol: String, textCol: String,
                     topics: DataFrame, tidCol: String,
                     ttextCol: String): DataFrame = {
    val w = TextFns.tokens(col(textCol))
    val qterms = topics.select(col(tidCol).as("topic_id"),
      explode(array_distinct(TextFns.tokens(col(ttextCol)))).as("term"))
    val qset = qterms.select("term").distinct()
    val dfreq = docs.select(explode(array_distinct(w)).as("term"))
      .join(broadcast(qset), "term", "left_semi")
      .groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val corpus = docs.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(size(w)).cast("long").as("sum_dl"))
    qterms.join(dfreq, Seq("term"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .join(broadcast(corpus))
  }

  /** Merge two [[bm25TopicStats]] tables computed over DISJOINT corpus
    * slices for the SAME topic set: every statistic is an additive exact
    * integer (df counts, N, Σdl), so `merge(stats(A), stats(B))` is
    * bit-identical to `stats(A ∪ B)` — the incremental path for a corpus
    * that grows by ingest batches, with no corpus rescan. Both inputs are
    * broadcast-sized by the stats contract (|topic terms| rows), so the
    * join is trivially small; the per-table (n_docs, sum_dl) pair is
    * constant across rows by construction and adds pairwise.
    */
  def bm25StatsMerge(a: DataFrame, b: DataFrame): DataFrame = {
    val bSide = b.select(col("topic_id").as("__tid_b"),
      col("term").as("__term_b"), col("df").as("__df_b"),
      col("n_docs").as("__n_b"), col("sum_dl").as("__s_b"))
    val joined = a.join(bSide,
      col("topic_id") === col("__tid_b") && col("term") === col("__term_b"),
      "full")
    // a topic term absent from one side contributes df=0 there, but the
    // side's corpus totals still apply — they are global, not per-term, so
    // missing per-row values fall back to the side's table-wide constants
    val consts = joined.agg(
      coalesce(max(col("n_docs")), lit(0L)).as("__na"),
      coalesce(max(col("sum_dl")), lit(0L)).as("__sa"),
      coalesce(max(col("__n_b")), lit(0L)).as("__nb"),
      coalesce(max(col("__s_b")), lit(0L)).as("__sb"))
    joined.join(broadcast(consts))
      .select(
        coalesce(col("topic_id"), col("__tid_b")).as("topic_id"),
        coalesce(col("term"), col("__term_b")).as("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("__df_b"), lit(0L))).as("df"),
        (col("__na") + col("__nb")).as("n_docs"),
        (col("__sa") + col("__sb")).as("sum_dl"))
  }

  /** Tag docs with BM25 scores against a [[bm25TopicStats]] table:
    * (id, topic_id, score, rank) with rank 1 the best topic per doc (ties
    * on the 4-dp score break by topic_id). Docs sharing no term with any
    * topic emit nothing. Map-side: the stats table broadcasts; the only
    * shuffle is the per-(topic, doc) score aggregation.
    */
  def bm25TagAgainst(df: DataFrame, idCol: String, textCol: String,
                     stats: DataFrame, k1: Double = 1.2,
                     b: Double = 0.75): DataFrame = {
    val w = TextFns.tokens(col(textCol))
    val matched = df
      .select(col(idCol).as("id"), w.as("__w"))
      .select(col("id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("term"))
      .join(broadcast(stats), "term")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val tfPart = (col("tf") * (k1 + 1)).cast("double") /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
    val scored = matched
      .groupBy("topic_id", "id", "dl", "term", "df", "n_docs", "sum_dl")
      .agg(count(lit(1)).cast("long").as("tf"))
      .groupBy("topic_id", "id")
      .agg(round(sum(idf * tfPart), 4).as("score"))
    val rw = Window.partitionBy("id")
      .orderBy(col("score").desc, col("topic_id"))
    scored.withColumn("rank", row_number().over(rw).cast("long"))
      .select(col("id"), col("topic_id"), col("score"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * fused(d) = Σ_lists 1/(k0 + rank_list(d)). Each input must have
    * (query_id, id, rank); lists may cover different item subsets (a doc
    * missing from a list simply contributes no term — the standard RRF
    * treatment of partial coverage, e.g. docs without embeddings).
    * Returns (query_id, id, rrf, n_lists, rank), top `topK` per query,
    * ties on the fused score broken by id.
    *
    * Determinism note: with two lists the fused sum is a single IEEE
    * addition (commutative), so even pre-round ranking is bit-identical
    * across engines; with 3+ lists summation order matters at the ~1e-17
    * level — fine for the 6-dp output, but don't hash-compare unrounded
    * ranks across engines then.
    */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int = 60,
              topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val terms = rankings.map(_.select(col("query_id"), col("id"),
      (lit(1.0) / (col("rank") + k0)).as("__t")))
    val fused = terms.reduce(_ unionByName _)
      .groupBy("query_id", "id")
      .agg(sum(col("__t")).as("__s"), count(lit(1)).cast("long").as("n_lists"))
    val w = Window.partitionBy("query_id").orderBy(col("__s").desc, col("id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("id"), round(col("__s"), 6).as("rrf"),
        col("n_lists"), col("rank"))
  }

  /** Top-k characteristic terms per document by tf-idf (tf · ln(N/df)).
    * Fully deterministic across engines: tf, N, df are exact integers, so
    * each score is one ln and one multiply of identical doubles — no
    * summation anywhere. Terms appearing in every doc (idf 0) rank last
    * naturally. Returns (id, term, score, rank), rank ties by term.
    */
  def tfidfTerms(docs: DataFrame, idCol: String, textCol: String,
                 topK: Int = 3): DataFrame = {
    val postings = invertedIndex(docs, idCol, textCol)
    // 1-row doc count from a plain scan (no shuffle), broadcast-joined
    val corpus = docs.agg(count(lit(1)).cast("long").as("n_docs"))
    // every posting needs its term's df; a COUNT window partitioned by
    // term computes it from the postings table itself — one exchange of
    // the compact postings, never a second corpus scan + self-join
    val df = count(lit(1)).over(Window.partitionBy("term")).cast("long")
    val score = col("tf").cast("double") *
      log(col("n_docs").cast("double") / col("df"))
    val rw = Window.partitionBy("id").orderBy(col("__s").desc, col("term"))
    postings
      .withColumn("df", df)
      .join(broadcast(corpus))
      .withColumn("__s", score)
      .withColumn("rank", row_number().over(rw).cast("long"))
      .where(col("rank") <= topK)
      .select(col("id"), col("term"), round(col("__s"), 4).as("score"),
        col("rank"))
  }

  /** Pointwise-mutual-information bigram collocations over the corpus:
    * PMI(x,y) = ln( c_xy · T² / (B · c_x · c_y) ) with T total tokens, B
    * total bigrams, c the exact corpus counts. One explode + three
    * aggregates; the 1-row corpus totals broadcast-join onto the bigram
    * table. All counts are exact integers and the score is one ln of one
    * exact-product ratio — bit-deterministic (products stay < 2^53 for
    * corpora up to ~10⁷ tokens; beyond that the ratio form
    * (c_xy/B)/((c_x/T)(c_y/T)) trades exactness for range).
    * Returns the global top-k by (pmi desc, w1, w2) among bigrams with
    * c_xy >= minCount.
    */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
                      minCount: Long = 5, topK: Int = 20,
                      window: Int = 1): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val w = TextFns.tokens(col(textCol))
    val toks = df.select(w.as("__w"))
    val uni = toks.select(explode(col("__w")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // ordered pairs (w_i, w_{i+d}) for every gap d in 1..window — the
    // skip-gram generalization; window=1 is classic adjacent bigrams
    def pairsAt(d: Int) = {
      val pairs = zip_with(
        slice(col("__w"), lit(1), size(col("__w")) - d),
        slice(col("__w"), lit(1 + d), size(col("__w")) - d),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      // slice length must be >= 0: docs shorter than the gap emit nothing
      when(size(col("__w")) > d, pairs)
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    }
    val bigrams = toks.select(explode(flatten(array(
        (1 to window).map(pairsAt): _*))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount)
    // 1-row corpus totals; tokens >= 1 per doc so size-d floors at 0 via
    // greatest (a doc shorter than the gap emits no pairs)
    val bPerDoc = (1 to window)
      .map(d => greatest(size(col("__w")) - d, lit(0)))
      .reduce(_ + _)
    val totals = toks.agg(sum(size(col("__w"))).cast("long").as("t_tok"),
      sum(bPerDoc).cast("long").as("b_tok"))
    val pmi = log((col("c_xy") * col("t_tok") * col("t_tok")).cast("double") /
      (col("b_tok") * col("c_x") * col("c_y")).cast("double"))
    bigrams
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .join(broadcast(totals))
      .withColumn("__pmi", pmi)
      // global top-k: orderBy+limit plans TakeOrderedAndProject — no
      // single-reducer window
      .orderBy(col("__pmi").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("c_xy"),
        round(col("__pmi"), 4).as("pmi"))
  }

  /** Corpus vocabulary statistics in one pass over the term-frequency
    * table: total tokens, vocabulary size, hapax-legomena count, and the
    * most-frequent term's share in basis points (integer floor — exact).
    * The quick Zipf-curve health check for a training corpus.
    */
  def vocabStats(df: DataFrame, textCol: String): DataFrame = {
    val uni = df.select(explode(TextFns.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    uni.agg(sum(col("c")).cast("long").as("t_tok"),
        count(lit(1)).cast("long").as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("hapax"),
        max(col("c")).cast("long").as("top_c"))
      .withColumn("top_bp", expr("(10000L * top_c) div t_tok"))
  }
}
