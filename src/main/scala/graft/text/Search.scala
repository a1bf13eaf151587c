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
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextFns.tokens(col(textCol))
    df.select(col(idCol).as("id"), size(w).cast("long").as("dl"),
        explode(w).as("term"))
      .groupBy("term", "id", "dl")
      .agg(count(lit(1)).cast("long").as("tf"))
  }

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
    val postings = invertedIndex(docs, idCol, textCol)
    // corpus stats as a 1-row broadcast-joined table (no driver collect)
    val corpus = postings.groupBy().agg(
      countDistinct(col("id")).as("n_docs"),
      sum(col("tf")).as("sum_dl"))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val qterms = queries
      .select(col(qidCol).as("query_id"),
        explode(array_distinct(TextFns.tokens(col(qtextCol)))).as("term"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val tfPart = (col("tf") * (k1 + 1)).cast("double") /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
    val scored = postings
      .join(broadcast(qterms), "term")
      .join(broadcast(dfreq.join(corpus)), "term")
      .groupBy("query_id", "id")
      .agg(round(sum(idf * tfPart), 4).as("score"))
    val rw = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(rw).cast("long"))
      .where(col("rank") <= topK)
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
    val corpus = postings.groupBy().agg(countDistinct(col("id")).as("n_docs"))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val score = col("tf").cast("double") *
      log(col("n_docs").cast("double") / col("df"))
    val rw = Window.partitionBy("id").orderBy(col("__s").desc, col("term"))
    postings
      .join(broadcast(dfreq.join(corpus)), "term")
      .withColumn("__s", score)
      .withColumn("rank", row_number().over(rw).cast("long"))
      .where(col("rank") <= topK)
      .select(col("id"), col("term"), round(col("__s"), 4).as("score"),
        col("rank"))
  }
}
