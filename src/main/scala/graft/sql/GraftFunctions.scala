package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL surface for graft's custom Catalyst expressions, so `spark.sql`
  * pipelines (and any BI tool speaking SQL to a graft-enabled session) reach
  * the same codegen'd kernels as the Scala DSL. The reference exposes every
  * op through its SQL backends (siuba/sql/translate.py builds per-dialect
  * SQL for the whole registry); graft's analog is registering its five
  * engine-level primitives in Spark's own FunctionRegistry:
  *
  *   - shingle_hash(text[, n])      → array<bigint>   (ShingleHash)
  *   - dot_product(a, b)            → double          (DotProduct)
  *   - array_eq_count(a, b)         → int             (ArrayEqCount)
  *   - minhash_agg(h[, k[, seed]])  → array<bigint>   (MinHashAgg, aggregate)
  *   - heavy_hitters(x, k)          → array<struct>   (HeavyHittersAgg, aggregate)
  *
  * Two registration paths, same builders:
  *   - config: `spark.sql.extensions=graft.sql.GraftExtensions` (cluster-wide,
  *     set before session start — the production path);
  *   - live session: `GraftFunctions.register(spark)` (session-scoped temp
  *     functions — notebooks and tests).
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType)   => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${other.sql}")
  }

  private def longLit(e: Expression, fn: String, arg: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType)   => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${other.sql}")
  }

  private def arity(fn: String, got: Int, expected: String): Nothing =
    throw new IllegalArgumentException(s"$fn expects $expected arguments, got $got")

  // 5-arg form: the 3-arg constructor is (className, db, name) — passing
  // usage there scrambles DESCRIBE FUNCTION output (name shows the usage
  // text, className shows the db slot).
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.plans", null, name, usage, "")

  /** (identifier, info, builder) triples in SparkSessionExtensions'
    * injectFunction shape.
    */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("shingle_hash"),
      info("shingle_hash",
        "shingle_hash(text[, n]) - distinct 64-bit hashes of word n-grams (default n=3)"),
      {
        case Seq(text)    => graft.plans.ShingleHash(text, 3)
        case Seq(text, n) => graft.plans.ShingleHash(text, intLit(n, "shingle_hash", "n"))
        case args         => arity("shingle_hash", args.size, "1 or 2")
      }),
    (FunctionIdentifier("dot_product"),
      info("dot_product",
        "dot_product(a, b) - dot product of two numeric arrays"),
      {
        case Seq(a, b) => graft.plans.DotProduct(a, b)
        case args      => arity("dot_product", args.size, "2")
      }),
    (FunctionIdentifier("array_eq_count"),
      info("array_eq_count",
        "array_eq_count(a, b) - positions where two array<bigint> agree"),
      {
        case Seq(a, b) => graft.plans.ArrayEqCount(a, b)
        case args      => arity("array_eq_count", args.size, "2")
      }),
    (FunctionIdentifier("minhash_agg"),
      info("minhash_agg",
        "minhash_agg(h[, k[, seed]]) - k-permutation MinHash signature of a bigint hash column (default k=32, seed=42)"),
      {
        case Seq(h)          => graft.plans.MinHashAgg(h, 32, 42L)
        case Seq(h, k)       => graft.plans.MinHashAgg(h, intLit(k, "minhash_agg", "k"), 42L)
        case Seq(h, k, seed) => graft.plans.MinHashAgg(h, intLit(k, "minhash_agg", "k"),
                                                       longLit(seed, "minhash_agg", "seed"))
        case args            => arity("minhash_agg", args.size, "1 to 3")
      }),
    (FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters",
        "heavy_hitters(x[, w], k) - Misra-Gries approximate top-k of a string/bigint column, optionally weighted: array<struct<item, est_count>> (exact when distinct <= k)"),
      {
        case Seq(x, k)    => graft.plans.HeavyHittersAgg(x, intLit(k, "heavy_hitters", "k"))
        case Seq(x, w, k) => graft.plans.HeavyHittersAgg(x, w, intLit(k, "heavy_hitters", "k"))
        case args         => arity("heavy_hitters", args.size, "2 or 3")
      }),
    (FunctionIdentifier("char_stats"),
      info("char_stats",
        "char_stats(text) - one-pass struct(chars, tokens, nonws, punct, digits, upper)"),
      {
        case Seq(text) => graft.plans.CharStats(text)
        case args      => arity("char_stats", args.size, "1")
      }),
    (FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(text) - one-pass Gopher repetition counts: dup lines/paragraphs, top 2-4-gram and dup 5/8-gram char coverage (exact integers)"),
      {
        case Seq(text) => graft.plans.RepetitionStats(text)
        case args      => arity("repetition_stats", args.size, "1")
      }),
    (FunctionIdentifier("count_min_agg"),
      info("count_min_agg",
        "count_min_agg(k, width, depth) - aggregate a string key column into Count-Min counters: array<bigint> of length depth*width, cell (d, b) at index d*width + b (portable md5 buckets, same as cm_bucket; read back with cm_estimate)"),
      {
        case Seq(k, w, d) => graft.plans.CountMinAgg(k,
          intLit(w, "count_min_agg", "width"), intLit(d, "count_min_agg", "depth"))
        case args => arity("count_min_agg", args.size, "3")
      }),
    (FunctionIdentifier("qsketch_agg"),
      info("qsketch_agg",
        "qsketch_agg(v, k) - aggregate a double column into a mergeable quantile sketch: array<struct<lvl,v,w>> weighted points, per-level capacity k (exact when group count <= k; read back with qsketch_estimate over transform(pts, p -> struct(p.v, p.w)))"),
      {
        case Seq(v, k) => graft.plans.QuantileSketchAgg(v,
          intLit(k, "qsketch_agg", "k"))
        case args => arity("qsketch_agg", args.size, "2")
      }),
    (FunctionIdentifier("qsketch_merge_agg"),
      info("qsketch_merge_agg",
        "qsketch_merge_agg(lvl, v, k) - re-aggregate persisted quantile-sketch points (lvl, v) into one combined sketch: array<struct<lvl,v,w>>, same capacity-k compaction as qsketch_agg (lossless in the exact regime)"),
      {
        case Seq(l, v, k) => graft.plans.QuantileSketchMergeAgg(l, v,
          intLit(k, "qsketch_merge_agg", "k"))
        case args => arity("qsketch_merge_agg", args.size, "3")
      }),
    (FunctionIdentifier("hyperplane_sigs"),
      info("hyperplane_sigs",
        "hyperplane_sigs(vec, dim, n_planes, n_tables[, seed]) - LSH hyperplane signatures, one bigint per table (default seed=42)"),
      {
        case Seq(v, d, p, t) => graft.plans.HyperplaneSigs(v,
          intLit(d, "hyperplane_sigs", "dim"), intLit(p, "hyperplane_sigs", "n_planes"),
          intLit(t, "hyperplane_sigs", "n_tables"), 42L)
        case Seq(v, d, p, t, s) => graft.plans.HyperplaneSigs(v,
          intLit(d, "hyperplane_sigs", "dim"), intLit(p, "hyperplane_sigs", "n_planes"),
          intLit(t, "hyperplane_sigs", "n_tables"), longLit(s, "hyperplane_sigs", "seed"))
        case args => arity("hyperplane_sigs", args.size, "4 or 5")
      })
  )

  /** Register every graft function on a live session (session-scoped). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.graftshim.Shim.registerFunction(spark, ident, inf, builder)
    }

  /** Curation scalars for pure-SQL users, as Spark 4 SQL UDFs
    * (`CREATE TEMPORARY FUNCTION ... RETURN <expr>` — declarative bodies,
    * fully Catalyst-optimized, NO closure/JVM UDF involved). Each body is
    * the same expression tree as its Column-API twin in
    * [[graft.text.TextFns]]; SqlFunctionsSpec asserts the equivalence.
    */
  def registerSqlMacros(spark: SparkSession): Unit = {
    val piiStages = graft.text.TextFns.piiPatterns.foldLeft("s") {
      case (acc, (name, pat)) =>
        val p = pat.replace("\\", "\\\\").replace("'", "''")
        s"regexp_replace($acc, '$p', '[${name.toUpperCase}]')"
    }
    val defs = Seq(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION redact_pii(s STRING)
         |RETURNS STRING RETURN $piiStages""".stripMargin,
      """CREATE OR REPLACE TEMPORARY FUNCTION strip_html(s STRING)
        |RETURNS STRING RETURN regexp_replace(s, '<[^>]*>', ' ')""".stripMargin,
      """CREATE OR REPLACE TEMPORARY FUNCTION strip_urls(s STRING)
        |RETURNS STRING RETURN
        |  regexp_replace(s, '(https?|ftp)://[^\\s]+', ' ')""".stripMargin,
      """CREATE OR REPLACE TEMPORARY FUNCTION clean_text(s STRING)
        |RETURNS STRING RETURN
        |  trim(regexp_replace(regexp_replace(regexp_replace(
        |    s, '<[^>]*>', ' '), '(https?|ftp)://[^\\s]+', ' '), '\\s+', ' '))""".stripMargin,
      """CREATE OR REPLACE TEMPORARY FUNCTION ws_token_count(s STRING)
        |RETURNS BIGINT RETURN
        |  CAST(size(split(trim(lower(s)), '\\s+')) AS BIGINT)""".stripMargin,
      // retrieval scoring kernels — the per-term math of Search.bm25 /
      // tfidfTerms / rrfFuse as composable scalars, so a pure-SQL pipeline
      // (postings GROUP BY + these) reproduces the Scala verbs' scores
      // bit-for-bit. Same Lucene plus-one idf / Okapi tf normalization /
      // 1/(k0+rank) terms as the DataFrame implementations.
      """CREATE OR REPLACE TEMPORARY FUNCTION bm25_score(
        |    tf BIGINT, df BIGINT, dl BIGINT, n_docs BIGINT, sum_dl BIGINT,
        |    k1 DOUBLE, b DOUBLE)
        |RETURNS DOUBLE RETURN
        |  ln(1.0d + (n_docs - df + 0.5d) / (df + 0.5d)) *
        |  (CAST(tf * (k1 + 1) AS DOUBLE) /
        |   (tf + k1 * (1.0d - b + b * dl /
        |     (CAST(sum_dl AS DOUBLE) / n_docs))))""".stripMargin,
      """CREATE OR REPLACE TEMPORARY FUNCTION tfidf_score(
        |    tf BIGINT, df BIGINT, n_docs BIGINT)
        |RETURNS DOUBLE RETURN
        |  CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / df)""".stripMargin,
      """CREATE OR REPLACE TEMPORARY FUNCTION rrf_term(rank BIGINT, k0 INT)
        |RETURNS DOUBLE RETURN 1.0d / (k0 + rank)""".stripMargin,
      // round-9 kernels: the portable count-min bucket, the
      // Efraimidis-Spirakis sampling priority, and a fixed-width Morton
      // key — each the same expression tree as its Scala twin
      // (Sketch.countMin / Scale.weightedSampleBy / Scale.zorderValue)
      """CREATE OR REPLACE TEMPORARY FUNCTION cm_bucket(
        |    d INT, k STRING, width INT)
        |RETURNS BIGINT RETURN
        |  pmod(CAST(conv(substring(md5(concat(CAST(d AS STRING), '|', k)),
        |    1, 15), 16, 10) AS BIGINT), width)""".stripMargin,
      """CREATE OR REPLACE TEMPORARY FUNCTION es_priority(
        |    id STRING, w DOUBLE, seed STRING)
        |RETURNS DOUBLE RETURN
        |  ln((CAST(conv(substring(md5(concat(id, '|', seed)), 1, 15),
        |        16, 10) AS BIGINT) + 1L)
        |     / 1152921504606846976.0d) / w""".stripMargin,
      // the Gopher-style quality score and the stopword-argmax language id
      // as pure-SQL macros — the same checks/cascade as TextFns
      // .qualityScore / .langId (and their DuckDB oracles), so a SQL-only
      // pipeline can quality-gate and route by language
      // the `length(s) = 0 OR` guards mirror TextFns.ratioFrom, which
      // scores a zero-char text's ratios as 0.0 (so the <= checks PASS):
      // without them Spark's non-ANSI x/0 yields NULL and the checks
      // would silently score 0 — empty text must be 0.6 on both paths
      """CREATE OR REPLACE TEMPORARY FUNCTION quality_score(s STRING)
        |RETURNS DOUBLE RETURN (
        |  (CASE WHEN size(split(trim(lower(s)), '\\s+')) BETWEEN 10 AND 100000
        |        THEN 1.0d ELSE 0.0d END) +
        |  (CASE WHEN length(regexp_replace(trim(s), '\\s+', ''))
        |          / CAST(size(split(trim(lower(s)), '\\s+')) AS DOUBLE)
        |          BETWEEN 2.0d AND 12.0d THEN 1.0d ELSE 0.0d END) +
        |  (CASE WHEN length(s) = 0 OR
        |          length(regexp_replace(s, '[^.,!?;:]', '')) * 1.0d
        |          / length(s) <= 0.2d THEN 1.0d ELSE 0.0d END) +
        |  (CASE WHEN length(s) = 0 OR
        |          length(regexp_replace(s, '[^0-9]', '')) * 1.0d
        |          / length(s) <= 0.2d THEN 1.0d ELSE 0.0d END) +
        |  (CASE WHEN length(s) = 0 OR
        |          length(regexp_replace(s, '[^A-Z]', '')) * 1.0d
        |          / length(s) <= 0.3d THEN 1.0d ELSE 0.0d END)) / 5""".stripMargin,
      {
        // macro bodies must be single expressions (no CTEs): generate the
        // per-language stopword-hit terms inline, same cascade as
        // TextFns.langId (tie -> larger code, zero hits -> 'und').
        // TextFns.langId's greatest(struct(score, lang)) breaks max-score
        // ties to the LEXICOGRAPHICALLY LARGER code, so the cascade must
        // check in descending code order: fr > es > en > de
        def hits(ws: Seq[String]) =
          s"size(filter(split(trim(lower(s)), '\\\\s+'), " +
            s"x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
        val en = hits(Seq("the", "and", "of", "to", "is"))
        val de = hits(Seq("der", "und", "die", "das", "ist"))
        val fr = hits(Seq("le", "la", "et", "les", "est"))
        val es = hits(Seq("el", "de", "la", "que", "es"))
        s"""CREATE OR REPLACE TEMPORARY FUNCTION lang_id(s STRING)
           |RETURNS STRING RETURN
           |  CASE WHEN greatest($en, $de, $fr, $es) = 0 THEN 'und'
           |       WHEN $fr = greatest($en, $de, $fr, $es) THEN 'fr'
           |       WHEN $es = greatest($en, $de, $es) THEN 'es'
           |       WHEN $en = greatest($en, $de) THEN 'en'
           |       ELSE 'de' END""".stripMargin
      },
      s"""CREATE OR REPLACE TEMPORARY FUNCTION zorder16(x BIGINT, y BIGINT)
         |RETURNS BIGINT RETURN ${
           (0 until 16).flatMap(j => Seq(
             s"shiftleft(shiftright(x, $j) & 1, ${2 * j})",
             s"shiftleft(shiftright(y, $j) & 1, ${2 * j + 1})"))
             .mkString(" | ")}""".stripMargin,
      // round-10: read the sketch summaries back in pure SQL.
      // cm_estimate probes a count_min_agg counter array: min over the
      // depth rows of the key's bucket counter — the same portable-md5
      // bucket as cm_bucket/Sketch.countMin, inlined (macro bodies are
      // single expressions and must not depend on other temp functions)
      """CREATE OR REPLACE TEMPORARY FUNCTION cm_estimate(
        |    counters ARRAY<BIGINT>, k STRING, width INT, depth INT)
        |RETURNS BIGINT RETURN
        |  array_min(transform(sequence(0, depth - 1),
        |    d -> counters[d * width +
        |      CAST(pmod(CAST(conv(substring(md5(concat(CAST(d AS STRING),
        |        '|', k)), 1, 15), 16, 10) AS BIGINT), width) AS INT)]))""".stripMargin,
      // qsketch_estimate reads a weighted-point quantile sketch (rows of
      // Sketch.quantileSketchByGroup collected as array<struct<v, w>>):
      // the type-1 weighted quantile at bp basis points — smallest v whose
      // cumulative weight reaches the INTEGER rank target
      // (bp*W + 9999) div 10000, exactly Sketch.quantileEstimate's
      // arithmetic. The total weight W is re-folded per element (no let
      // bindings in a single-expression macro) — fine for sketch-sized
      // arrays, which are bounded by k*levels points by construction.
      """CREATE OR REPLACE TEMPORARY FUNCTION qsketch_estimate(
        |    pts ARRAY<STRUCT<v: DOUBLE, w: BIGINT>>, bp INT)
        |RETURNS DOUBLE RETURN
        |  aggregate(array_sort(pts),
        |    named_struct('cw', CAST(0 AS BIGINT), 'est', CAST(NULL AS DOUBLE)),
        |    (acc, p) -> IF(acc.est IS NOT NULL, acc,
        |      IF(acc.cw + p.w >=
        |           (bp * aggregate(pts, CAST(0 AS BIGINT), (a, x) -> a + x.w)
        |             + 9999L) div 10000L,
        |        named_struct('cw', acc.cw + p.w, 'est', p.v),
        |        named_struct('cw', acc.cw + p.w, 'est', CAST(NULL AS DOUBLE)))),
        |    acc -> acc.est)""".stripMargin)
    defs.foreach(spark.sql(_))
  }
}

/** `spark.sql.extensions=graft.sql.GraftExtensions` — injects the functions
  * at session build time, the way a cluster deployment ships them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
