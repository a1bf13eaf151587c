package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFns

/** Deduplication for large-scale corpus pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup. Everything is
  * expressed as joins/aggregations over exploded keys — the standard
  * shuffle-bounded formulation that scales horizontally; nothing collects to
  * the driver.
  *
  * Caching note: pair generators cache small per-call intermediates (the
  * shingle / signature / chunk tables) because each feeds multiple
  * consumers within the call. The results are lazy, so the caches cannot be
  * dropped inside the call — instead every intermediate is registered, and
  * [[unpersistIntermediates]] releases them all once results have been
  * materialized (written / counted / collected). Long-lived sessions
  * composing many dedup calls should call it between pipelines; sweep-style
  * callers (threshold / band-row grids) should persist signatures once and
  * re-band via `lshPairsFromSignatures`.
  */
object Dedup {

  // -- intermediate-cache registry -------------------------------------------
  // Every .cache() below is RECOMPUTABLE (plain cached lineage, never a
  // checkpoint), so releasing one mid-use costs recompute time, never
  // correctness. connectedComponents' final label checkpoint is the one
  // non-recomputable block; its release thunk is registered too, so call
  // unpersistIntermediates() only AFTER consuming (materializing) results.
  private val liveIntermediates =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  private def scopedCache(df: DataFrame): DataFrame = {
    val c = df.cache()
    liveIntermediates.add(() => { c.unpersist(false); () })
    c
  }

  /** Cache `df` and register it for [[unpersistIntermediates]] — for
    * pipeline-level intermediates composed AROUND the dedup calls (e.g. a
    * quality-filtered corpus feeding both pair generation and the canonical
    * anti-join), so one hook releases the whole pipeline's pinned blocks.
    */
  def trackCache(df: DataFrame): DataFrame = scopedCache(df)

  /** Register an arbitrary release thunk with [[unpersistIntermediates]] —
    * for pinned state that is not a simple Dataset cache (e.g. the final
    * localCheckpoint blocks of an iterative verb). Same caveat as
    * checkpointed labels: release only after results are consumed.
    */
  private[graft] def trackRelease(f: () => Unit): Unit =
    liveIntermediates.add(f)

  /** Release every intermediate block pinned by dedup calls so far (shingle /
    * signature / chunk caches and connected-component label checkpoints).
    * Call after the pipeline's results are materialized; results not yet
    * consumed would otherwise recompute (caches) or fail (checkpoints).
    */
  def unpersistIntermediates(): Unit = {
    var f = liveIntermediates.poll()
    while (f != null) { f(); f = liveIntermediates.poll() }
  }

  /** See [[graft.ops.Scale.spread]] — parallelism guard for the CPU-heavy
    * shingling/hashing passes below.
    */
  private[ml] def spread(df: DataFrame): DataFrame = graft.ops.Scale.spread(df)

  /** Drop rows whose bucket (the `keys` tuple) holds more than `maxBucket`
    * rows — the guard against one degenerate bucket emitting bucket²
    * candidate rows in the banded self-joins below. Shape: a tiny
    * count-aggregate probe (map-side combinable — only per-bucket partial
    * counts shuffle, never data rows) feeding a broadcast anti-join. Hot
    * buckets are few by construction, so the broadcast is bytes-sized.
    * The probe and the downstream join consumers prune different columns,
    * so they can never share one exchange (ReuseExchange only fires on
    * identical canonical subtrees — verified that the pruned probe defeats
    * it): callers whose `df` is expensive to recompute must pin it
    * (scopedCache) first or the subtree recomputes once per consumer.
    * Set maxBucket <= 0 to disable.
    */
  private[graft] def dropHotBuckets(df: DataFrame, keys: Seq[String],
                                    maxBucket: Int): DataFrame =
    if (maxBucket <= 0) df
    else {
      val hot = df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
        .select(keys.head, keys.tail: _*)
      df.join(broadcast(hot), keys, "left_anti")
    }

  /** Exact dedup on a canonicalized text hash: one hash-aggregate.
    * Output: one row per distinct content (hash, kept id = min id, dupe count).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(TextFns.fingerprint(col(textCol)).as("h"), col(idCol))
      .groupBy("h")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** doc → exploded distinct shingle rows, the base relation for set-overlap
    * dedup. `maxDf` drops shingles appearing in more than that many docs
    * (stop-shingles): they contribute little discrimination but quadratic
    * join blowup — the standard skew guard for content-key self-joins.
    */
  private def shingleTable(df: DataFrame, idCol: String, textCol: String,
                           n: Int, maxDf: Int): DataFrame = {
    // join on the 64-bit shingle hash, not the string: same partitioning
    // semantics, ~4x smaller shuffle payload and cheaper equi-compare
    // (collision odds across ~1e9 distinct shingles are ~1e-1 per *corpus*
    // for one pair, and a collision merely perturbs one overlap count).
    // shingleHashes never materializes the shingle strings at all.
    val sh = spread(df).select(col(idCol).as("id"),
        explode(TextFns.shingleHashes(col(textCol), n)).as("g"))
    if (maxDf <= 0) sh
    else {
      // one windowed count over g — a single shuffle that the downstream
      // self-join (also keyed on g) reuses, instead of a second full
      // shingle pass + aggregate + anti-join for the stop-shingle probe
      val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      sh.withColumn("__df", count(lit(1)).over(w))
        .filter(col("__df") <= maxDf).drop("__df")
    }
  }

  /** N-gram Jaccard similarity pairs (id_a < id_b, jaccard >= threshold).
    * Self-join on shingle → common counts; set sizes joined back. `maxDf`
    * (default 1000) drops stop-shingles before the self-join — without it
    * one shingle in d docs emits d² candidate rows. With maxDf > 0 the
    * jaccard is computed over the FILTERED shingle sets (numerator and
    * denominators consistently), a principled stop-word approximation; pass
    * maxDf <= 0 for exact brute-force Jaccard — the ground truth MinHash is
    * graded against in PipelineSpec.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.8,
                        maxDf: Int = 1000): DataFrame = {
    val sh = scopedCache(shingleTable(df, idCol, textCol, n, maxDf))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = sh.as("a").join(sh.as("b"), Seq("g"))
      .where(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "sz" -> "sz_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "sz" -> "sz_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** N-gram CONTAINMENT pairs — Broder's asymmetric resemblance ("On the
    * resemblance and containment of documents", SEQUENCES 1997):
    * containment(a ⊆ b) = |A ∩ B| / |A| over the maxDf-guarded shingle
    * sets. Finds documents largely CONTAINED in another — quotes,
    * boilerplate-wrapped copies, page-inside-mirror — which symmetric
    * Jaccard structurally misses when |B| ≫ |A| (jaccard → 0 while
    * containment → 1; PipelineSpec pins planted quotes found here and
    * invisible to [[ngramJaccardPairs]] at the same threshold). Output is
    * DIRECTIONAL: (id, container_id, containment ≥ threshold), id ≠
    * container_id; a near-exact duplicate pair legitimately emits both
    * directions.
    *
    * Scale shape: identical to [[ngramJaccardPairs]] — one shingle-hash
    * self-join (the same maxDf stop-shingle guard bounds the quadratic
    * term) + one size join back; only the post-aggregation filter
    * differs, so the candidate-volume growth gates cover it unchanged.
    */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, threshold: Double = 0.8,
                            maxDf: Int = 1000): DataFrame = {
    val sh = scopedCache(shingleTable(df, idCol, textCol, n, maxDf))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = sh.as("a").join(sh.as("b"), Seq("g"))
      .where(col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id"), col("b.id").as("container_id"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("sz", "sz_a"), "id")
      .withColumn("containment", col("common").cast("double") / col("sz_a"))
      .filter(col("containment") >= threshold)
      .select("id", "container_id", "containment")
  }

  /** Prefix-filtered exact Jaccard pairs — same output contract as
    * [[ngramJaccardPairs]] (id_a < id_b, jaccard >= threshold over the
    * maxDf-guarded shingle sets; FuzzySpec pins row-for-row equality), but
    * the candidate generation is the positional prefix filter of
    * Chaudhuri, Ganti & Kaushik ("A primitive operator for similarity
    * joins", ICDE 2006) as used by PPJoin (Xiao, Wang, Lin & Yu, WWW
    * 2008): order every set's shingles by global (df asc, shingle) and
    * index only the first |s| − ⌈t·|s|⌉ + 1 — if two sets meet threshold
    * t they MUST share an indexed prefix shingle, so the self-join runs
    * over the (1−t)-fraction prefix table instead of the full inverted
    * index, and a size filter (t·|a| ≤ |b| ≤ |a|/t) prunes candidates
    * before verification touches full sets.
    *
    * Scale shape: at t=0.8 the prefix index is ~20% of the shingle table,
    * so the quadratic term (same-shingle candidate pairs) shrinks ~25×;
    * verification is an equi-join of the (small) candidate pair set
    * against the full shingle table — linear in candidates, never
    * all-pairs. The ceil guards subtract 1e-6 before ⌈·⌉: float error can
    * then only ENLARGE a prefix or ADMIT a boundary candidate — soundness
    * (no missed pair) is never at the mercy of double rounding.
    */
  def ngramJaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
                              n: Int = 3, threshold: Double = 0.8,
                              maxDf: Int = 1000): DataFrame = {
    val (sh, sizes, pref) =
      jaccardPrefixParts(df, idCol, textCol, n, threshold, maxDf)
    val cand = pref.as("a").join(pref.as("b"), Seq("g"))
      .where(col("a.id") < col("b.id") &&
        col("b.sz") >= lit(threshold) * col("a.sz") - 1e-6 &&
        col("a.sz") >= lit(threshold) * col("b.sz") - 1e-6)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val common = cand
      .join(sh.select(col("id").as("id_a"), col("g")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("g")), Seq("id_b", "g"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "sz" -> "sz_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "sz" -> "sz_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** [[ngramJaccardPairsPrefix]]'s building blocks, extracted so the
    * candidate-volume gate reads the SAME prefix relation the join keys
    * on: (sh — the df-guarded (id, g) shingle table; sizes — per-id
    * shingle counts; pref — the PPJoin prefix index (id, g, sz)).
    */
  private[graft] def jaccardPrefixParts(df: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double,
      maxDf: Int): (DataFrame, DataFrame, DataFrame) = {
    require(threshold > 0.0 && threshold <= 1.0,
      "threshold must be in (0, 1]")
    // build the shingle table locally KEEPING the per-shingle df that the
    // maxDf guard already computes in its window pass — the prefix order
    // needs exactly that count, so reusing it saves a second full
    // aggregate + join over the shingle table
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val shDf = scopedCache(spread(df)
      .select(col(idCol).as("id"),
        explode(graft.text.TextFns.shingleHashes(col(textCol), n)).as("g"))
      .withColumn("__df", count(lit(1)).over(w))
      .filter(if (maxDf > 0) col("__df") <= maxDf else lit(true)))
    val sh = shDf.select("id", "g")
    val sizes = scopedCache(sh.groupBy("id").agg(count(lit(1)).as("sz")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("__df"), col("g"))
    val pref = shDf
      .withColumn("__rn", row_number().over(win))
      .join(sizes, "id")
      .where(col("__rn") <=
        col("sz") - ceil(lit(threshold) * col("sz") - 1e-6) + 1)
      .select(col("id"), col("g"), col("sz"))
    (sh, sizes, pref)
  }

  /** The FULL inverted-index join's candidate volume — Σ per (df-guarded)
    * shingle of C(df, 2), the same-shingle comparisons
    * [[ngramJaccardPairs]]' self-join performs. The baseline
    * [[jaccardPrefixCandidateVolume]] is graded against: PPJoin's claim is
    * a large shrink of exactly this term. One row: (n_candidates).
    */
  private[graft] def jaccardInvertedCandidateVolume(df: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      maxDf: Int = 1000): DataFrame =
    shingleTable(df, idCol, textCol, n, maxDf)
      .groupBy("g").agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") * (col("__n") - 1) / 2), lit(0L))
        .cast("long").as("n_candidates"))

  /** The PPJoin prefix join's candidate volume — Σ per prefix shingle of
    * C(occurrences, 2), the same-shingle comparisons the candidate join
    * performs before the size filter (an upper bound on surviving
    * candidates; graded RELATIVE to [[jaccardInvertedCandidateVolume]] in
    * the ScalingSpec gate — see [[lshCandidateVolume]]). One row:
    * (n_candidates).
    */
  private[graft] def jaccardPrefixCandidateVolume(df: DataFrame,
      idCol: String, textCol: String, n: Int = 3, threshold: Double = 0.8,
      maxDf: Int = 1000): DataFrame = {
    val (_, _, pref) =
      jaccardPrefixParts(df, idCol, textCol, n, threshold, maxDf)
    pref.groupBy("g").agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") * (col("__n") - 1) / 2), lit(0L))
        .cast("long").as("n_candidates"))
  }

  /** Benchmark-contamination report: for each training doc, how many of its
    * distinct word n-grams also occur anywhere in the benchmark corpus — the
    * standard n-gram decontamination check for pretraining data (e.g. the
    * 13-gram overlap rule). Output: one row per CONTAMINATED training doc
    * (id, n_grams, n_contaminated, contaminated_frac); clean docs are absent
    * (join semantics — nothing to report and no reason to shuffle them).
    *
    * Scale shape: the benchmark side collapses to DISTINCT grams — benchmark
    * suites are tiny next to a 100 TB corpus, so AQE broadcasts that side and
    * the training grams stream past it map-side; the only full shuffle is the
    * per-doc count aggregate. `hashed=true` (default) joins on 64-bit
    * ShingleHash values — no gram string is ever materialized or shuffled;
    * `hashed=false` uses the literal n-gram strings (the oracle-transparent
    * form; equality classes agree modulo 64-bit collisions, which the
    * ShingleHash differential tests pin).
    */
  /** Distinct benchmark grams in the form [[contaminationReport]] joins on —
    * precompute + cache this when scrubbing many corpora (or micro-batches)
    * against one benchmark set. */
  def benchmarkGrams(bench: DataFrame, benchText: String,
                     n: Int = 13, hashed: Boolean = true): DataFrame = {
    def grams(c: Column): Column =
      if (hashed) TextFns.shingleHashes(c, n) else TextFns.wordShingles(c, n)
    spread(bench).select(explode(grams(col(benchText))).as("g")).distinct()
  }

  def contaminationReport(train: DataFrame, trainId: String, trainText: String,
                          bench: DataFrame, benchText: String,
                          n: Int = 13, hashed: Boolean = true): DataFrame =
    contaminationReportAgainst(train, trainId, trainText,
      benchmarkGrams(bench, benchText, n, hashed), n, hashed)

  /** [[contaminationReport]] against a precomputed [[benchmarkGrams]] set. */
  def contaminationReportAgainst(train: DataFrame, trainId: String,
                                 trainText: String, benchGrams: DataFrame,
                                 n: Int = 13, hashed: Boolean = true): DataFrame = {
    def grams(c: Column): Column =
      if (hashed) TextFns.shingleHashes(c, n) else TextFns.wordShingles(c, n)
    val tg = spread(train)
      .select(col(trainId).as("id"), grams(col(trainText)).as("gs"))
      .select(col("id"), size(col("gs")).cast("long").as("n_grams"),
              explode(col("gs")).as("g"))
    tg.join(benchGrams, "g")
      .groupBy("id", "n_grams")
      .agg(count(lit(1)).as("n_contaminated"))
      .withColumn("contaminated_frac",
        round(col("n_contaminated").cast("double") / col("n_grams"), 4))
      .select(col("id").as(trainId), col("n_grams"), col("n_contaminated"),
              col("contaminated_frac"))
  }

  /** Drop training docs whose benchmark n-gram overlap exceeds
    * `maxContaminatedFrac` (default 0.0: any shared n-gram drops the doc).
    * One anti-join against the (small) contaminated-id set; all other
    * training rows pass through untouched — columns preserved.
    */
  def decontaminate(train: DataFrame, trainId: String, trainText: String,
                    bench: DataFrame, benchText: String,
                    n: Int = 13, maxContaminatedFrac: Double = 0.0,
                    hashed: Boolean = true): DataFrame =
    decontaminateAgainst(train, trainId, trainText,
      benchmarkGrams(bench, benchText, n, hashed), n, maxContaminatedFrac,
      hashed)

  /** [[decontaminate]] against a precomputed [[benchmarkGrams]] set — the
    * form streaming scrub-on-ingest reuses per micro-batch. */
  def decontaminateAgainst(train: DataFrame, trainId: String, trainText: String,
                           benchGrams: DataFrame, n: Int = 13,
                           maxContaminatedFrac: Double = 0.0,
                           hashed: Boolean = true): DataFrame = {
    val bad = contaminationReportAgainst(train, trainId, trainText, benchGrams,
        n, hashed)
      .filter(col("contaminated_frac") > maxContaminatedFrac)
      .select(col(trainId))
    train.join(bad, Seq(trainId), "left_anti")
  }

  /** Bloom-prefiltered decontamination, for the regime where even the
    * DISTINCT benchmark gram table is too big to broadcast-join every
    * training gram against comfortably: build Spark's own
    * `BloomFilterAggregate` sketch over the benchmark gram hashes (a few MB
    * for millions of grams), embed it as a literal in the plan, and probe
    * it MAP-SIDE so only the tiny fraction of training grams that MIGHT
    * match ever reaches the exact join. Bloom filters have no false
    * negatives and the exact join rejects the false positives, so results
    * are IDENTICAL to [[decontaminateAgainst]] — tested equal.
    *
    * Requires the hashed gram form (the sketch ingests 64-bit hashes).
    * Sizing: `bitsPerItem`=16 → fpp ≈ 5e-4; Spark clamps at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 8 MB) —
    * raise that conf for benchmark sets beyond ~4M distinct grams.
    */
  def contaminationReportBloomAgainst(train: DataFrame, trainId: String,
                                      trainText: String, benchGrams0: DataFrame,
                                      n: Int = 13,
                                      bitsPerItem: Int = 16): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val shim = org.apache.spark.sql.graftshim.Shim
    val benchGrams = scopedCache(benchGrams0)
    val items = math.max(benchGrams.count(), 1L)
    val bloomBytes = benchGrams.agg(shim.columnOf(
        new BloomFilterAggregate(shim.exprOf(col("g")),
          Literal(items), Literal(items * bitsPerItem))
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val mightContain = shim.columnOf(BloomFilterMightContain(
      Literal(bloomBytes), shim.exprOf(col("g"))))
    val tg = spread(train)
      .select(col(trainId).as("id"),
        TextFns.shingleHashes(col(trainText), n).as("gs"))
      .select(col("id"), size(col("gs")).cast("long").as("n_grams"),
              explode(col("gs")).as("g"))
      .filter(mightContain)
    tg.join(benchGrams, "g")
      .groupBy("id", "n_grams")
      .agg(count(lit(1)).as("n_contaminated"))
      .withColumn("contaminated_frac",
        round(col("n_contaminated").cast("double") / col("n_grams"), 4))
      .select(col("id").as(trainId), col("n_grams"), col("n_contaminated"),
              col("contaminated_frac"))
  }

  /** Build and FREEZE the decontamination artifact — the serving form of
    * [[decontaminateBloom]] (the buildMinhashIndex / buildTokenizer
    * lifecycle applied to benchmark scrubbing): the benchmark's distinct
    * hashed grams are written once to `<path>/grams` and the Bloom
    * sketch over them (bytes + geometry) to `<path>/meta`, so serving
    * never re-aggregates the benchmark — [[decontaminateFromIndex]] is a
    * driver read of the sketch + the same map-side probe + exact join.
    * A streaming admission that called [[decontaminateBloom]] per
    * micro-batch paid one benchmark count + one Bloom aggregate + one
    * gram re-derivation EVERY batch; against the artifact that cost is
    * paid once at build time.
    */
  def buildDecontamIndex(spark: org.apache.spark.sql.SparkSession,
                         bench: DataFrame, benchText: String, path: String,
                         n: Int = 13, bitsPerItem: Int = 16): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val shim = org.apache.spark.sql.graftshim.Shim
    val grams = scopedCache(benchmarkGrams(bench, benchText, n, hashed = true))
    val items = math.max(grams.count(), 1L)
    val bloomBytes = grams.agg(shim.columnOf(
        new BloomFilterAggregate(shim.exprOf(col("g")),
          Literal(items), Literal(items * bitsPerItem))
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // grams live as slice_seq= partitions (the minhash batch_seq
    // discipline): the build is slice 0, every append lands its OWN new
    // partition — O(new slice) write, standing slices never rewritten
    grams.withColumn("slice_seq", lit(0L))
      .write.partitionBy("slice_seq").mode("overwrite")
      .parquet(s"$path/grams")
    spark.range(1).select(lit(n).as("n"),
        lit(bitsPerItem).as("bits_per_item"), lit(items).as("items"),
        lit(bloomBytes).as("bloom"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** APPEND a new benchmark slice to a persisted [[buildDecontamIndex]]
    * artifact — benchmark suites GROW, and rebuilding from scratch
    * re-derives every slice's grams from text. The append pays the
    * text-scan cost only for the NEW slice, and (since round 17) the
    * WRITE cost only for the new slice too: grams live as `slice_seq=`
    * partitions (the minhash `batch_seq` discipline), the new slice's
    * grams are anti-joined against the standing table (keeping it
    * globally DISTINCT — probes count per-gram matches) and land as ONE
    * new partition via staging + atomic rename; standing slices are
    * never rewritten. The Bloom is rebuilt over the slim standing+fresh
    * union scan (a sketch sized for k items cannot absorb more; the
    * gram width `n` rides the meta, so an appended slice can never gram
    * differently than the build did). Commit order is META first, then
    * the grams partition: a crash between the two leaves an index whose
    * exact-join behavior is exactly PRE-append (the oversized sketch
    * only prefilters — no false negatives are possible), and re-running
    * the same append completes it idempotently (the anti-join re-derives
    * the same fresh set; an already-landed slice re-appends as a no-op).
    * Probe output after the append is identical to an index built on
    * the union from scratch (PipelineSpec pins it; q_decontam_append
    * shares q_decontaminate's oracle VERBATIM). Pre-r17 flat gram
    * tables self-upgrade to the partitioned layout on first append
    * (one-time O(standing) staged rewrite — README migration note).
    */
  def appendToDecontamIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String, bench: DataFrame,
                            benchText: String): Unit =
    // single-writer, machine-enforced: concurrent appends would compute
    // the same nextSeq and silently replace each other's slice partition
    // (see appendToWinnowIndex); the lease heartbeats for the duration
    graft.ops.Lease.withLease(spark, path, "appendToDecontamIndex") {
      appendToDecontamIndexLocked(spark, path, bench, benchText)
    }

  /** The decontam index meta row with its EXPLICIT schema (same
    * rationale as [[readWinnowMeta]]: no per-open schema-inference job).
    * All decontam metas carry all four fields. */
  private def readDecontamMeta(spark: org.apache.spark.sql.SparkSession,
                               path: String): org.apache.spark.sql.Row = {
    import org.apache.spark.sql.types._
    spark.read.schema(StructType(Seq(
        StructField("n", IntegerType),
        StructField("bits_per_item", IntegerType),
        StructField("items", LongType),
        StructField("bloom", BinaryType))))
      .parquet(s"$path/meta").head()
  }

  private def appendToDecontamIndexLocked(
      spark: org.apache.spark.sql.SparkSession,
      path: String, bench: DataFrame,
      benchText: String): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.hadoop.fs.Path
    val shim = org.apache.spark.sql.graftshim.Shim
    graft.ops.CarryState.recoverDir(spark, s"$path/meta")
    graft.ops.CarryState.recoverDir(spark, s"$path/grams")
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$path/grams_staging"), true)
    val m = readDecontamMeta(spark, path)
    val (n, bits) = (m.getAs[Int]("n"), m.getAs[Int]("bits_per_item"))
    val standing0 = spark.read.parquet(s"$path/grams")
    val standing = if (!standing0.columns.contains("slice_seq")) {
      // legacy flat layout: one-time upgrade so this and every future
      // append writes only its own partition
      graft.ops.CarryState.replaceDir(spark, s"$path/grams") { staging =>
        standing0.withColumn("slice_seq", lit(0L))
          .write.partitionBy("slice_seq").mode("overwrite").parquet(staging)
      }
      spark.read.parquet(s"$path/grams")
    } else standing0
    // next slice number from DIRECTORY LISTING (the winnow/minhash
    // listedMaxSeq discipline) — the old agg(max(slice_seq)) ran a full
    // scan of the standing gram table per append just to pick a number
    val nextSeq = listedMaxSeq(spark, s"$path/grams", "slice_seq=")
      .getOrElse(0L) + 1
    // only grams the standing table does not already hold — the global
    // DISTINCT invariant across slices. localCheckpoint, NOT cache: a
    // replayed append's identical plan would cache-hit the FIRST
    // append's pinned anti-join over the pre-append gram table and
    // re-land its rows as duplicates (see appendToWinnowIndex). The
    // fresh slice is small (one benchmark slice); the STANDING table is
    // never checkpointed — the old union checkpoint pushed the whole
    // gram table through the block manager on every append.
    val fresh = benchmarkGrams(bench, benchText, n, hashed = true)
      .join(standing.select("g"), Seq("g"), "left_anti")
      .localCheckpoint(true)
    val nFresh = fresh.count()
    // standing count = the meta's recorded items (slices are globally
    // distinct and disjoint, so the union count is their sum) — this
    // replaces the union-scan count job. (A 0-gram build records the
    // max(·,1)=1 sentinel, but such an index has no readable gram files
    // and cannot reach an append.)
    val items = math.max(m.getAs[Long]("items") + nFresh, 1L)
    val bloomBytes = standing.select("g").unionByName(fresh)
      .agg(shim.columnOf(
        new BloomFilterAggregate(shim.exprOf(col("g")),
          Literal(items), Literal(items * bits))
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // META first: a crash before the grams partition lands leaves the
    // oversized-sketch pre-append behavior; the rerun completes it
    graft.ops.CarryState.replaceDir(spark, s"$path/meta") { staging =>
      spark.range(1).select(lit(n).as("n"),
          lit(bits).as("bits_per_item"), lit(items).as("items"),
          lit(bloomBytes).as("bloom"))
        .write.mode("overwrite").parquet(staging)
    }
    if (nFresh > 0) {
      // the new slice's partition, atomic via staging + ONE rename
      val staging = new Path(s"$path/grams_staging/slice_$nextSeq")
      fresh.write.mode("overwrite").parquet(staging.toString)
      val dest = new Path(s"$path/grams/slice_seq=$nextSeq")
      fs.delete(dest, true)
      require(fs.rename(staging, dest),
        s"decontam gram-slice promote failed: $dest")
      fs.delete(new Path(s"$path/grams_staging"), true)
    }
  }

  /** [[contaminationReportBloomAgainst]] probing a persisted
    * [[buildDecontamIndex]] artifact: the frozen sketch rides into the
    * plan as a literal (one driver read), the exact join runs against
    * the frozen gram table — output identical to the inline Bloom path
    * over the same benchmark (q_decontam_pers shares q_decontaminate's
    * oracle VERBATIM). */
  def contaminationReportFromIndex(spark: org.apache.spark.sql.SparkSession,
                                   path: String, train: DataFrame,
                                   trainId: String,
                                   trainText: String): DataFrame = {
    // refuse loudly while a maintenance writer (slice append) is staging
    // a meta swap this probe could read half-replaced
    graft.ops.Lease.check(spark, path, "contaminationReportFromIndex")
    graft.ops.CarryState.recoverDir(spark, s"$path/meta")
    graft.ops.CarryState.recoverDir(spark, s"$path/grams")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val shim = org.apache.spark.sql.graftshim.Shim
    val m = readDecontamMeta(spark, path)
    val n = m.getAs[Int]("n")
    val mightContain = shim.columnOf(BloomFilterMightContain(
      Literal(m.getAs[Array[Byte]]("bloom")), shim.exprOf(col("g"))))
    val tg = spread(train)
      .select(col(trainId).as("id"),
        TextFns.shingleHashes(col(trainText), n).as("gs"))
      .select(col("id"), size(col("gs")).cast("long").as("n_grams"),
              explode(col("gs")).as("g"))
      .filter(mightContain)
    tg.join(spark.read.parquet(s"$path/grams"), "g")
      .groupBy("id", "n_grams")
      .agg(count(lit(1)).as("n_contaminated"))
      .withColumn("contaminated_frac",
        round(col("n_contaminated").cast("double") / col("n_grams"), 4))
      .select(col("id").as(trainId), col("n_grams"), col("n_contaminated"),
              col("contaminated_frac"))
  }

  /** [[decontaminateBloom]] against the persisted artifact — the
    * admission step a streaming ingest should run per micro-batch. */
  def decontaminateFromIndex(spark: org.apache.spark.sql.SparkSession,
                             path: String, train: DataFrame,
                             trainId: String, trainText: String,
                             maxContaminatedFrac: Double = 0.0): DataFrame = {
    val bad = contaminationReportFromIndex(spark, path, train, trainId,
        trainText)
      .filter(col("contaminated_frac") > maxContaminatedFrac)
      .select(col(trainId))
    train.join(bad, Seq(trainId), "left_anti")
  }

  /** [[decontaminateAgainst]] with the Bloom prefilter — identical output,
    * map-side prefilter shape (see [[contaminationReportBloomAgainst]]). */
  def decontaminateBloom(train: DataFrame, trainId: String, trainText: String,
                         bench: DataFrame, benchText: String, n: Int = 13,
                         maxContaminatedFrac: Double = 0.0,
                         bitsPerItem: Int = 16): DataFrame = {
    val bad = contaminationReportBloomAgainst(train, trainId, trainText,
        benchmarkGrams(bench, benchText, n, hashed = true), n, bitsPerItem)
      .filter(col("contaminated_frac") > maxContaminatedFrac)
      .select(col(trainId))
    train.join(bad, Seq(trainId), "left_anti")
  }

  /** MinHash signatures via the custom single-buffer Catalyst aggregate
    * (graft.plans.MinHashAgg): one tight-loop pass over the shingle table,
    * map-side combinable, shuffling one k-long signature per doc partition.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, k: Int = 32, seed: Long = 42L,
                        hashLeaf: Option[Column] = None): DataFrame = {
    // hashLeaf overrides the shingle-hash array (e.g.
    // TextFns.shingleHashesPortable for engine-portable signatures); the
    // rest of the pipeline — aggregate, banding, scoring — is identical
    val sh = spread(df).select(col(idCol).as("id"),
      explode(hashLeaf.getOrElse(TextFns.shingleHashes(col(textCol), n))).as("hx"))
    val agg = org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.MinHashAgg(
        org.apache.spark.sql.graftshim.Shim.exprOf(col("hx")), k, seed)
        .toAggregateExpression())
    sh.groupBy("id").agg(agg.as("sig"))
  }

  // 2^31 - 1 (Mersenne prime): keeps a*h+b < 2^62, no int64 overflow
  // under ANSI arithmetic while leaving collision odds ~n²/2p ≈ 1e-4 at
  // a 1M-shingle partition — fine for signature mins.
  private val MinhashP = 2147483647L

  /** The k permutation coefficient pairs derived from a seed — shared by
    * every signature formulation so same-seed signatures agree exactly.
    */
  private[graft] def minhashCoeffs(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (MinhashP - 1) + 1,
                 math.abs(rnd.nextLong()) % MinhashP))
  }

  /** Reference formulation of the signature (k separate min-aggregates) —
    * kept as the differential oracle for MinHashAgg.
    */
  private[graft] def minhashSignaturesComposed(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, seed: Long = 42L): DataFrame = {
    val p = MinhashP
    val sh = spread(df).select(col(idCol).as("id"),
      explode(TextFns.shingleHashes(col(textCol), n)).as("g"))
      .withColumn("hx", pmod(col("g"), lit(p)))
    val minExprs = minhashCoeffs(k, seed).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("hx") * lit(a) + lit(b), lit(p))).as(s"m$i")
    }
    sh.groupBy("id").agg(minExprs.head, minExprs.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Per-ROW MinHash signature as a pure array expression — no explode, no
    * aggregation, so it is legal anywhere an elementwise function is
    * (streaming micro-batches, mutate chains). Same (seed → coefficients)
    * derivation as [[minhashSignaturesComposed]], so same-seed values agree
    * exactly with the aggregate formulation. Cost is k passes over the
    * row's shingle array (vs one for MinHashAgg) — the right trade when
    * the row count per batch is modest or aggregation is unavailable.
    */
  def minhashSignatureRow(text: Column, n: Int = 3, k: Int = 32,
                          seed: Long = 42L): Column = {
    val p = MinhashP
    val hx = transform(TextFns.shingleHashes(text, n), h => pmod(h, lit(p)))
    array(minhashCoeffs(k, seed).map { case (a, b) =>
      array_min(transform(hx, h => pmod(h * lit(a) + lit(b), lit(p))))
    }: _*)
  }

  /** MinHash + LSH banding: B bands of R rows (K = B*R); docs sharing any
    * band bucket become candidates; candidates are verified by exact
    * signature agreement fraction (estimates Jaccard). Candidate generation
    * is an equi-join on (band, bucketHash) — shuffle-bounded, no n² pass.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 8, rows: Int = 4,
                      threshold: Double = 0.8, seed: Long = 42L,
                      hashLeaf: Option[Column] = None,
                      maxBucket: Int = 100000): DataFrame = {
    // no signature-level cache: lshPairsFromSignatures pins the BANDED
    // table, which subsumes the signatures (caching both would pay a second
    // materialization for a single consumer)
    val sigs = minhashSignatures(df, idCol, textCol, n, bands * rows, seed, hashLeaf)
    lshPairsFromSignatures(sigs, bands, rows, threshold, maxBucket)
  }

  /** LSH banding over an existing `(id, sig)` signature table. At 100 TB the
    * signatures are the expensive pass — compute them once, persist bucketed
    * by id (Scale.writeBucketed), and re-band from storage for each threshold
    * or band/row sweep; downstream id-keyed joins (labels, docs) are then
    * exchange-free bucket-local joins.
    */
  /** The per-band bucket keys of a signature: xxhash64 of each `rows`-slice.
    * One expression shared by the pair join and [[lshCandidateVolume]] so
    * the gated volume can never drift from what the join actually keys on.
    */
  private def bandBuckets(bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))

  /** The LSH band join's CANDIDATE VOLUME — Σ over (band, bucket) of
    * C(size, 2), the exact number of (same-band) pair comparisons the
    * self-join in [[lshPairsFromSignatures]] performs after the hot-bucket
    * guard — computed from bucket SIZES (one aggregate), never by
    * enumerating pairs. This is the quantity the ScalingSpec growth gate
    * asserts stays ~linear in corpus size across SFs: a quadratic-under-
    * skew regression shows up here as superlinear growth long before it
    * shows up as a wall-clock blowup. One row: (n_candidates).
    */
  private[graft] def lshCandidateVolume(sigs: DataFrame, bands: Int = 8,
                                        rows: Int = 4,
                                        maxBucket: Int = 100000): DataFrame = {
    val banded = dropHotBuckets(
      sigs.select(col("id"), posexplode(bandBuckets(bands, rows)))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket")),
      Seq("band", "bucket"), maxBucket)
    banded.groupBy("band", "bucket").agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") * (col("__n") - 1) / 2), lit(0L))
        .cast("long").as("n_candidates"))
  }

  def lshPairsFromSignatures(sigs: DataFrame, bands: Int = 8, rows: Int = 4,
                             threshold: Double = 0.8,
                             maxBucket: Int = 100000): DataFrame = {
    val k = bands * rows
    // one cache, at the BANDED level: it feeds the hot-bucket probe and
    // both self-join sides, and subsumes the signature table (its only
    // consumer is the banding projection). Differently-pruned consumers
    // can never share an exchange, so without this pin the signature
    // aggregate would recompute once per consumer.
    val banded0 = scopedCache(sigs.select(col("id"), col("sig"),
      posexplode(bandBuckets(bands, rows)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket")))
    // hot-bucket guard: one degenerate band bucket — empty/templated docs
    // collapsing to one signature slice — emits bucket² candidate rows, the
    // quadratic failure mode at corpus scale. True near-dups in a dropped
    // bucket usually still collide in another band; the default only fires
    // on pathological skew.
    val banded = dropHotBuckets(banded0, Seq("band", "bucket"), maxBucket)
    // est_jaccard is identical for every duplicate of a pair (one per
    // colliding band), so score and filter BEFORE dropDuplicates: the
    // k-long signature arrays never enter the dedup shuffle, and only
    // above-threshold pairs do. Agreement is the codegen'd ArrayEqCount —
    // it runs once per candidate pair, the pipeline's biggest intermediate.
    val agree = org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.ArrayEqCount(
        org.apache.spark.sql.graftshim.Shim.exprOf(col("a.sig")),
        org.apache.spark.sql.graftshim.Shim.exprOf(col("b.sig"))))
    banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (agree.cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** Cross-corpus LSH banding: candidate pairs between a NEW signature
    * table and an EXISTING one only — the incremental-ingest dedup shape.
    * At scale the standing corpus's signatures are computed once and
    * persisted (see [[lshPairsFromSignatures]]' bucketed-write note); each
    * arriving batch computes only its own signatures and joins here, so
    * ingest cost is O(batch), never O(corpus). New-vs-new pairs are NOT
    * reported — run the self-join variant on the batch if you also want
    * those. Output: (new_id, existing_id, est_jaccard).
    */
  def lshPairsBetween(newSigs: DataFrame, existingSigs: DataFrame,
                      bands: Int = 8, rows: Int = 4,
                      threshold: Double = 0.8,
                      maxBucket: Int = 100000): DataFrame = {
    val k = bands * rows
    def band(df: DataFrame, side: String) = df.select(
        col("id").as(s"${side}_id"), col("sig").as(s"${side}_sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val nb = band(newSigs, "new")
    // guard the standing-corpus side only (that's where degenerate buckets
    // accumulate); the probe and the join share one exchange of eb
    val eb = dropHotBuckets(band(existingSigs, "existing"),
      Seq("band", "bucket"), maxBucket)
    val agree = org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.ArrayEqCount(
        org.apache.spark.sql.graftshim.Shim.exprOf(col("new_sig")),
        org.apache.spark.sql.graftshim.Shim.exprOf(col("existing_sig"))))
    nb.join(eb, Seq("band", "bucket"))
      .select(col("new_id"), col("existing_id"),
        (agree.cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("new_id", "existing_id")
  }

  /** Drop new docs that near-duplicate the standing corpus (estimated
    * Jaccard ≥ threshold against any existing signature) — incremental
    * ingest dedup in one call. `existingSigs` is a persisted `(id, sig)`
    * table from [[minhashSignatures]] with the SAME n/k/seed.
    */
  def dedupeAgainstCorpus(newDocs: DataFrame, idCol: String, textCol: String,
                          existingSigs: DataFrame,
                          n: Int = 3, bands: Int = 8, rows: Int = 4,
                          threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    val newSigs = minhashSignatures(newDocs, idCol, textCol, n, bands * rows, seed)
    val dup = lshPairsBetween(newSigs, existingSigs, bands, rows, threshold)
      .select(col("new_id").as(idCol)).distinct()
    newDocs.join(dup, Seq(idCol), "left_anti")
  }

  /** The signature hash leaf an index was built with: the default
    * engine leaf (None → xxhash64 shingles) or the SQL-portable md5 leaf —
    * recorded in the index meta so build and every later probe/append can
    * never hash differently.
    */
  private def indexLeaf(textCol: String, n: Int,
                        portable: Boolean): Option[Column] =
    if (portable) Some(TextFns.shingleHashesPortable(col(textCol), n))
    else None

  /** Persist a MinHash signature index as a standing artifact — the dedup
    * twin of [[graft.ml.Pq.buildIvfPqIndex]]: `<path>/sigs` holds the
    * corpus `(id, sig)` table partitioned by append batch (`batch_seq=0`
    * is the build), `<path>/meta` one self-describing row (n, bands, rows,
    * seed, portable). The corpus is shingled exactly once; every future
    * batch or stream dedups against the frozen signatures with O(batch)
    * shingle/shuffle work plus one scan of the standing signature
    * relation — k longs per doc, ~1% of corpus bytes, and the scan never
    * re-shuffles the corpus (the probe side is the small one; AQE
    * broadcasts it when it fits). Batch appends amortize the scan
    * ([[ingestDedup]], [[dedupeAgainstIndex]],
    * [[graft.streaming.StreamVerbs.streamingIngestDedup]]). Short-doc
    * semantics follow the leaf: the default engine leaf signs docs with
    * fewer than n tokens via [[TextFns.shingleHashes]]' whole-text
    * fallback (exact-duplicate short docs still dedup); the portable md5
    * leaf emits no shingles for them, so they carry no signature at all.
    */
  def buildMinhashIndex(df: DataFrame, idCol: String, textCol: String,
                        path: String, n: Int = 3, bands: Int = 8,
                        rows: Int = 4, seed: Long = 42L,
                        portable: Boolean = false,
                        bandParts: Int = 0): Unit = {
    // (batch_id, batch_fp, batch_n) are [[ingestDedup]]'s replay-evidence
    // columns; the base build is not an ingest batch, so it records the
    // no-evidence sentinel (-1, 0, -1) — matching nothing
    minhashSignatures(df, idCol, textCol, n, bands * rows, seed,
        indexLeaf(textCol, n, portable))
      .withColumn("batch_id", lit(-1L))
      .withColumn("batch_fp", lit(0L))
      .withColumn("batch_n", lit(-1L))
      .withColumn("batch_seq", lit(0L))
      .write.partitionBy("batch_seq").mode("overwrite")
      .parquet(s"$path/sigs")
    df.sparkSession.range(1)
      .select(lit(n).as("n"), lit(bands).as("bands"), lit(rows).as("rows"),
        lit(seed).as("seed"), lit(portable).as("portable"),
        lit(bandParts).as("band_parts"))
      .write.mode("overwrite").parquet(s"$path/meta")
    if (bandParts > 0) {
      val spark = df.sparkSession
      writeBandPartition(spark, path, 0L,
        spark.read.parquet(s"$path/sigs")
          .filter(col("batch_seq") === 0L).select("id", "sig"),
        bands, rows, bandParts)
    }
  }

  // ======================================================================
  // Band-keyed standing-signature layout + index maintenance
  // ======================================================================

  /** The `band_parts` recorded in an index meta row — 0 (no band layout)
    * for indexes built before the column existed. */
  private def bandPartsOf(m: org.apache.spark.sql.Row): Int =
    if (m.schema.fieldNames.contains("band_parts"))
      m.getAs[Int]("band_parts") else 0

  /** A signature relation exploded to its per-band bucket keys — the
    * SAME banding expression [[lshPairsBetween]] joins on
    * (xxhash64 over each `rows`-wide signature slice), so the persisted
    * layout and the inline path can never hash differently. */
  private def bandExplode(sigs: DataFrame, bands: Int,
                          rows: Int): DataFrame =
    sigs.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))

  /** The bucket-partition key of a (band, bucket) pair under `parts`
    * partitions — the DPP handle: all rows of one LSH bucket land in one
    * partition, so a probe that prunes to its own keys' partitions still
    * sees every bucket it can collide with IN FULL (the hot-bucket guard
    * keeps exact counts). */
  private def bktPart(parts: Int): Column =
    pmod(xxhash64(col("band"), col("bucket")), lit(parts.toLong))
      .cast("int")

  /** Write one `batch_seq` partition of the band-keyed layout:
    * `<path>/bands/batch_seq=K/bkt_part=N` holds (band, bucket, id)
    * rows — slim probe-side rows (the k-long signatures stay in `sigs`;
    * duplicating them per band would multiply index bytes by `bands`).
    * The write is ATOMIC per seq: everything lands in a staging dir and
    * ONE rename promotes it — a crash leaves either no partition (the
    * layout self-repairs from `sigs` at next open) or a complete one. */
  private def writeBandPartition(spark: org.apache.spark.sql.SparkSession,
                                 path: String, seq: Long, sigsOfSeq: DataFrame,
                                 bands: Int, rows: Int, parts: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val staging = new Path(s"$path/bands_staging/seq_$seq")
    fs.delete(staging, true)
    bandExplode(sigsOfSeq, bands, rows)
      .withColumn("bkt_part", bktPart(parts))
      .select("band", "bucket", "id", "bkt_part")
      // cluster by the partition key before the write: without this every
      // shuffle partition emits a file into every bkt_part dir (parts ×
      // partitions tiny files per seq — exactly the listing overhead the
      // layout exists to avoid); with it each dir gets one file
      .repartition(col("bkt_part"))
      .write.partitionBy("bkt_part").mode("overwrite")
      .parquet(staging.toString)
    val dest = new Path(s"$path/bands/batch_seq=$seq")
    fs.mkdirs(dest.getParent)
    fs.delete(dest, true)
    require(fs.rename(staging, dest), s"band-layout promote failed: $dest")
  }

  /** Open the band layout of an index (no-op when the index was built
    * without one): recover a crashed [[compactMinhashIndex]] swap,
    * discard per-seq staging leftovers, and REBUILD any `batch_seq`
    * partition present in `sigs` but missing from `bands` — the bands
    * relation is derived data, so a crash between an ingest's sigs
    * append and its bands write self-heals here, deterministically, from
    * the authoritative signatures. Returns the layout's partition count
    * (0 = no layout). */
  private def openBandLayout(spark: org.apache.spark.sql.SparkSession,
                             path: String,
                             metaRow: org.apache.spark.sql.Row = null): Int = {
    // callers that already read meta pass it in — re-reading it here was
    // one extra schema+head driver job per ingest/probe
    val m = if (metaRow != null) metaRow
      else spark.read.parquet(s"$path/meta").head()
    val parts = bandPartsOf(m)
    if (parts <= 0) return 0
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    graft.ops.CarryState.recoverDir(spark, s"$path/bands")
    fs.delete(new Path(s"$path/bands_staging"), true)
    // partition presence from DIRECTORY LISTING on both sides — one
    // O(#partitions) namenode call each, never a data scan per ingest
    def seqDirs(dir: Path): Set[Long] =
      if (!fs.exists(dir)) Set.empty
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch_seq="))
        .map(_.stripPrefix("batch_seq=").toLong).toSet
    val inSigs = seqDirs(new Path(s"$path/sigs"))
    val present = seqDirs(new Path(s"$path/bands"))
    val (bands, rows) = (m.getAs[Int]("bands"), m.getAs[Int]("rows"))
    (inSigs -- present).toSeq.sorted.foreach { seq =>
      writeBandPartition(spark, path, seq,
        spark.read.parquet(s"$path/sigs")
          .filter(col("batch_seq") === seq).select("id", "sig"),
        bands, rows, parts)
    }
    // stale partitions (a rebuild overwrote sigs at the same path): the
    // sig fetch join already drops their candidates, but carrying them
    // wastes probe reads forever — remove them
    (present -- inSigs).foreach { seq =>
      fs.delete(new Path(s"$path/bands/batch_seq=$seq"), true)
    }
    parts
  }

  /** [[lshPairsBetween]] served from the persisted band-keyed layout
    * with PARTITION PRUNING: the arriving batch's (band, bucket) keys
    * name the only `bkt_part=` partitions a collision can live in, so
    * the probe reads those buckets instead of scanning the whole
    * standing index — the [[graft.ml.Pq]] `centroid_id=` DPP trick
    * applied to LSH buckets. Candidates come from the slim (band,
    * bucket, id) rows; the k-long signatures are fetched by one id
    * equi-join against `sigs` ONLY for deduplicated candidate pairs.
    * Output and semantics identical to [[lshPairsBetween]] (the
    * hot-bucket guard counts whole buckets — a bucket never splits
    * across partitions). */
  private def lshPairsBetweenBanded(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newSigs: DataFrame, bands: Int, rows: Int, threshold: Double,
      maxBucket: Int, parts: Int, sigsDf: DataFrame = null): DataFrame = {
    val k = bands * rows
    val nb = scopedCache(bandExplode(newSigs, bands, rows)
      .withColumn("bkt_part", bktPart(parts)))
    // the partitions this batch can collide in — ≤ min(batch·bands, parts)
    // ints, collected to drive partition pruning on the standing read
    val touched = nb.select("bkt_part").distinct()
      .collect().map(_.getInt(0)).toSeq
    val standing = spark.read.parquet(s"$path/bands")
      .filter(col("bkt_part").isin(touched: _*))
    val eb = dropHotBuckets(standing, Seq("band", "bucket"), maxBucket)
      .select(col("band"), col("bucket"), col("id").as("existing_id"))
    val cand = nb.select(col("band"), col("bucket"), col("id").as("new_id"))
      .join(eb, Seq("band", "bucket"))
      .select("new_id", "existing_id").distinct()
    val agree = org.apache.spark.sql.graftshim.Shim.columnOf(
      graft.plans.ArrayEqCount(
        org.apache.spark.sql.graftshim.Shim.exprOf(col("new_sig")),
        org.apache.spark.sql.graftshim.Shim.exprOf(col("existing_sig"))))
    // sig fetch side: reuse the caller's already-opened sigs relation
    // when there is one (ingestDedup's `existing`) — a second
    // spark.read.parquet re-lists the whole partition tree per call
    val sigTable = if (sigsDf != null) sigsDf
      else spark.read.parquet(s"$path/sigs")
    cand
      .join(newSigs.select(col("id").as("new_id"),
        col("sig").as("new_sig")), Seq("new_id"))
      .join(sigTable
        .select(col("id").as("existing_id"),
          col("sig").as("existing_sig")), Seq("existing_id"))
      .select(col("new_id"), col("existing_id"),
        (agree.cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** The single-writer MAINTENANCE LEASE — [[graft.ops.Lease]], shared
    * since round 18 by every persisted-index writer (minhash compaction,
    * winnow/decontam slice appends, shard resyncs): `<path>/_MAINTENANCE`
    * is taken by the maintenance writer for its whole critical section
    * and checked by [[ingestDedup]] / [[dedupeAgainstIndex]] (and the
    * other guarded opens) so a concurrent append cannot land its
    * partition in the pre-compaction dir and have it deleted by the
    * staged swap, and two concurrent appends cannot compute the same
    * next partition seq and silently replace each other's landed data.
    * Liveness is HEARTBEAT-based ([[graft.ops.Lease.withLease]] renews
    * on a daemon schedule), so a compaction legitimately outrunning the
    * TTL keeps its lease while a crashed holder's goes stale and is
    * cleared on the next open. These thin delegates keep the historical
    * `Dedup.*` call surface (tests model crashed holders through them).
    */
  private[graft] def staleLeaseMs: Long = graft.ops.Lease.staleLeaseMs
  private[graft] def staleLeaseMs_=(v: Long): Unit =
    graft.ops.Lease.staleLeaseMs = v

  private[graft] def takeMaintenanceLease(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    graft.ops.Lease.take(spark, path, "compactMinhashIndex")

  private[graft] def releaseMaintenanceLease(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    graft.ops.Lease.release(spark, path)

  /** Fail loudly if a LIVE maintenance lease is present; silently clear
    * a stale one (crashed holder). Called by every index open. */
  private[graft] def checkMaintenanceLease(
      spark: org.apache.spark.sql.SparkSession, path: String,
      who: String): Unit =
    graft.ops.Lease.check(spark, path, who)

  /** max `batch_seq=` of a partitioned artifact dir from DIRECTORY
    * LISTING — one O(#partitions) namenode call, replacing the
    * max(batch_seq) AGGREGATE SCAN the ingest/compaction verbs used to
    * run over the whole standing relation just to pick the next
    * partition number (at 100 TB that scan reads every partition's
    * footers and batch_seq values; the listing reads none). None when
    * the dir is missing or holds no `batch_seq=` partitions (a flat
    * legacy layout) — callers fall back to the aggregate for those. */
  private def listedMaxSeq(spark: org.apache.spark.sql.SparkSession,
                           dir: String,
                           prefix: String = "batch_seq="): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val seqs = fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
    if (seqs.isEmpty) None else Some(seqs.max)
  }

  /** COMPACT a [[buildMinhashIndex]] artifact that has accumulated many
    * [[ingestDedup]] `batch_seq=` partitions — the maintenance verb that
    * keeps streaming-cadence ingest from drowning the slim signature
    * scans in parquet listing/footer overhead (thousands of micro
    * partitions per day, none ever rewritten). All partitions EXCEPT the
    * last collapse into the base partition `batch_seq=0` (ids and sigs
    * byte-identical, evidence reset to the build sentinel); the LAST
    * partition is preserved VERBATIM — same `batch_seq`, same
    * (batch_id, batch_fp, batch_n) — so the exactly-once replay
    * detection keeps working across the compaction boundary: an
    * immediate retry of the latest batch still re-emits its survivor
    * set bit-identically, and the next fresh batch still lands at
    * `max(batch_seq)+1`. The swap rides
    * [[graft.ops.CarryState.replaceDir]] (staging + marker + rename), so
    * a crashed compaction never corrupts the index — every reader runs
    * [[graft.ops.CarryState.recoverDir]] on open. Single-writer
    * maintenance is MACHINE-ENFORCED: the verb takes the
    * `_MAINTENANCE` lease for its duration, and [[ingestDedup]] /
    * [[dedupeAgainstIndex]] fail loudly on open while it is held (a
    * crashed compactor's stale lease is cleared on open — see
    * [[checkMaintenanceLease]]). The foreachBatch serial-execution slot
    * remains the natural place to run it in a streaming deployment.
    *
    * What compaction consciously DISCARDS: the stale-redelivery evidence
    * of compacted-away batches (their batch_id/fp/n reset to the
    * sentinel). The replay window is 1 — only the LAST partition's
    * evidence is contractual — so detection of in-window replays is
    * untouched; a delayed duplicate of an ANCIENT batch is no longer
    * named by the fail-safe after compaction (it surfaces as an
    * all-dropped batch instead).
    *
    * `targetFiles` > 0 repartitions the collapsed base before the write
    * (bound the file count at micro-partition accumulation scale);
    * 0 keeps the natural partitioning. A band layout, when present, is
    * rebuilt from the compacted signatures in the same pass.
    */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, targetFiles: Int = 0): Unit =
    graft.ops.Lease.withLease(spark, path, "compactMinhashIndex") {
      compactMinhashIndexLocked(spark, path, targetFiles)
    }

  private def compactMinhashIndexLocked(
      spark: org.apache.spark.sql.SparkSession,
      path: String, targetFiles: Int): Unit = {
    graft.ops.CarryState.recoverDir(spark, s"$path/sigs")
    val m = spark.read.parquet(s"$path/meta").head()
    val sigs0 = spark.read.parquet(s"$path/sigs")
    val hasEvidence = sigs0.columns.contains("batch_id")
    val maxSeq = listedMaxSeq(spark, s"$path/sigs").getOrElse(
      sigs0.agg(coalesce(max(col("batch_seq").cast("long")),
        lit(0L))).head().getLong(0))
    if (maxSeq > 0) {
      val dataCols = sigs0.columns.filterNot(_ == "batch_seq").toSeq
      val base0 = sigs0.filter(col("batch_seq") < maxSeq)
        .select(dataCols.map(col): _*)
      val base1 = if (hasEvidence)
          base0.withColumn("batch_id", lit(-1L))
            .withColumn("batch_fp", lit(0L))
            .withColumn("batch_n", lit(-1L))
        else base0
      val base = (if (targetFiles > 0) base1.repartition(targetFiles)
                  else base1).withColumn("batch_seq", lit(0L))
      val last = sigs0.filter(col("batch_seq") === maxSeq)
        .select(dataCols.map(col): _*)
        .withColumn("batch_seq", lit(maxSeq))
      // the union must MATERIALIZE before the old dir is deleted — the
      // staging write is that materialization (it reads the old files)
      graft.ops.CarryState.replaceDir(spark, s"$path/sigs") { staging =>
        base.unionByName(last)
          .write.partitionBy("batch_seq").mode("overwrite").parquet(staging)
      }
    }
    if (bandPartsOf(m) > 0) {
      // rebuild the band layout from the compacted signatures: drop every
      // per-seq partition and let the open-time repair re-derive them
      import org.apache.hadoop.fs.Path
      val fs = new Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(s"$path/bands"), true)
      fs.delete(new Path(s"$path/bands_staging"), true)
      openBandLayout(spark, path, m)
    }
  }

  /** Drop new docs that near-duplicate a persisted [[buildMinhashIndex]]
    * artifact (probe only — the index is not modified). Reads the
    * signature parameters from `<path>/meta` (1-row driver read), computes
    * the batch's signatures with them, and anti-joins
    * [[lshPairsBetween]]'s collisions — O(batch) signature work, one
    * (band, bucket) equi-join against the standing signatures.
    */
  def dedupeAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, newDocs: DataFrame, idCol: String,
                         textCol: String, threshold: Double = 0.8,
                         maxBucket: Int = 100000): DataFrame = {
    checkMaintenanceLease(spark, path, "dedupeAgainstIndex")
    graft.ops.CarryState.recoverDir(spark, s"$path/sigs")
    val m = spark.read.parquet(s"$path/meta").head()
    val (n, bands, rows) = (m.getAs[Int]("n"), m.getAs[Int]("bands"),
      m.getAs[Int]("rows"))
    val newSigs = minhashSignatures(newDocs, idCol, textCol, n,
      bands * rows, m.getAs[Long]("seed"),
      indexLeaf(textCol, n, m.getAs[Boolean]("portable")))
    val parts = openBandLayout(spark, path, m)
    val pairs = if (parts > 0)
      lshPairsBetweenBanded(spark, path, scopedCache(newSigs), bands,
        rows, threshold, maxBucket, parts)
    else lshPairsBetween(newSigs,
      spark.read.parquet(s"$path/sigs").select("id", "sig"),
      bands, rows, threshold, maxBucket)
    val dup = pairs.select(col("new_id").as(idCol)).distinct()
    newDocs.join(dup, Seq(idCol), "left_anti")
  }

  /** Dedup-on-ingest against a persisted [[buildMinhashIndex]] artifact,
    * WITH index growth — the full admission pipeline a training-data
    * ingest runs per batch:
    *   1. drop batch docs whose estimated Jaccard against ANY standing
    *      signature reaches `threshold` ([[lshPairsBetween]]);
    *   2. among the remaining docs, drop any that collides with a
    *      SMALLER-id index-surviving batch sibling (pairwise, not
    *      transitive — a deterministic, replayable rule;
    *      [[lshPairsFromSignatures]] generates the candidates);
    *   3. append the survivors' signatures to `<path>/sigs` as a fresh
    *      `batch_seq` partition — later batches (and later micro-batches
    *      of a stream) dedup against everything this batch admitted;
    *   4. return the admitted batch rows.
    * Docs WITHOUT a signature pass through unexamined and are not added
    * to the index — with the default engine leaf that set is empty (short
    * docs get a whole-text fallback shingle); with the portable md5 leaf
    * it is the docs with fewer than n tokens. Surface them with a length
    * filter upstream if pass-through is not the policy you want.
    *
    * REPLAY-SAFE (the [[graft.ops.CarryState]] contract): each appended
    * partition carries the applied batch's (batch_id, batch_fp, batch_n)
    * as constant columns — evidence that commits ATOMICALLY with the
    * index mutation, no separate meta file to race. A batch matching the
    * last partition's evidence (its foreachBatch `batchId`, or its
    * content fingerprint for callers without ids) is a replay-after-
    * append: without the check its own standing signatures would collide
    * with it and silently drop the whole batch; instead the recorded
    * partition's survivor set is re-emitted, bit-identical to the
    * original delivery. A recorded batchId arriving with different
    * content fails loudly — the fingerprint is the XOR of per-row
    * md5(id|text) leaves ([[graft.ops.Scale.contentFpSql]]), so a
    * mutated TEXT under the same ids is detected, not just an id-set or
    * count change. (Evidence written before this convention carries
    * id-only fingerprints; a cross-version replay of such a batch fails
    * loudly rather than silently — rebuild the index to re-arm,
    * README migration note.) The replay WINDOW is 1 — exactly the
    * foreachBatch at-least-once contract, where retries are immediate: a
    * batch redelivered after SUBSEQUENT batches were applied (a delayed
    * duplicate) is detected by its recorded batch_id in an older
    * partition and FAILS LOUDLY instead of silently colliding with its
    * own standing signatures and emitting empty. A crash BEFORE the append leaves no evidence
    * and no partition — the retry simply runs fresh. (The one naturally
    * idempotent gap: a batch whose survivor set was EMPTY writes no
    * partition, and its retry re-drops everything against the same
    * standing signatures — same output.) Legacy indexes without the
    * evidence columns keep the old at-least-once behavior; rebuild with
    * [[buildMinhashIndex]] to upgrade (README migration note).
    *
    * Scale shapes: batch signatures are computed ONCE (cached across the
    * three consumers), the index is only ever READ on its existing
    * `batch_seq=` partitions and APPENDED as a new partition (no
    * read-modify-write races, the [[graft.ml.Pq.appendToIvfPqIndex]]
    * layout discipline), and the returned relation derives from the
    * WRITTEN partition, so what the caller sees is exactly what the index
    * recorded. Per-batch cost is O(batch) shingling/shuffle PLUS one scan
    * of the standing signature relation (slim — k int64s per doc; the
    * corpus text is never re-read and never shuffled); ProfSpec pins that
    * per-batch latency stays flat as the index grows across appends.
    */
  def ingestDedup(spark: org.apache.spark.sql.SparkSession, path: String,
                  batch: DataFrame, idCol: String, textCol: String,
                  threshold: Double = 0.8, maxBucket: Int = 100000,
                  batchId: Long = -1L): DataFrame = {
    checkMaintenanceLease(spark, path, "ingestDedup")
    graft.ops.CarryState.recoverDir(spark, s"$path/sigs")
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val m = spark.read.parquet(s"$path/meta").head()
    val (n, bands, rows) = (m.getAs[Int]("n"), m.getAs[Int]("bands"),
      m.getAs[Int]("rows"))
    val bandLayout = openBandLayout(spark, path, m)
    val existing = spark.read.parquet(s"$path/sigs")
    val newSigs = trackCache(minhashSignatures(batch, idCol, textCol, n,
      bands * rows, m.getAs[Long]("seed"),
      indexLeaf(textCol, n, m.getAs[Boolean]("portable"))))
    // REPLAY DETECTION (the CarryState contract, with the evidence riding
    // IN the appended partition so it commits atomically with the index
    // mutation): each ingest partition carries the applied batch's
    // (batch_id, batch_fp, batch_n) as constant columns. An arriving
    // batch matching the LAST partition's evidence is a replay — its
    // signatures are already standing, so re-running the dedup would
    // collide the batch with itself and silently drop EVERYTHING; the
    // correct output (that partition's survivors) is re-derived instead.
    // Legacy indexes (no evidence columns) keep the old at-least-once
    // behavior — rebuild to upgrade (README migration note).
    val hasEvidence = existing.columns.contains("batch_id")
    val seq = listedMaxSeq(spark, s"$path/sigs").getOrElse(
      existing.agg(coalesce(max(col("batch_seq")), lit(0L)))
        .head().getLong(0)) + 1
    def emitFrom(seqNo: Long): DataFrame = {
      // survivors = the recorded partition; dropped = sig'd batch docs
      // not in it (shingle-less docs pass through). The partition dir is
      // read DIRECTLY — a full-table open re-lists every batch_seq
      // partition just to prune back down to this one. A batch whose
      // survivor set was empty wrote no partition: every sig'd doc drops.
      val seqDir = s"$path/sigs/batch_seq=$seqNo"
      val survIds =
        if (fs.exists(new org.apache.hadoop.fs.Path(seqDir)))
          spark.read.parquet(seqDir).select("id")
        else newSigs.select("id").limit(0)
      val dropped = newSigs.select("id")
        .join(survIds, Seq("id"), "left_anti")
        .withColumnRenamed("id", idCol)
      batch.join(dropped, Seq(idCol), "left_anti")
    }
    // the fingerprint covers (id, text), not just the id set: a batch id
    // redelivered with the same ids but mutated text must fail loudly,
    // never silently re-emit the stale survivor set
    val bst = if (hasEvidence)
      batch.agg(count(lit(1)).as("bn"),
        coalesce(expr(
            s"bit_xor(${graft.ops.Scale.contentFpSql(idCol, textCol)})"),
          lit(0L)).as("bfp")).head()
      else null
    // the aggregated fp carries the encoding-version nibble
    // (Scale.tagContentFp) so a cross-version replay is diagnosable
    // instead of silently colliding — see CarryState.isReplay
    def bfp: Long =
      graft.ops.Scale.tagContentFp(bst.getAs[Long]("bfp"))
    if (hasEvidence && seq > 1) {
      val last = existing.filter(col("batch_seq") === (seq - 1))
        .select(col("batch_id"), col("batch_fp"), col("batch_n"))
        .head()
      if (graft.ops.CarryState.isReplay("ingestDedup", batchId,
          bfp, bst.getAs[Long]("bn"),
          (last.getAs[Long]("batch_id"), last.getAs[Long]("batch_fp"),
            last.getAs[Long]("batch_n"))))
        return emitFrom(seq - 1)
      // STALE-REDELIVERY FAIL-SAFE: a batch redelivered AFTER subsequent
      // batches have been applied (a delayed duplicate, not the
      // foreachBatch immediate retry) matches no "last partition"
      // evidence — without this check it would collide with its own
      // standing signatures and silently emit an EMPTY batch. One slim
      // column scan over the recorded batch_id evidence finds it; the
      // replay window is 1, so this is a contract violation, not a
      // recoverable state — fail loudly.
      if (batchId >= 0L && last.getAs[Long]("batch_id") != batchId) {
        val stale = existing.filter(col("batch_id") === batchId)
          .agg(max(col("batch_seq").cast("long"))).head()
        if (!stale.isNullAt(0))
          throw new IllegalArgumentException(
            s"ingestDedup: batchId $batchId is a STALE redelivery — it " +
              s"was applied as batch_seq ${stale.getLong(0)} and " +
              s"${seq - 1 - stale.getLong(0)} subsequent batch(es) have " +
              "been applied since (the replay window is 1: immediate " +
              "retries only). Re-running it would collide the batch " +
              "with its own standing signatures and emit empty — " +
              "refusing instead.")
      }
    }
    val dupVsIndex = (if (bandLayout > 0)
        lshPairsBetweenBanded(spark, path, newSigs, bands, rows,
          threshold, maxBucket, bandLayout, sigsDf = existing)
      else lshPairsBetween(newSigs, existing.select("id", "sig"),
        bands, rows, threshold, maxBucket))
      .select(col("new_id").as("id")).distinct()
    val keptSigs = newSigs.join(dupVsIndex, Seq("id"), "left_anti")
    val dupInBatch = lshPairsFromSignatures(keptSigs, bands, rows,
        threshold, maxBucket)
      .select(col("id_b").as("id")).distinct()
    val survivors = keptSigs.join(dupInBatch, Seq("id"), "left_anti")
    (if (hasEvidence)
        survivors.withColumn("batch_id", lit(batchId))
          .withColumn("batch_fp", lit(bfp))
          .withColumn("batch_n", lit(bst.getAs[Long]("bn")))
      else survivors)
      .withColumn("batch_seq", lit(seq))
      .write.partitionBy("batch_seq").mode("append").parquet(s"$path/sigs")
    // band layout (when built with one): derive the new partition's slim
    // (band, bucket, id) rows FROM the partition just written (direct
    // subdir read — not a full-table open pruned back down; an
    // empty-survivor batch wrote no partition and needs no band rows).
    // The sigs append is the commit point — a crash before this write
    // completes leaves a sigs partition without band rows, which
    // openBandLayout rebuilds deterministically at the next open.
    val seqDir = s"$path/sigs/batch_seq=$seq"
    if (bandLayout > 0 &&
        fs.exists(new org.apache.hadoop.fs.Path(seqDir)))
      writeBandPartition(spark, path, seq,
        spark.read.parquet(seqDir).select("id", "sig"),
        bands, rows, bandLayout)
    // authoritative survivor list = the partition just written
    emitFrom(seq)
  }

  /** SimHash: 64-bit locality-sensitive content hash. Per doc, each token
    * votes ±1 on each bit of its 64-bit hash; the sign of the per-bit sum is
    * the fingerprint bit. Computed as 64 conditional sums in ONE aggregate
    * over the exploded token table (map-side combinable).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              hashLeaf: Option[Column => Column] = None): DataFrame = {
    // hashLeaf overrides the token hash (e.g. TextFns.portableHash64 for
    // engine-reproducible fingerprints); votes/packing/banding identical
    val leaf = hashLeaf.getOrElse((c: Column) => xxhash64(c))
    val toks = spread(df).select(col(idCol).as("id"),
      explode(array_distinct(TextFns.tokens(col(textCol)))).as("tok"))
      .withColumn("th", leaf(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(col("th").bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist. Candidates via
    * chunk banding with the chunk count DERIVED from maxDist: splitting the
    * 64 bits into maxDist+1 chunks guarantees (pigeonhole) that any pair at
    * distance <= maxDist shares at least one whole chunk — so candidate
    * recall is exact, and the popcount filter makes the result exact. The
    * default maxDist=3 gives the classic 4×16-bit layout. Larger maxDist
    * means narrower chunks (fewer distinct bucket keys → bigger buckets →
    * more candidates): maxDist is capped at 15 (4-bit chunks) — beyond that
    * bucket keys stop discriminating and the join degenerates toward n².
    * `maxBucket` drops chunk buckets holding more than that many docs: one
    * hot chunk value (short/templated docs collapsing to similar
    * fingerprints) emits bucket² candidate rows, the quadratic failure mode
    * at corpus scale. Unlike Jaccard stop-shingles this CAN lose guaranteed
    * candidates (a pair's only shared chunk may be the dropped one), so the
    * default is generous; set <= 0 to disable.
    */
  /** The simhash banding's chunk-key array over a `simhash` column:
    * maxDist+1 chunks over 64 bits (first `rem` chunks one bit wider when
    * 64 doesn't divide evenly — any partition into d+1 groups works for
    * the pigeonhole argument). Shared by the pair join and
    * [[simhashCandidateVolume]].
    */
  private def simhashChunkKeys(maxDist: Int): Column = {
    // hoisted here so the pair join AND the candidate-volume probe reject
    // the same inputs — a gate run with out-of-range maxDist must fail
    // fast, not silently measure non-discriminating chunk keys
    require(maxDist >= 0 && maxDist <= 15,
      s"maxDist=$maxDist: chunk banding supports 0..15 (16 chunks of 4 bits); " +
      "beyond that the bucket keys stop discriminating")
    val nChunks = maxDist + 1
    val base = 64 / nChunks
    val rem = 64 % nChunks
    val widths = Seq.tabulate(nChunks)(c => if (c < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    array((0 until nChunks).map(c =>
      shiftrightunsigned(col("simhash"), offsets(c))
        .bitwiseAND(lit((1L << widths(c)) - 1))): _*)
  }

  /** [[simhashPairs]]' candidate volume after the hot-bucket guard — Σ per
    * (chunk, ckey) of C(size, 2), from bucket sizes only (see
    * [[lshCandidateVolume]] for the gate's rationale). One row:
    * (n_candidates).
    */
  private[graft] def simhashCandidateVolume(df: DataFrame, idCol: String,
      textCol: String, maxDist: Int = 3, maxBucket: Int = 10000,
      hashLeaf: Option[Column => Column] = None): DataFrame = {
    val chunked = dropHotBuckets(
      simhash(df, idCol, textCol, hashLeaf).select(col("id"),
          posexplode(simhashChunkKeys(maxDist)))
        .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "ckey")),
      Seq("chunk", "ckey"), maxBucket)
    chunked.groupBy("chunk", "ckey").agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") * (col("__n") - 1) / 2), lit(0L))
        .cast("long").as("n_candidates"))
  }

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, maxBucket: Int = 10000,
                   hashLeaf: Option[Column => Column] = None): DataFrame = {
    require(maxDist >= 0 && maxDist <= 15,
      s"maxDist=$maxDist: chunk banding supports 0..15 (16 chunks of 4 bits); " +
      "beyond that the bucket keys stop discriminating")
    // one cache, at the chunk level: it feeds the hot-bucket probe and both
    // self-join sides; an additional signature-level cache would only pay
    // a second materialization for a single consumer
    val chunked0 = scopedCache(
      simhash(df, idCol, textCol, hashLeaf).select(col("id"), col("simhash"),
        posexplode(simhashChunkKeys(maxDist)))
        .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "ckey")))
    val chunked = dropHotBuckets(chunked0, Seq("chunk", "ckey"), maxBucket)
    // hamming is identical for every duplicate of a pair (one per shared
    // chunk), so filter FIRST: the popcount is a codegen'd scalar while
    // dropDuplicates is a shuffle — dedup only the survivors, not the full
    // candidate set
    chunked.as("a").join(chunked.as("b"), Seq("chunk", "ckey"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }

  /** Connected components over a near-dup pair table ((id_a, id_b) edges):
    * iterative min-label propagation until fixpoint. Each iteration is one
    * join + aggregate (shuffle on vertex id); `localCheckpoint` truncates
    * lineage so plans stay bounded. Converges in O(diameter) iterations —
    * near-dup clusters are shallow (typically 2-5 hops), so this beats the
    * constant-factor-heavy large-star/small-star variant at realistic skew.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    // localCheckpoint pins blocks at the RDD level (invisible to
    // spark.catalog); snapshotting getPersistentRDDs around each checkpoint
    // lets us drop an iteration's blocks as soon as the next iteration is
    // materialized — without it, O(diameter) full label tables stay pinned
    // for the life of the session
    def pinnedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def unpersistIds(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

    // both edge orientations in ONE pass over `pairs` (explode, not a
    // two-branch union, which would evaluate the — often expensive —
    // upstream pair computation twice). No distinct: every pair generator
    // here emits unique (id_a, id_b) rows already, and the per-iteration
    // min() aggregate is idempotent under duplicate edges anyway — the
    // distinct was a full extra shuffle of the edge table for nothing.
    val preEdges = pinnedIds
    val edges0 = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    val edgeIds = pinnedIds -- preEdges
    // size the iteration to the graph: near-dup edge tables are usually a
    // tiny fraction of the corpus, and running O(diameter) join+agg rounds
    // at full parallelism is pure scheduling overhead. The count is one
    // cheap job over the already-materialized checkpoint blocks; coalesce
    // (not repartition) merges without a shuffle — and ONLY when it
    // narrows: a graph sized at-or-above the parallelism target keeps its
    // existing partitioning (coalescing a big edge table down to the core
    // count would throttle every per-iteration join's scan parallelism).
    val target = sc.defaultParallelism.toLong
    val wanted = edges0.count() / 250000L + 1
    val edges =
      if (wanted >= target || wanted >= edges0.rdd.getNumPartitions) edges0
      else edges0.coalesce(math.max(1L, wanted).toInt)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    var staleIds = Set.empty[Int]
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val t0 = if (dbg) System.nanoTime() else 0L
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_label")).as("nbr_label"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          coalesce(col("nbr_label") < col("label"), lit(false)).as("__chg"))
      // one real job per iteration: the localCheckpoint materialization.
      // The convergence probe is an aggregate over the checkpointed blocks —
      // a scan of the (tiny) cached labels, no recompute of the iteration.
      // (An Observation would fuse it into the checkpoint job itself, but
      // Observation.get blocks on the async listener bus, which under a
      // busy session adds SECONDS of wait per iteration — measured worse
      // than the extra micro-job.)
      val preCp = pinnedIds
      val updated = next.localCheckpoint()
      converged = updated.agg(max(col("__chg"))).head() match {
        case r if r.isNullAt(0) => true // empty label table: nothing to do
        case r                  => !r.getBoolean(0)
      }
      // the new checkpoint is materialized: the previous iteration's label
      // blocks are unreachable from any live lineage — release them now
      unpersistIds(staleIds)
      staleIds = pinnedIds -- preCp
      labels = updated.drop("__chg")
      if (dbg) println(f"[cc] iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s converged=$converged")
      i += 1
    }
    if (!converged)
      System.err.println(s"graft warning: connectedComponents stopped at " +
        s"maxIter=$maxIter without converging; labels may be non-minimal " +
        "(raise maxIter for graphs with long chains)")
    // the final labels are checkpointed (lineage-free): the edge blocks are
    // no longer needed by anything reachable
    unpersistIds(edgeIds)
    // the final checkpoint itself must stay pinned until the caller has
    // consumed the result; unpersistIntermediates() releases it
    liveIntermediates.add(() => unpersistIds(staleIds))
    labels // (id, label = cluster min id)
  }

  /** Resolve near-dup clusters to canonical rows: every row whose id is NOT
    * the minimum of its duplicate cluster is dropped. `pairs` is any
    * near-dup pair table (from exact/Jaccard/MinHash/SimHash/embedding).
    */
  def keepCanonical(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val dupes = connectedComponents(pairs)
      .filter(col("id") =!= col("label"))
      .select(col("id").as("__dup_id"))
    // no broadcast hint: at corpus scale the dupe set is unbounded (billions
    // of ids on a web crawl) — let AQE pick broadcast vs shuffle at runtime
    df.join(dupes, df(idCol) === col("__dup_id"), "left_anti")
  }

  /** Resolve near-dup clusters keeping the PREFERRED member per cluster —
    * the quality-aware survivor policy real pipelines want (keep the
    * longest / highest-quality-score copy of a mirrored page, not the one
    * with the smallest crawl id): winner = max `pref`, ties to min id so
    * the survivor set is a total function of the pair table. `pref` is
    * any expression over `df`'s columns (length, quality score, recency).
    *
    * Scale shape: [[connectedComponents]] labels only ids that appear in
    * `pairs`; the winner election is a row_number window PARTITIONED BY
    * cluster label (duplicate clusters are small by construction — hash
    * partitioned, no global sort), and the final keep is one anti-join of
    * the losers against the corpus. Rows in no cluster survive untouched.
    */
  def keepCanonicalBy(df: DataFrame, idCol: String, pairs: DataFrame,
                      pref: Column): DataFrame = {
    val labels = connectedComponents(pairs)
    val members = df.select(col(idCol).as("__kid"), pref.as("__pref"))
      .join(labels, col("__kid") === col("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"))
      .orderBy(col("__pref").desc, col("__kid").asc)
    val losers = members.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") =!= 1)
      .select(col("__kid").as("__dup_id"))
    df.join(losers, df(idCol) === col("__dup_id"), "left_anti")
  }

  /** Per-group duplication report — the ops artifact a dedup run ships
    * with (which sources/languages are mirror-heavy decides where the
    * pipeline spends its pair budget): for each group, total docs, docs
    * that would be DROPPED by canonical resolve (non-minimum members of
    * their near-dup cluster — exactly [[keepCanonical]]'s complement), and
    * the dup rate. One CC pass + one left join + one aggregate.
    */
  def dedupReport(df: DataFrame, idCol: String, pairs: DataFrame,
                  grpCols: Seq[String]): DataFrame = {
    require(grpCols.nonEmpty, "need at least one grouping column")
    val dupes = connectedComponents(pairs)
      .filter(col("id") =!= col("label"))
      .select(col("id").as("__dup_id"))
    df.join(dupes, df(idCol) === col("__dup_id"), "left")
      .groupBy(grpCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        count(col("__dup_id")).as("n_dups"))
      .withColumn("dup_rate",
        round(col("n_dups").cast("double") / col("n_docs"), 6))
  }

  /** Leakage-safe train/heldout split: rows are assigned by their near-dup
    * CLUSTER, not individually, so a duplicate pair can never straddle the
    * boundary — the split-time answer to train/eval contamination through
    * near-duplicates (complementing [[decontaminate]], which scrubs against
    * a FIXED benchmark). Cluster label = [[connectedComponents]] over
    * `pairs` (rows absent from `pairs` are their own singleton cluster);
    * split = portable hash of the label, `trainParts` of `denom` parts to
    * "train", the rest "heldout" — deterministic, engine-reproducible, and
    * stable under re-runs and data re-partitioning.
    *
    * Scale shape: CC is the iterated small-label join (see
    * [[connectedComponents]]); the label join back to the data is one
    * equi-join; the hash split is map-side.
    */
  def leakSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                    trainParts: Int, denom: Int,
                    splitCol: String = "split"): DataFrame = {
    require(denom > 0 && trainParts >= 0 && trainParts <= denom,
      "need 0 <= trainParts <= denom")
    val labels = connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("label").as("__cc_lbl"))
    df.join(labels, df(idCol) === col("__cc_id"), "left")
      .withColumn("__lbl", coalesce(col("__cc_lbl"), df(idCol)))
      .withColumn(splitCol,
        when(pmod(graft.ops.Sketch.portableHash(col("__lbl").cast("string")),
            lit(denom)) < trainParts, lit("train")).otherwise(lit("heldout")))
      .drop("__cc_id", "__cc_lbl", "__lbl")
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * semantic near-duplicate discovery scoped to k-means clusters — cluster
    * the embedding space (deterministic Lloyd, [[Clustering.kmeans]]), form
    * candidate pairs ONLY within a cluster, verify by exact cosine, and
    * resolve duplicate groups to canonical survivors via
    * [[connectedComponents]]/[[keepCanonical]].
    *
    * The scale contract is the paper's: with k ∝ n the within-cluster
    * pairwise pass is O(n²/k) candidate rows generated by one equi-join on
    * `cluster` — never the all-pairs O(n²). A degenerate cluster (embedding
    * collapse) would still emit size² rows, so clusters above `maxCluster`
    * are excluded by the shared [[dropHotBuckets]] guard (disable with
    * maxCluster <= 0). The default 10k caps any one cluster at ~5·10⁷
    * candidate pairs — the guard protects even when called with defaults on
    * a collapsed embedding space; scale `k` with corpus size (k ∝ n) so
    * healthy clusters stay well under it. Dropped clusters are a SILENT
    * recall loss for their members: audit with [[semanticDedupDropped]]
    * (same clustering, one row per excluded cluster) before trusting a run
    * on a new corpus. Pair verification is exact cosine, so recall within
    * a cluster is exact; cross-cluster duplicates are the accepted miss —
    * for tight thresholds [[embeddingNearDupPairs]] (LSH, cluster-free) is
    * the recall-oriented alternative.
    *
    * Determinism: with integer-quantized vectors the kmeans labels are
    * bit-reproducible (see [[Clustering]]), dots/norms are exact/correctly
    * rounded on both engines, so the surviving id set replays exactly
    * (q_semantic_dedup's oracle regime).
    *
    * @note BEHAVIOR CHANGE (round 10): `maxCluster`'s default tightened
    *       from 100000 to 10000. Default-args callers whose clustering
    *       yields 10k–100k-row clusters now have those clusters EXCLUDED
    *       from the pairwise pass — a silent recall loss relative to
    *       earlier rounds. Audit with [[semanticDedupDropped]] (same
    *       defaults — empty output means nothing changed for you), or
    *       pass `maxCluster = 100000` explicitly to restore the old cap.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int, threshold: Double,
                    initHash: Option[Column] = None,
                    maxCluster: Int = 10000): DataFrame = {
    val assigned = Clustering.kmeans(df, k, iters, idCol, vecCol, initHash)
    val v = scopedCache(
      df.select(col(idCol).as("id"), col(vecCol).as("v"))
        .join(assigned.select(col(idCol).as("id"), col("cluster")), "id"))
    val guarded = dropHotBuckets(v, Seq("cluster"), maxCluster)
    val pairs = guarded.as("a").join(guarded.as("b"), Seq("cluster"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
    keepCanonical(df, idCol, pairs)
  }

  /** The no-silent-caps companion to [[semanticDedup]]: one row per cluster
    * the `maxCluster` guard would EXCLUDE from the pairwise pass —
    * (cluster, n_rows) — so a run's recall loss is inspectable instead of
    * silent. Same deterministic clustering as the dedup itself (identical
    * k/iters/initHash reproduce identical labels); empty output means the
    * guard never fired. Cost: the kmeans assignment plus one count
    * aggregate — no pair generation.
    */
  def semanticDedupDropped(df: DataFrame, idCol: String, vecCol: String,
                           k: Int, iters: Int,
                           initHash: Option[Column] = None,
                           maxCluster: Int = 10000): DataFrame = {
    val assigned = Clustering.kmeans(df, k, iters, idCol, vecCol, initHash)
    assigned.groupBy("cluster").agg(count(lit(1)).as("n_rows"))
      .filter(lit(maxCluster) > 0 && col("n_rows") > maxCluster)
  }

  /** [[semanticDedup]]'s candidate volume — Σ over guard-surviving clusters
    * of C(size, 2), the exact number of within-cluster cosine comparisons
    * the pairwise join performs (see [[lshCandidateVolume]] for the gate's
    * rationale; the SemDeDup linearity contract requires k ∝ n). One row:
    * (n_candidates).
    */
  private[graft] def semanticDedupCandidateVolume(df: DataFrame,
      idCol: String, vecCol: String, k: Int, iters: Int,
      initHash: Option[Column] = None,
      maxCluster: Int = 10000): DataFrame = {
    val assigned = Clustering.kmeans(df, k, iters, idCol, vecCol, initHash)
    assigned.groupBy("cluster").agg(count(lit(1)).as("__n"))
      .where(if (maxCluster > 0) col("__n") <= maxCluster else lit(true))
      .agg(coalesce(sum(col("__n") * (col("__n") - 1) / 2), lit(0L))
        .cast("long").as("n_candidates"))
  }

  /** [[winnowPairs]]' candidate volume — Σ per surviving fingerprint of
    * C(df, 2), the same-fp comparisons the pair join performs after the
    * maxDf guard (see [[lshCandidateVolume]]). One row: (n_candidates).
    */
  private[graft] def winnowCandidateVolume(df: DataFrame, idCol: String,
      textCol: String, n: Int = 5, w: Int = 4, maxDf: Long = 1000,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    val fps = winnowFingerprints(df, idCol, textCol, n, w, hash)
      .select(col(idCol).as("__id"), col("fp")).distinct()
    fps.groupBy("fp").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxDf)
      .agg(coalesce(sum(col("__n") * (col("__n") - 1) / 2), lit(0L))
        .cast("long").as("n_candidates"))
  }

  /** The ingest-time half of [[semanticDedup]]: drop new vectors that
    * semantically duplicate a CLUSTERED standing corpus. Each new vector is
    * assigned to the persisted centroids ([[Clustering.assign]] — broadcast,
    * map-side), compared against THAT cluster's members only (one equi-join
    * on `cluster`), and dropped on cosine ≥ threshold. `corpus` is the
    * persisted (idCol, vecCol, cluster) table a batch [[semanticDedup]] /
    * [[Clustering.kmeansFit]] run leaves behind; at 100 TB it would be
    * written bucketed by `cluster` so the member join is exchange-free on
    * the corpus side. Same candidate shape as the batch op — O(batch ×
    * cluster-size) cosine checks, never batch × corpus.
    */
  def semanticDedupAgainstCorpus(newDocs: DataFrame, idCol: String,
                                 vecCol: String, centroids: DataFrame,
                                 corpus: DataFrame,
                                 threshold: Double): DataFrame = {
    val assigned = Clustering.assign(newDocs, centroids, idCol, vecCol)
    val members = corpus.select(col(vecCol).as("__cv"), col("cluster"))
    val dup = newDocs.join(assigned, idCol).join(members, "cluster")
      .where(Similarity.cosine(col(vecCol), col("__cv")) >= threshold)
      .select(col(idCol).as("__dup_id")).distinct()
    newDocs.join(dup, newDocs(idCol) === col("__dup_id"), "left_anti")
  }

  /** Embedding near-dup pairs: cosine >= threshold via random-hyperplane LSH
    * bucketing + exact cosine verify. `planes` deterministic from seed.
    *
    * Requires ALL nPlanes bits to agree — the right recall/candidate
    * trade-off only for very tight thresholds (~0.99+), where the bit-flip
    * probability θ/π is tiny. For looser thresholds use
    * [[embeddingNearDupPairsBanded]].
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            dim: Int, threshold: Double = 0.95,
                            nPlanes: Int = 16, seed: Long = 42L): DataFrame = {
    val sigs = scopedCache(
      Similarity.hyperplaneSignature(df, idCol, vecCol, dim, nPlanes, seed)
        .select(col("id"), col("sig"), col("vec")))
    sigs.as("a").join(sigs.as("b"), Seq("sig"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Banded hyperplane LSH for looser cosine thresholds (0.8–0.95): the
    * signature's `bands * rowsPerBand` bits are split into bands of
    * `rowsPerBand` bits; docs sharing ANY band's bits become candidates
    * (OR-amplification, same construction as MinHash banding), then exact
    * cosine verifies. P(candidate) = 1 - (1 - (1-θ/π)^r)^b — at cosine 0.9
    * (θ/π ≈ 0.144) a 7-bit band agrees with p ≈ 0.34, and 8 such bands
    * amplify to ≈96% recall, while near-orthogonal pairs almost never
    * collide. Candidate generation stays an equi-join on (band, key) —
    * shuffle-bounded, no n² pass, hot buckets bounded by `maxBucket` like
    * [[simhashPairs]].
    */
  def embeddingNearDupPairsBanded(df: DataFrame, idCol: String, vecCol: String,
                                  dim: Int, threshold: Double = 0.9,
                                  bands: Int = 8, rowsPerBand: Int = 7,
                                  seed: Long = 42L,
                                  maxBucket: Int = 100000): DataFrame = {
    require(bands * rowsPerBand <= 63, "signature packs into one long")
    val nPlanes = bands * rowsPerBand
    val sigs = Similarity.hyperplaneSignature(df, idCol, vecCol, dim, nPlanes, seed)
    val mask = (1L << rowsPerBand) - 1
    // the banded candidate table carries ONLY (id, band, bkey): caching (or
    // shuffling) the vectors here would duplicate every embedding `bands`
    // times — the vectors join back once per unique candidate pair below
    val banded0 = scopedCache(sigs.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("sig"), b * rowsPerBand).bitwiseAND(lit(mask))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey")))
    val banded = dropHotBuckets(banded0, Seq("band", "bkey"), maxBucket)
    // a pair surfaces once per colliding band: dedup the slim (id_a, id_b)
    // candidates FIRST, then join the vectors back and verify — the cosine
    // runs once per unique pair and the wide embedding arrays stay out of
    // both the self-join and the dropDuplicates shuffles entirely
    val cand = banded.as("a").join(banded.as("b"), Seq("band", "bkey"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("__va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("__vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("__va"), col("__vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** [[embeddingNearDupPairsBanded]]'s candidate volume after the
    * hot-bucket guard — Σ per (band, bkey) bucket of C(size, 2), from
    * bucket sizes only (see [[lshCandidateVolume]]). Note the honest
    * complexity class: band keys are only `rowsPerBand` bits wide (128
    * values at the default 7), so on an ISOTROPIC corpus unrelated vectors
    * collide at rate n²/2^rowsPerBand by design — the banding is a
    * constant-factor thinning plus a recall knob, and the maxBucket guard
    * is the operational bound (ScalingSpec grades this family quadratic-
    * exempt with a live-guard proof, like simhash chunks; on a real
    * near-dup-clustered corpus the collision mass tracks dup clusters
    * instead). One row: (n_candidates).
    */
  private[graft] def embeddingBandedCandidateVolume(df: DataFrame,
      idCol: String, vecCol: String, dim: Int, bands: Int = 8,
      rowsPerBand: Int = 7, seed: Long = 42L,
      maxBucket: Int = 100000): DataFrame = {
    require(bands * rowsPerBand <= 63, "signature packs into one long")
    val nPlanes = bands * rowsPerBand
    val sigs = Similarity.hyperplaneSignature(df, idCol, vecCol, dim,
      nPlanes, seed)
    val mask = (1L << rowsPerBand) - 1
    val banded = dropHotBuckets(sigs.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("sig"), b * rowsPerBand)
          .bitwiseAND(lit(mask))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey")),
      Seq("band", "bkey"), maxBucket)
    banded.groupBy("band", "bkey").agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") * (col("__n") - 1) / 2), lit(0L))
        .cast("long").as("n_candidates"))
  }

  /** Doc-frequency of each line across the corpus (how many DISTINCT
    * documents contain it) — the statistic behind C4/RefinedWeb-style
    * boilerplate removal. Lines shorter than `minLen` code points are
    * ignored. Only 64-bit line hashes shuffle, never line strings; `hash`
    * is pluggable so oracle queries can substitute a SQL-portable md5 leaf.
    */
  def lineDocFrequencies(df: DataFrame, idCol: String, textCol: String,
                         minLen: Int = 1,
                         hash: Column => Column = xxhash64(_)): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), "\n")).as("__line"))
      .where(length(col("__line")) >= minLen)
      .select(hash(col("__line")).as("line_hash"), col(idCol))
      .distinct()
      .groupBy("line_hash").agg(count(lit(1)).as("doc_freq"))

  /** Corpus-level frequent-line removal (the C4 / RefinedWeb boilerplate
    * pass): drop every line that appears in more than `maxDocFreq` distinct
    * documents, preserving the remaining lines' order; documents whose lines
    * are all dropped keep an empty string. Lines shorter than `minLen` are
    * never counted (and so never dropped).
    *
    * Scale shape: the frequency pass shuffles (line_hash, doc_id) pairs —
    * hashes, not strings; the offender set (lines in > maxDocFreq docs) is
    * boilerplate, small by construction, and broadcast into a map-side
    * anti-join; reassembly shuffles each surviving line once, partitioned
    * by document. All other columns of `df` are preserved via the final
    * id-join.
    */
  def dropFrequentLines(df: DataFrame, idCol: String, textCol: String,
                        maxDocFreq: Long, minLen: Int = 1,
                        hash: Column => Column = xxhash64(_)): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val exploded = df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val offenders = lineDocFrequencies(df, idCol, textCol, minLen, hash)
      .where(col("doc_freq") > maxDocFreq)
      .select("line_hash")
    val kept = exploded.join(broadcast(offenders),
      hash(col("__line")) === col("line_hash"), "left_anti")
    val reassembled = kept.groupBy(idCol)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")), "\n").as(textCol))
    df.drop(textCol).join(reassembled, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }

  // -- winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
  //    the MOSS algorithm) ---------------------------------------------------

  /** Winnowed fingerprint selection: from each document's n-gram hash
    * sequence, keep the RIGHTMOST minimal hash of every w-length sliding
    * window, deduplicated by position. Guarantees: any shared substring of
    * at least w+n-1 tokens yields at least one shared fingerprint, and
    * ~2/(w+1) of grams are kept — a deterministic, position-aware sampler
    * (vs MinHash's per-doc signature), the standard plagiarism/overlap
    * detector. Returns (idCol, pos, fp): pos is the selected gram's
    * 0-based token start.
    *
    * Map-only per doc (array expressions, no UDF); only selected 64-bit
    * fingerprints leave the scan. `hash` is pluggable for oracle
    * reproducibility.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 5, w: Int = 4,
                         hash: Column => Column = xxhash64(_)): DataFrame = {
    require(n >= 1 && w >= 1, "n and w must be >= 1")
    val shim = org.apache.spark.sql.graftshim.Shim
    // Leaf detection: when `hash` is one of the two standard leaves
    // (the portable md5-60 leaf or bare xxhash64), the WHOLE gram+winnow
    // selection runs as ONE codegen'd expression
    // ([[graft.plans.WinnowFps]] — tokens encoded once, digests
    // streamed, O(m) deque window minima) instead of the interpreted
    // higher-order-function transform chain below, which stays as the
    // differential oracle and the path for custom leaves.
    // Column equality is structural over origin-normalized nodes (Spark 4
    // Column.equals), so `hash(probe) == <leaf>(probe)` is true exactly
    // when `hash` IS that leaf applied verbatim — any wrapper (concat,
    // upper, salt) compares unequal and keeps the composed path.
    val probe = col("__wfp_probe__")
    val fastLeaf: Option[Boolean] =
      try {
        val h = hash(probe)
        if (h == graft.ops.Sketch.portableHash(probe)) Some(false)
        else if (h == xxhash64(probe)) Some(true)
        else None
      } catch { case _: Throwable => None }
    fastLeaf match {
      case Some(xx) =>
        return df.select(col(idCol),
            explode(shim.columnOf(graft.plans.WinnowFps(
              shim.exprOf(col(textCol)), n, w, xx))).as("__wf"))
          .select(col(idCol), col("__wf.pos").as("pos"),
            col("__wf.fp").as("fp"))
      case None => ()
    }
    // The per-doc positional gram-hash array is a pure function of the
    // doc's own text — built MAP-SIDE. (The old shape posexploded one row
    // per gram and immediately re-grouped per doc with
    // collect_list+sort_array: a full exchange of every gram hash in the
    // corpus that reassembled exactly the array the transform below
    // produces directly — sort_array over unique __pos restores token
    // order, which IS the construction order.) Same (__pos int, __gk
    // long) structs, same <n-token empty-array contract as
    // gramOccurrences, so the selection arithmetic below is untouched.
    val toks = TextFns.tokens(col(textCol))
    val gArr = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => struct((i - 1).cast("int").as("__pos"),
            hash(concat_ws(" ", slice(toks, i, lit(n)))).as("__gk"))))
      .otherwise(array().cast("array<struct<__pos:int,__gk:bigint>>"))
    val grams = df.select(col(idCol).as("__id"), gArr.as("__g"))
    val hs = transform(col("__g"), _.getField("__gk"))
    val nW = size(col("__g")) - w + 1
    val sel = when(nW >= 1,
      array_distinct(transform(sequence(lit(1), nW), i => {
        val win = slice(hs, i, lit(w))
        val mn = array_min(win)
        // rightmost minimal: first position in the reversed window
        val p = i - 1 + (lit(w) - array_position(reverse(win), mn))
        p.cast("int")
      })))
      // short docs: one degenerate window — same rightmost-minimal rule
      .otherwise(when(size(col("__g")) >= 1,
        array((size(col("__g")) -
          array_position(reverse(hs), array_min(hs))).cast("int")))
        .otherwise(array().cast("array<int>")))
    grams.select(col("__id").as(idCol), explode(sel).as("__i"),
        col("__g"))
      .select(col(idCol),
        element_at(col("__g"), col("__i") + 1).getField("__pos")
          .cast("long").as("pos"),
        element_at(col("__g"), col("__i") + 1).getField("__gk").as("fp"))
  }

  /** Candidate near-dup pairs by shared winnowed fingerprints: doc pairs
    * sharing >= minShared selected fingerprints, with the shared count.
    * The usual shuffle-bounded shape: explode selected fps (already a
    * ~2/(w+1) sample of grams), self-join on fp, count per pair. maxDf
    * drops stop-fingerprints (boilerplate) before the join, like
    * [[ngramJaccardPairs]]'s stop-shingle guard.
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 5, w: Int = 4, minShared: Long = 2,
                  maxDf: Long = 1000,
                  hash: Column => Column = xxhash64(_)): DataFrame = {
    // the fp table feeds the df-guard aggregate AND both join sides — pin
    // it (registry cache) so the selection pass runs once, not three times
    val fps = trackCache(winnowFingerprints(df, idCol, textCol, n, w, hash)
      .select(col(idCol).as("__id"), col("fp")).distinct())
    val keep = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select("fp")
    val slim = fps.join(keep, "fp")
    slim.select(col("__id").as("id_a"), col("fp"))
      .join(slim.select(col("__id").as("id_b"), col("fp")), "fp")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Grade winnow candidate pairs by their LONGEST SHARED TOKEN RUN — the
    * verification pass MOSS applies after fingerprint matching (Schleimer,
    * Wilkerson & Aiken, SIGMOD 2003 §5: matched fingerprints only witness
    * shared grams; contiguity is what distinguishes a lifted passage from
    * scattered idiom overlap). For each candidate pair the full gram
    * occurrence lists of BOTH docs join on gram hash; a run of L
    * consecutive matching grams on one alignment diagonal
    * (pos_a − pos_b constant) is a shared span of L + n − 1 tokens.
    * Returns pairs + `run_tokens` (longest such span; the caller filters
    * by whatever threshold grades "verified").
    *
    * Scale shape: everything is pair-scoped — occurrences are semi-joined
    * to the candidate docs FIRST, so the corpus-wide gram table never
    * self-joins; per-(pair, diagonal) position lists are bounded by doc
    * length (collect_set, like the winnow selection's per-doc lists). The
    * run scan is an `aggregate` HOF over each sorted list — per-pair work,
    * no window, no shuffle beyond the candidate join.
    */
  def winnowVerifyPairs(df: DataFrame, idCol: String, textCol: String,
                        pairs: DataFrame, n: Int = 5,
                        hash: Column => Column = xxhash64(_)): DataFrame = {
    val occ = gramOccurrences(df, idCol, textCol, n, hash)
    val ids = pairs.select(col("id_a").as("__id"))
      .unionByName(pairs.select(col("id_b").as("__id"))).distinct()
    val o = occ.join(ids, Seq("__id"), "left_semi")
    // pair ⋈ A-occurrences ⋈ B-occurrences, gram-hash equality on the B
    // join: candidate volume is Σ_pairs |grams(a)| — never corpus²
    val matches = pairs
      .join(o.select(col("__id").as("id_a"), col("__pos").as("__pa"),
        col("__gk")), "id_a")
      .join(o.select(col("__id").as("id_b"), col("__pos").as("__pb"),
        col("__gk")), Seq("id_b", "__gk"))
    val runs = matches
      .groupBy(col("id_a"), col("id_b"),
        (col("__pa") - col("__pb")).as("__d"))
      .agg(sort_array(collect_set(col("__pa").cast("long"))).as("__ps"))
      .select(col("id_a"), col("id_b"), aggregate(col("__ps"),
        struct(lit(0L).as("best"), lit(0L).as("cur"),
          lit(Long.MinValue).as("prev")),
        (acc, x) => {
          val cur = when(x === acc.getField("prev") + 1,
            acc.getField("cur") + 1).otherwise(lit(1L))
          struct(greatest(acc.getField("best"), cur).as("best"),
            cur.as("cur"), x.as("prev"))
        },
        acc => acc.getField("best")).as("__run"))
      .groupBy("id_a", "id_b")
      .agg(max(col("__run")).as("__maxrun"))
    pairs.join(runs, Seq("id_a", "id_b"), "left")
      .withColumn("run_tokens",
        when(col("__maxrun").isNull, lit(0L))
          .otherwise(col("__maxrun") + (n - 1)))
      .drop("__maxrun")
  }

  // -- persisted winnow-fingerprint index (bucket-pruned probes) -----------

  /** The two persistable winnow gram-hash conventions — a pluggable
    * `Column => Column` cannot ride a parquet meta row, so the persisted
    * index records WHICH of these it was built with and the probe
    * recomputes with the same one. `portable=true` is the 60-bit md5
    * leaf (cross-engine / oracle-reproducible); false is xxhash64
    * (faster, engine-native). */
  private[graft] def winnowHashOf(portable: Boolean): Column => Column =
    // the portable leaf is Sketch.portableHash's codegen'd digest-direct
    // form — value-identical to conv(substring(md5(c),1,15),16,10)
    if (portable) (c: Column) => graft.ops.Sketch.portableHash(c)
    else (c: Column) => xxhash64(c)

  private def fpPart(parts: Int): Column =
    pmod(col("fp"), lit(parts.toLong)).cast("int")

  /** The winnow index meta row, read with its EXPLICIT schema — schema
    * inference over the meta file is a one-job footer read per open, and
    * every ingest/probe/compact opens the meta. All winnow metas carry
    * all five fields ([[buildWinnowIndex]] has always written them). */
  private def readWinnowMeta(spark: org.apache.spark.sql.SparkSession,
                             path: String): org.apache.spark.sql.Row = {
    import org.apache.spark.sql.types._
    spark.read.schema(StructType(Seq(
        StructField("n", IntegerType), StructField("w", IntegerType),
        StructField("parts", IntegerType),
        StructField("portable", BooleanType),
        StructField("max_df", LongType))))
      .parquet(s"$path/meta").head()
  }

  /** PERSIST a corpus's winnowed fingerprints as a probe-ready index:
    * `<path>/fps/fp_part=H` holds DISTINCT (fp, id) rows bucketed by
    * `pmod(fp, parts)` — all rows of one fingerprint land in ONE
    * partition, so a probe that prunes to its own fps' partitions still
    * sees every id it can collide with ([[lshPairsBetweenBanded]]'s
    * `bkt_part=` discipline applied to winnow fps). `<path>/meta`
    * records (n, w, parts, portable, max_df) and is written LAST — the
    * commit point: a crashed build leaves no meta and the open fails
    * loudly asking for a rebuild, never serves a partial fp table.
    *
    * `maxDf > 0` drops stop-fingerprints (boilerplate shared by more
    * than maxDf docs) at BUILD time — the [[winnowPairs]] guard moved
    * into the index so every probe inherits it for free.
    *
    * At 100 TB: the fp table is the ~2/(w+1) winnow sample of the gram
    * table, bucketed; each micro-batch probe reads
    * ≤ min(|batch fps|, parts)/parts of it instead of the whole corpus
    * ([[graft.streaming.StreamVerbs.streamingWinnowCandidatesIndexed]]
    * was the motivating consumer — its flat form re-joined the FULL
    * corpus fp table every micro-batch). */
  def buildWinnowIndex(spark: org.apache.spark.sql.SparkSession,
                       docs: DataFrame, idCol: String, textCol: String,
                       path: String, n: Int = 5, w: Int = 4,
                       parts: Int = 64, portable: Boolean = false,
                       maxDf: Long = 0L): Unit = {
    require(parts >= 1, "parts must be >= 1")
    // REBUILD over an existing index: retract the OLD meta before the fps
    // overwrite, so the meta-LAST commit contract holds for rebuilds too —
    // a crash mid-fps-write leaves a meta-less index that fails loudly on
    // open, never old-parameter meta over new-parameter fps (a parts or
    // hash-convention change under stale meta would make fp_part pruning
    // silently MISS candidates instead of failing)
    new org.apache.hadoop.fs.Path(s"$path/meta")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(s"$path/meta"), true)
    val fps0 = winnowFingerprints(docs, idCol, textCol, n, w,
        winnowHashOf(portable))
      .select(col(idCol).as("id"), col("fp")).distinct()
    val fps = if (maxDf > 0L) {
      val pinned = trackCache(fps0)
      pinned.join(pinned.groupBy("fp").agg(count(lit(1)).as("__df"))
        .where(col("__df") <= maxDf).select("fp"), "fp")
    } else fps0
    fps.withColumn("batch_seq", lit(0L))
      .withColumn("fp_part", fpPart(parts))
      // one file per partition dir, not one per shuffle task per dir
      .repartition(col("fp_part"))
      .write.partitionBy("batch_seq", "fp_part").mode("overwrite")
      .parquet(s"$path/fps")
    // meta LAST — the commit point
    spark.range(1).select(lit(n).as("n"), lit(w).as("w"),
        lit(parts).as("parts"), lit(portable).as("portable"),
        lit(maxDf).as("max_df"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** APPEND new documents' winnowed fingerprints to a persisted
    * [[buildWinnowIndex]] — the corpus GROWS, and re-deriving every
    * standing document's fingerprints from text per growth step is the
    * cost this avoids. The new docs' fps (computed with the index's
    * recorded convention) are anti-joined against the standing (id, fp)
    * rows — re-appending an already-indexed slice is a no-op, keeping
    * probe counts exact — and land as ONE new
    * `batch_seq=K/fp_part=H` partition set via staging + atomic rename
    * (the minhash band-layout discipline): standing partitions are
    * never rewritten, the rename is the commit point, a crashed append
    * leaves only a staging dir swept at the next append. Probe output
    * after the append is identical to an index built on the union from
    * scratch (PipelineSpec pins it; q_winnow_indexed_append shares
    * q_winnow_indexed's oracle VERBATIM).
    *
    * Refused (loudly) on indexes built with `maxDf > 0`: the stop-fp
    * guard drops rows at build time, so fps already discarded cannot be
    * re-counted when an append pushes their document frequency over the
    * cut — append-equality would silently break. Guarded indexes
    * rebuild instead.
    *
    * SINGLE-WRITER, machine-enforced ([[graft.ops.Lease]]): two
    * concurrent appends would both list the same `nextSeq` and the
    * second's delete+rename would silently REPLACE the first's landed
    * partition — data loss, not corruption — so the append holds the
    * index's `_MAINTENANCE` lease (with heartbeat) for its duration and
    * a concurrent append or compaction is refused loudly naming the
    * holder. */
  def appendToWinnowIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, docs: DataFrame, idCol: String,
                          textCol: String): Unit =
    graft.ops.Lease.withLease(spark, path, "appendToWinnowIndex") {
      appendToWinnowIndexLocked(spark, path, docs, idCol, textCol)
    }

  private def appendToWinnowIndexLocked(
      spark: org.apache.spark.sql.SparkSession,
      path: String, docs: DataFrame, idCol: String,
      textCol: String, metaRow: org.apache.spark.sql.Row = null,
      precomputedFps: DataFrame = null,
      touchedParts: Seq[Int] = null,
      standingDf: DataFrame = null): Unit = {
    import org.apache.hadoop.fs.Path
    graft.ops.CarryState.recoverDir(spark, s"$path/fps")
    // callers inside one lease hold (winnowIngest) already read meta —
    // re-reading it here would be one extra driver job per ingest
    val m = if (metaRow != null) metaRow
      else readWinnowMeta(spark, path)
    require(m.getAs[Long]("max_df") <= 0L,
      "appendToWinnowIndex: this index was built with maxDf > 0 (stop-" +
        "fp rows were dropped at build time), so an append cannot " +
        "reproduce build-on-the-union semantics — rebuild the index " +
        "over the grown corpus instead")
    val (n, w, parts) = (m.getAs[Int]("n"), m.getAs[Int]("w"),
      m.getAs[Int]("parts"))
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$path/fps_staging"), true)
    // `standingDf`: callers inside one lease hold (winnowIngest's probe)
    // already opened the fps table — re-opening it here would re-list the
    // partition tree per ingest (one extra driver/listing job)
    val standing0 = if (standingDf != null) standingDf
      else spark.read.parquet(s"$path/fps")
    val nextSeq = fs.listStatus(new Path(s"$path/fps")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch_seq="))
      .map(_.stripPrefix("batch_seq=").toLong)
      .foldLeft(0L)(math.max) + 1
    // `precomputedFps`: the docs' DISTINCT (id, fp) rows under THIS
    // index's recorded convention, when the caller already computed them
    // (winnowIngest's probe did — fingerprints are a pure function of
    // text, so re-deriving them from text here would be a second full
    // shingle+winnow pass over the batch per ingest).
    val docFps = if (precomputedFps != null) precomputedFps
      else winnowFingerprints(docs, idCol, textCol, n, w,
          winnowHashOf(m.getAs[Boolean]("portable")))
        .select(col(idCol).as("id"), col("fp")).distinct()
    // `touchedParts`: a standing row can only anti-join-match a batch row
    // that carries the SAME fp, and every fp of the batch lives in a
    // touched fp_part — so when the caller already collected that set
    // (the probe's pruning handle) the anti-join's standing side prunes
    // to the same partitions instead of scanning the whole fp table.
    val standing = if (touchedParts != null)
      standing0.filter(col("fp_part").isin(touchedParts: _*))
      else standing0
    val fresh = docFps
      .join(standing.select("id", "fp"), Seq("id", "fp"), "left_anti")
    // The anti-join is materialized ONCE, by the staging write itself —
    // the old shape (eager localCheckpoint + isEmpty + write) ran three
    // jobs and pushed every fresh row through the block manager twice.
    // Emptiness (a full replay of an already-indexed slice) is read off
    // the staged directory: a partitioned write emits a fp_part= dir iff
    // at least one row landed. The plan-identity staleness the checkpoint
    // guarded against cannot occur — nothing caches this plan, so every
    // call re-reads the standing table as it is on disk.
    val staging = new Path(s"$path/fps_staging/seq_$nextSeq")
    fresh.withColumn("fp_part", fpPart(parts))
      .repartition(col("fp_part"))
      .write.partitionBy("fp_part").mode("overwrite")
      .parquet(staging.toString)
    val hasRows = fs.exists(staging) && fs.listStatus(staging).exists(
      _.getPath.getName.startsWith("fp_part="))
    if (!hasRows) { // full replay of an indexed slice: no-op
      fs.delete(new Path(s"$path/fps_staging"), true)
      return
    }
    val dest = new Path(s"$path/fps/batch_seq=$nextSeq")
    fs.delete(dest, true)
    require(fs.rename(staging, dest),
      s"winnow fp-slice promote failed: $dest")
    fs.delete(new Path(s"$path/fps_staging"), true)
  }

  /** COMPACT a [[buildWinnowIndex]] artifact that has accumulated many
    * [[appendToWinnowIndex]] `batch_seq=` partitions — the
    * [[compactMinhashIndex]] maintenance verb applied to the winnow fp
    * table, keeping append-cadence growth from drowning the pruned
    * probes in parquet listing/footer overhead. Winnow appends carry NO
    * replay evidence (their idempotence is the anti-join against
    * standing (id, fp) rows, which partition layout cannot affect), so
    * ALL partitions collapse into the base `batch_seq=0` — nothing to
    * preserve verbatim. The `fp_part` bucketing is RECOMPUTED from the
    * meta's recorded `parts` in the same pass (every fp stays confined
    * to ONE partition — the pruning invariant survives compaction), and
    * the swap rides [[graft.ops.CarryState.replaceDir]] (staging +
    * marker + rename) under the heartbeated `_MAINTENANCE` lease:
    * probes and appends are refused loudly for the duration, a crashed
    * compaction never corrupts the index, and every reader runs
    * recovery on open. `targetFiles` > 0 additionally bounds the file
    * count via coalesce-by-bucket; 0 keeps one file per bucket dir. */
  def compactWinnowIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String): Unit =
    graft.ops.Lease.withLease(spark, path, "compactWinnowIndex") {
      graft.ops.CarryState.recoverDir(spark, s"$path/fps")
      val m = readWinnowMeta(spark, path)
      val parts = m.getAs[Int]("parts")
      val fps = spark.read.parquet(s"$path/fps")
      val maxSeq = listedMaxSeq(spark, s"$path/fps").getOrElse(
        fps.agg(coalesce(max(col("batch_seq").cast("long")),
          lit(0L))).head().getLong(0))
      if (maxSeq > 0) {
        // the staging write IS the materialization of the union — it
        // reads the old files before replaceDir deletes them
        graft.ops.CarryState.replaceDir(spark, s"$path/fps") { staging =>
          fps.select("id", "fp")
            .withColumn("batch_seq", lit(0L))
            .withColumn("fp_part", fpPart(parts))
            .repartition(col("fp_part"))
            .write.partitionBy("batch_seq", "fp_part").mode("overwrite")
            .parquet(staging)
        }
      }
    }

  /** Winnow near-dup CANDIDATES of a batch against a persisted
    * [[buildWinnowIndex]] — (id_new, id_corpus, n_shared >= minShared).
    * The batch's fps are computed with the index's recorded convention;
    * their `fp_part` keys (≤ `parts` ints, collected driver-side — the
    * DPP handle) prune the standing read to only the partitions a shared
    * fingerprint can live in. Output identical to the flat
    * distinct-fps join (StreamingSpec pins it); the probe reads
    * O(touched partitions), not O(corpus). */
  def winnowCandidatesAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                                   path: String, newDocs: DataFrame,
                                   idCol: String, textCol: String,
                                   minShared: Long = 2L): DataFrame = {
    // refuse loudly while a maintenance writer (append/compaction) holds
    // the lease — a compaction's staged swap deletes the fps dir this
    // probe is about to read
    graft.ops.Lease.check(spark, path, "winnowCandidatesAgainstIndex")
    graft.ops.CarryState.recoverDir(spark, s"$path/fps")
    val m = readWinnowMeta(spark, path)
    val (n, w, parts) = (m.getAs[Int]("n"), m.getAs[Int]("w"),
      m.getAs[Int]("parts"))
    val newFps = scopedCache(
      winnowFingerprints(newDocs, idCol, textCol, n, w,
          winnowHashOf(m.getAs[Boolean]("portable")))
        .select(col(idCol).as("id_new"), col("fp")).distinct()
        .withColumn("fp_part", fpPart(parts)))
    val touched = newFps.select("fp_part").distinct()
      .collect().map(_.getInt(0)).toSeq
    val standing = spark.read.parquet(s"$path/fps")
      .filter(col("fp_part").isin(touched: _*))
      .select(col("id").as("id_corpus"), col("fp"))
    newFps.select("id_new", "fp").join(standing, "fp")
      .groupBy("id_new", "id_corpus")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Dedup-on-ingest against a persisted [[buildWinnowIndex]] WITH index
    * growth — the winnow-family sibling of [[ingestDedup]]: a batch doc
    * is DROPPED when it shares >= `minShared` winnowed fingerprints with
    * any STANDING corpus doc whose id is not in the arriving batch
    * itself, the survivors' fingerprints append as one new `batch_seq=`
    * partition ([[appendToWinnowIndex]]'s staging+rename discipline) so
    * later batches dedup against everything admitted, and the admitted
    * rows are emitted. Docs too short to fingerprint pass through by
    * contract; `maxDf`-guarded indexes refuse loudly (the append
    * contract). Holds the `_MAINTENANCE` lease across probe+append —
    * one writer, and concurrent probes/appends are refused naming it.
    *
    * REPLAY IS RE-DERIVED, not recorded: the probe EXCLUDES standing
    * corpus ids that appear in the arriving batch, so a redelivered
    * batch's own landed fingerprints can never block it — the rerun
    * sees exactly the collision set the original saw (admitted ids are
    * a subset of batch ids and thus excluded; dropped docs never
    * landed), emits the identical survivor set, and the fp append
    * anti-joins to a no-op. No evidence columns, no recorded survivor
    * set, and the derivation survives [[compactWinnowIndex]] (the fold
    * preserves (id, fp) rows exactly). The one contract shared with
    * [[ingestDedup]]'s window-1: a redelivery is only exact while no
    * LATER batch has admitted content colliding with it.
    *
    * INTRA-BATCH near-dups admit TOGETHER by design — a batch is exempt
    * from its own collisions, which is precisely what makes replays
    * exact without evidence. Compose [[dedupWinnow]]/[[resolveWinnow]]
    * upstream of the ingest when within-batch precision matters; the
    * admitted set then both is intra-clean and stays replay-exact.
    */
  def winnowIngest(spark: org.apache.spark.sql.SparkSession, path: String,
                   batch: DataFrame, idCol: String, textCol: String,
                   minShared: Long = 2L): DataFrame =
    graft.ops.Lease.withLease(spark, path, "winnowIngest") {
      graft.ops.CarryState.recoverDir(spark, s"$path/fps")
      val m = readWinnowMeta(spark, path)
      require(m.getAs[Long]("max_df") <= 0L,
        "winnowIngest: this index was built with maxDf > 0 (stop-" +
          "fingerprints were dropped at build time), so admitted batches " +
          "cannot append equal fps — rebuild without maxDf to ingest")
      val (n, w, parts) = (m.getAs[Int]("n"), m.getAs[Int]("w"),
        m.getAs[Int]("parts"))
      val bfps = scopedCache(
        winnowFingerprints(batch, idCol, textCol, n, w,
            winnowHashOf(m.getAs[Boolean]("portable")))
          .select(col(idCol).as("id_new"), col("fp")).distinct()
          .withColumn("fp_part", fpPart(parts)))
      val touched = bfps.select("fp_part").distinct()
        .collect().map(_.getInt(0)).toSeq
      val batchIds = batch.select(col(idCol).as("id")).distinct()
      // ONE open of the fps table per ingest, shared by the probe and the
      // append's anti-join (the second spark.read.parquet re-listed the
      // whole partition tree — one extra driver/listing job per ingest)
      val standingBase = spark.read.parquet(s"$path/fps")
      val standing = standingBase
        .filter(col("fp_part").isin(touched: _*))
        .select(col("id"), col("fp"))
        // the replay-exactness exclusion: a batch is never blocked by
        // ids it carries itself (its own landed fps on a redelivery)
        .join(batchIds, Seq("id"), "left_anti")
      val dropped = bfps.select("id_new", "fp").join(standing, "fp")
        .groupBy("id_new", "id")
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= minShared)
        .select(col("id_new").as(idCol)).distinct()
      val admitted = batch.join(dropped, Seq(idCol), "left_anti")
      // the admitted docs' fps are a SUBSET of the probe's cached bfps
      // (fingerprints are a pure function of text) — hand them to the
      // append instead of letting it re-derive them from text, which
      // doubled the per-ingest shingle+winnow work
      val admittedFps = bfps.select(col("id_new").as("id"), col("fp"))
        .join(admitted.select(col(idCol).as("id")).distinct(),
          Seq("id"), "left_semi")
      appendToWinnowIndexLocked(spark, path, admitted, idCol, textCol,
        metaRow = m, precomputedFps = admittedFps,
        touchedParts = touched, standingDf = standingBase)
      admitted
    }

  // -- exact substring-span dedup (Lee et al. 2022, "Deduplicating Training
  //    Data Makes Language Models Better") ---------------------------------
  // The paper's ExactSubstr pass finds every >=N-token span that occurs
  // more than once in the corpus and removes the repeats. Their single-node
  // tool builds a suffix array; the shuffle-bounded Spark formulation is
  // n-gram positional inventory -> corpus-wide occurrence counts -> merged
  // coverage intervals per doc. A span of L >= n duplicated tokens is
  // exactly a run of L-n+1 duplicated n-grams, so interval-merging the
  // duplicated gram starts reconstructs the paper's spans.

  /** One row per n-token shingle occurrence: (__id, __pos, __gk) with
    * 0-based token start position. Docs shorter than n tokens emit no rows
    * (callers re-join stats onto the full doc list). Only 64-bit gram
    * hashes shuffle; `hash` is pluggable so oracle queries can substitute a
    * SQL-portable md5 leaf.
    */
  private def gramOccurrences(df: DataFrame, idCol: String, textCol: String,
                              n: Int, hash: Column => Column): DataFrame = {
    val w = TextFns.tokens(col(textCol))
    df.select(col(idCol).as("__id"), w.as("__w"))
      .select(col("__id"),
        posexplode(when(size(col("__w")) >= n,
          transform(sequence(lit(1), size(col("__w")) - n + 1),
            i => hash(concat_ws(" ", slice(col("__w"), i, lit(n))))))
          .otherwise(array().cast("array<long>"))).as(Seq("__pos", "__gk")))
  }

  /** Start positions of corpus-duplicated n-grams, per doc, sorted:
    * (__id, __starts). The count aggregate and the occurrence join share
    * the same gram-hash shuffle key (AQE reuses the exchange); per-doc
    * collect_list is bounded by doc length — nothing corpus-sized
    * concentrates anywhere.
    */
  /** The corpus's duplicated-gram set: 64-bit hashes of every n-token
    * shingle occurring >= minCount times. Persist this table to scrub
    * later-arriving docs against the frozen corpus (the `Against` forms
    * below and the streaming sibling) without recounting.
    */
  def corpusDupGrams(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 8, minCount: Int = 2,
                     hash: Column => Column = xxhash64(_)): DataFrame =
    gramOccurrences(df, idCol, textCol, n, hash)
      .groupBy("__gk").agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount)
      .select(col("__gk").as("gram_hash"))

  private def startsAgainst(df: DataFrame, idCol: String, textCol: String,
                            dupGrams: DataFrame, n: Int,
                            hash: Column => Column): DataFrame =
    gramOccurrences(df, idCol, textCol, n, hash)
      .join(dupGrams.select(col("gram_hash").as("__gk")), "__gk")
      .groupBy("__id")
      .agg(sort_array(collect_list(col("__pos"))).as("__starts"))

  private def dupGramStarts(df: DataFrame, idCol: String, textCol: String,
                            n: Int, minCount: Int,
                            hash: Column => Column): DataFrame =
    // self-referential case: count and probe share the gram-hash shuffle
    startsAgainst(df, idCol, textCol,
      corpusDupGrams(df, idCol, textCol, n, minCount, hash), n, hash)

  /** Per-doc duplicated-span statistics: token count, number of tokens
    * covered by some corpus-duplicated n-gram, number of merged duplicated
    * spans, and the duplicated fraction in basis points (integer floor —
    * float-free). Every doc of `df` appears, zeros for clean docs.
    *
    * The interval merge is a single `aggregate` fold over the sorted start
    * positions — exact integer arithmetic inside codegen, no UDF: a start
    * past the running end opens a span (+n covered tokens); an overlapping
    * start extends it by (start+n - end).
    */
  def duplicateSpanStats(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 8, minCount: Int = 2,
                         hash: Column => Column = xxhash64(_)): DataFrame = {
    val starts = dupGramStarts(df, idCol, textCol, n, minCount, hash)
    val folded = aggregate(
      col("__starts"),
      struct(lit(0L).as("tok"), lit(0L).as("spans"), lit(Long.MinValue).as("end")),
      (acc, p) => {
        val pe = p.cast("long") + n
        // strict >: a start AT the running end is adjacent — same span
        when(p.cast("long") > acc.getField("end"),
          struct((acc.getField("tok") + n).as("tok"),
                 (acc.getField("spans") + 1).as("spans"), pe.as("end")))
          .otherwise(
            struct((acc.getField("tok") + pe - acc.getField("end")).as("tok"),
                   acc.getField("spans").as("spans"), pe.as("end")))
      })
    val stats = starts.select(col("__id"),
      folded.getField("tok").as("__dup_tok"),
      folded.getField("spans").as("__dup_spans"))
    df.select(col(idCol),
        size(TextFns.tokens(col(textCol))).cast("long").as("n_tok"))
      .join(stats, col(idCol) === col("__id"), "left")
      .select(col(idCol), col("n_tok"),
        coalesce(col("__dup_tok"), lit(0L)).as("dup_tok"),
        coalesce(col("__dup_spans"), lit(0L)).as("dup_spans"))
      .withColumn("dup_bp", expr("(10000L * dup_tok) div n_tok"))
  }

  /** Scrub every corpus-duplicated >=n-token span: tokens covered by a
    * duplicated n-gram are dropped, the rest rejoined with single spaces
    * (masking operates in normalized token space, like the paper's
    * token-id formulation). All non-text columns pass through; clean docs
    * keep their (normalized) text.
    */
  def maskDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 8, minCount: Int = 2,
                         hash: Column => Column = xxhash64(_)): DataFrame =
    maskWithStarts(df, idCol, textCol,
      dupGramStarts(df, idCol, textCol, n, minCount, hash), n)

  /** [[maskDuplicateSpans]] against a PERSISTED [[corpusDupGrams]] table:
    * scrub arriving docs' spans that the frozen corpus already knows are
    * duplicated (within-batch repeats are invisible by design — recount to
    * refresh the gram table). This is the form the streaming
    * scrub-on-ingest sibling reuses per micro-batch; join strategy is left
    * to stats (the gram table may be far beyond broadcast size).
    */
  def maskDuplicateSpansAgainst(df: DataFrame, idCol: String, textCol: String,
                                dupGrams: DataFrame, n: Int = 8,
                                hash: Column => Column = xxhash64(_)): DataFrame =
    maskWithStarts(df, idCol, textCol,
      startsAgainst(df, idCol, textCol, dupGrams, n, hash), n)

  private def maskWithStarts(df: DataFrame, idCol: String, textCol: String,
                             starts: DataFrame, n: Int): DataFrame = {
    val joined = df.join(starts, col(idCol) === col("__id"), "left")
    val covered = array_distinct(flatten(transform(
      coalesce(col("__starts"), array().cast("array<int>")),
      s => sequence(s, s + n - 1))))
    val w = TextFns.tokens(col(textCol))
    val idx = sequence(lit(0), size(w) - 1)
    val kept = filter(
      zip_with(w, idx, (t, i) => struct(t.as("t"), i.as("i"))),
      s => !array_contains(covered, s.getField("i")))
    joined
      .withColumn(textCol, array_join(transform(kept, _.getField("t")), " "))
      .drop("__id", "__starts")
  }
}
