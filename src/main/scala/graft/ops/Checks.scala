package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations for pipeline gates (the dbt-test / dplyr
  * `validate` role; extension — the reference has no check layer). Each
  * check returns VIOLATION COUNTS, not booleans, so a gate can log, alert
  * on a threshold, or hard-fail; and each is a single aggregate (or one
  * aggregate per key set for uniqueness), never a collect of offending
  * rows — at 100 TB the offender dump is a separate filtered write the
  * caller runs only after a nonzero count.
  */
object Checks {

  /** Rows whose `cols` tuple occurs more than once (total occurrences in
    * excess of one per distinct tuple; NULL-containing tuples count like
    * any other — SQL distinctness). One groupBy pass.
    */
  def duplicateKeyCount(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
      // coalesce: sum over ZERO groups (empty input) is NULL, which would
      // make a `duplicate_rows === 0` gate fail and a `> 0` alarm silently
      // pass on empty data
      .agg(coalesce(sum("__n") - count(lit(1)), lit(0L))
        .cast("long").as("duplicate_rows"))

  /** NULL count per named column, one pass, one output row. */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      sum(when(col(cols.head).isNull, 1L).otherwise(0L)).as(s"${cols.head}_nulls"),
      cols.tail.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls")): _*)

  /** Rows where `c` falls outside [lo, hi] (NULLs are not violations —
    * pair with [[nullCounts]]). */
  def outOfRangeCount(df: DataFrame, c: Column, lo: Column, hi: Column): DataFrame =
    df.agg(sum(when(c.isNotNull && (c < lo || c > hi), 1L).otherwise(0L))
      .cast("long").as("out_of_range"))

  /** Referential integrity: rows of `child` whose `childKey` has no match
    * in `parent.parentKey` (NULL child keys are not violations, matching
    * SQL FK semantics). Plans as an aggregate over a left anti join —
    * broadcast when the parent's distinct keys are small.
    */
  def orphanCount(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame =
    child.where(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).cast("long").as("orphans"))

  /** Shuffle-key skew report — run BEFORE committing a partition/join key
    * at scale: one row describing the key's count distribution.
    *   n_keys, n_rows        — distinct tuples / total rows
    *   max_share             — hottest key's fraction (the straggler bound:
    *                           no salting/AQE plan beats 1/max_share tasks)
    *   topk_share            — fraction held by the `topK` hottest keys
    *   gini                  — 0 uniform → 1 one hot key
    * All ratios are one double division over exact int64 sums, so the
    * report replays bit-identically on any engine. NULL keys count as a
    * key (they hash to one partition like any other value — exactly the
    * skew this measures).
    *
    * Scale shape: one count aggregate over the data; everything after runs
    * on the per-key count table, ranked by the two-phase
    * [[Scale.globalRowNumber]] (no single-reducer window even at billions
    * of keys). Gini uses the rank identity
    * G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) with x ascending.
    */
  def keySkew(df: DataFrame, keys: Seq[String], topK: Int = 10): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(topK > 0, "topK must be positive")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cnt"))
    val ranked = Scale.globalRowNumber(counts,
      col("__cnt") +: keys.map(col), "__i")
    val totals = ranked.agg(count(lit(1)).as("__n"), sum("__cnt").as("__tot"))
    ranked.crossJoin(broadcast(totals))
      .agg(
        max("__n").as("n_keys"),
        max("__tot").as("n_rows"),
        (max("__cnt").cast("double") / max("__tot")).as("max_share"),
        (sum(when(col("__i") > col("__n") - topK, col("__cnt"))
          .otherwise(lit(0L))).cast("double") / max("__tot")).as("topk_share"),
        // Σ i·cnt reaches ~n_keys·n_rows — far past int64 on big data — so
        // the rank sum and the n·tot denominator accumulate in exact
        // decimal(38,0) and only the final ratio rounds to double
        ((lit(2L) * sum(col("__i").cast("decimal(38,0)") * col("__cnt"))
          - (max("__n") + 1L).cast("decimal(38,0)") * max("__tot"))
          .cast("double")
          / (max("__n").cast("decimal(38,0)") * max("__tot")).cast("double"))
          .as("gini"))
  }

  /** One-row "dataset card" for a document corpus — the summary a training
    * pipeline prints before shipping a crawl snapshot: document and token
    * totals, mean Gopher-style quality, the dominant language (argmax with
    * a deterministic tie to the larger code), and the exact duplicate
    * count (normalized-md5 fingerprints). Columns: n_docs, n_tokens,
    * mean_quality, top_lang, top_lang_docs, dup_docs.
    *
    * Scale shape: one projection pass derives every per-doc signal
    * (map-only, codegen'd) and is PINNED (registry cache) so the three
    * independent aggregates — a global scalar fold, a language mode over
    * ≤ |langs| rows, and a fingerprint distinct count — read the narrow
    * (~40 B/row) signal relation instead of re-running the text kernels
    * three times over the corpus; results crossJoin as broadcast single
    * rows. Nothing collects, nothing is quadratic. Release the pin with
    * [[graft.ml.Dedup.unpersistIntermediates]] after consuming the card.
    */
  def corpusReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.text.TextFns
    val t = col(textCol)
    val base = graft.ml.Dedup.trackCache(df.select(col(idCol),
      TextFns.tokenCount(t).cast("long").as("__ntok"),
      TextFns.qualityScore(t).as("__q"),
      TextFns.langId(t).as("__lang"),
      TextFns.fingerprint(t).as("__fp")))
    val main = base.agg(
      count(lit(1)).as("n_docs"),
      sum("__ntok").as("n_tokens"),
      round(avg("__q"), 4).as("mean_quality"))
    val topLang = base.groupBy("__lang").agg(count(lit(1)).as("__c"))
      .agg(max(struct(col("__c"), col("__lang"))).as("__m"))
      .select(col("__m.__lang").as("top_lang"),
        col("__m.__c").as("top_lang_docs"))
    val dups = base.agg(
      (count(lit(1)) - countDistinct(col("__fp"))).cast("long").as("dup_docs"))
    main.crossJoin(broadcast(topLang)).crossJoin(broadcast(dups))
  }

  /** Pair-set retrieval metrics: grade a CANDIDATE pair set (an LSH /
    * banding / blocking heuristic's output) against a ground-truth pair
    * set — one row (n_pred, n_truth, n_tp, precision, recall, f1), the
    * standard evaluation for dedup/linkage candidate generators. Pairs
    * are matched on (id_a, id_b) — pass both sets in the same canonical
    * orientation (id_a < id_b, as every pair generator here emits).
    * Empty sides yield NULL ratios (0/0 has no answer), counts stay 0.
    * Scale shape: two distinct-count aggregates + one equi-join count;
    * f1 = 2·tp/(|pred|+|truth|) is computed from the exact integers in
    * one division (no P/R intermediate rounding).
    */
  def pairMetrics(pred: DataFrame, truth: DataFrame): DataFrame = {
    // each set feeds its own count AND the intersection join: pin the
    // (small, two-column) distinct pair sets so the generators upstream —
    // often whole LSH pipelines — run once, not twice
    val p = graft.ml.Dedup.trackCache(pred.select("id_a", "id_b").distinct())
    val t = graft.ml.Dedup.trackCache(truth.select("id_a", "id_b").distinct())
    val tp = p.join(t, Seq("id_a", "id_b"))
    p.agg(count(lit(1)).as("n_pred"))
      .crossJoin(broadcast(t.agg(count(lit(1)).as("n_truth"))))
      .crossJoin(broadcast(tp.agg(count(lit(1)).as("n_tp"))))
      .select(col("n_pred"), col("n_truth"), col("n_tp"),
        when(col("n_pred") > 0, col("n_tp") * lit(1.0) / col("n_pred"))
          .as("precision"),
        when(col("n_truth") > 0, col("n_tp") * lit(1.0) / col("n_truth"))
          .as("recall"),
        when(col("n_pred") + col("n_truth") > 0,
          lit(2.0) * col("n_tp") / (col("n_pred") + col("n_truth")))
          .as("f1"))
  }

  /** Exact cross-source content-overlap matrix — the corpus-composition
    * diagnostic run before mixing N sources (how much of source A is
    * literally inside source B decides dedup order and mixture weights;
    * the sketched single-pair sibling is [[Scale.distinctOverlap]]):
    * one row per unordered source pair (src_a < src_b) with
    *
    *   n_a / n_b    — each side's DISTINCT content fingerprints,
    *   n_shared     — fingerprints present in both,
    *   jaccard      — n_shared / (n_a + n_b − n_shared), one division.
    *
    * Content identity is the portable md5 of `contentCol`, so the whole
    * matrix replays in the oracle (q_source_overlap). Scale shape: one
    * distinct (fp, source) projection — only hashes shuffle, never text —
    * then a self equi-join ON fp whose per-key fan-out is bounded by the
    * SOURCE COUNT (a fingerprint appears at most once per source after
    * the distinct), so the join output is ≤ |sources|²/2 rows per
    * fingerprint — never a hot-key blowup; totals ride in as a broadcast
    * |sources|-row aggregate.
    */
  def contentOverlapMatrix(df: DataFrame, sourceCol: String,
                           contentCol: String): DataFrame = {
    val fps = graft.ml.Dedup.trackCache(
      df.select(md5(col(contentCol).cast("string")).as("fp"),
        col(sourceCol).cast("string").as("src")).distinct())
    val totals = fps.groupBy("src").agg(count(lit(1)).as("n"))
    val shared = fps.as("x")
      .join(fps.as("y"), Seq("fp"))
      .where(col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("src_a"), col("y.src").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(totals.select(col("src").as("src_a"),
        col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(totals.select(col("src").as("src_b"),
        col("n").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        round(col("n_shared") /
          (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
  }

  /** One-row join pre-flight: BEFORE running a big equi-join, estimate its
    * output size from two count-min sketches (the CM inner product,
    * [[Sketch.countMinJoinSize]]) and profile each side's key skew — then
    * recommend a strategy:
    *   'broadcast'       — the smaller side fits the broadcast budget
    *   'salted_shuffle'  — a hot key holds more than `hotShare` of a side
    *                       (one reducer would own that share of the work)
    *   'shuffle'         — plain hash-partitioned join
    * Columns: n_a, n_b, est_join_rows, max_share_a, max_share_b, strategy.
    * Everything is sketch- or aggregate-sized: the advisor never joins,
    * sorts, or collects the data — two count aggregates + two bounded
    * sketches, so it costs a scan per side at any scale. Deterministic
    * thresholds over exact counts / identically-computed doubles: the
    * whole recommendation replays in the q_join_advisor oracle.
    * [[graft.ops.Scale.adaptiveJoin]] consumes the recommendation and
    * executes the chosen strategy.
    */
  def joinAdvisor(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
                  width: Int = 1024, depth: Int = 3,
                  broadcastRows: Long = 1000000L,
                  hotShare: Double = 0.2): DataFrame = {
    def profile(df: DataFrame, key: Column, n: String, ms: String) =
      df.groupBy(key.as("__k")).agg(count(lit(1)).as("__c"))
        .agg(sum("__c").cast("long").as(n),
          (max("__c").cast("double") / sum("__c").cast("long")).as(ms))
    val est = Sketch.countMinJoinSize(
      Sketch.countMin(a, aKey, width, depth),
      Sketch.countMin(b, bKey, width, depth), depth)
      .withColumnRenamed("est", "est_join_rows")
    profile(a, aKey, "n_a", "max_share_a")
      .crossJoin(broadcast(profile(b, bKey, "n_b", "max_share_b")))
      .crossJoin(broadcast(est))
      .select(col("n_a"), col("n_b"), col("est_join_rows"),
        col("max_share_a"), col("max_share_b"),
        strategyCol(broadcastRows, hotShare))
  }

  /** The one threshold rule every advisor entry point shares: broadcast if
    * a side fits, salt if a key is hot, else plain shuffle. Kept as a
    * single expression so [[joinAdvisor]] and [[joinAdvisorFromProfiles]]
    * can never drift.
    */
  private def strategyCol(broadcastRows: Long, hotShare: Double): Column =
    when(least(col("n_a"), col("n_b")) <= broadcastRows, "broadcast")
      .when(greatest(col("max_share_a"), col("max_share_b")) > hotShare,
        "salted_shuffle")
      .otherwise("shuffle").as("strategy")

  /** A STANDING per-side join profile — the persist-once artifact that
    * lets repeated production joins skip [[joinAdvisor]]'s per-call scans.
    * One row: (n, max_share, cells, width, depth) where `cells` is the
    * count-min counter table over the key ((d, b, cnt) structs — bounded
    * by depth·width entries, a few KB at any data size), built as a
    * WEIGHTED sketch over the per-key counts so the counters equal
    * [[Sketch.countMin]] over the raw rows exactly, and (width, depth)
    * record the sketch geometry so [[joinAdvisorFromProfiles]] can reject
    * mismatched builds instead of silently minning over incomparable
    * bucket spaces. n/max_share group by the RAW key — exact parity with
    * [[joinAdvisor]]'s inline profile even when distinct key values share
    * a string rendering (the cast happens only inside the cell hash, where
    * [[Sketch.countMin]] casts too). Cost: ONE scan + one keyed
    * aggregate — the same single pass the inline advisor pays per side,
    * but paid once; write the row to parquet next to the table it profiles
    * and feed it to [[joinAdvisorFromProfiles]] /
    * [[graft.ops.Scale.adaptiveJoinFromStats]] at zero marginal scans per
    * join. Refresh when the table changes enough to move the thresholds
    * (counts are exact at build time).
    */
  def joinProfile(df: DataFrame, key: Column,
                  width: Int = 1024, depth: Int = 3): DataFrame = {
    val keyed = df.groupBy(key.as("__k"))
      .agg(count(lit(1)).as("__c"))
    val stats = keyed.agg(sum("__c").cast("long").as("n"),
      (max("__c").cast("double") / sum("__c").cast("long")).as("max_share"))
    val cells = keyed.where(col("__k").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("d"),
        col("__k").cast("string").as("__ks"), col("__c"))
      .groupBy(col("d"),
        pmod(Sketch.portableHash(
          concat(col("d").cast("string"), lit("|"), col("__ks"))),
          lit(width)).as("b"))
      .agg(sum("__c").as("cnt"))
      .agg(collect_list(struct(col("d"), col("b"), col("cnt"))).as("cells"))
    stats.crossJoin(broadcast(cells))
      .withColumn("width", lit(width))
      .withColumn("depth", lit(depth))
  }

  /** [[joinAdvisor]] recomputed from two persisted [[joinProfile]] rows —
    * identical columns, identical thresholds, identical strategy, but the
    * only inputs are the two one-row profile tables: the data tables are
    * never touched. The profiles' recorded (width, depth) must match each
    * other and the `depth` argument — enforced fast against the one-row
    * tables, because counters from different geometries land in different
    * bucket spaces and a mismatched min would be a silently wrong
    * est_join_rows (same contract as [[Sketch.countMinJoinSize]], which
    * also needs `depth` to know when a vanished depth row means 0).
    */
  def joinAdvisorFromProfiles(pa: DataFrame, pb: DataFrame, depth: Int = 3,
                              broadcastRows: Long = 1000000L,
                              hotShare: Double = 0.2): DataFrame = {
    for ((p, side) <- Seq((pa, "A"), (pb, "B")))
      require(p.columns.contains("width") && p.columns.contains("depth"),
        s"join profile $side lacks width/depth columns — rebuild it with " +
          "joinProfile (profiles persisted before round 12 predate the " +
          "geometry record)")
    val Seq(ga, gb) = Seq(pa, pb).map(_.select(
      col("width").cast("int"), col("depth").cast("int")).head())
    require(ga == gb,
      s"join profiles were built with different sketch geometries: " +
        s"A=(width ${ga.getInt(0)}, depth ${ga.getInt(1)}) vs " +
        s"B=(width ${gb.getInt(0)}, depth ${gb.getInt(1)})")
    require(ga.getInt(1) == depth,
      s"depth argument ($depth) must match the profiles' build depth " +
        s"(${ga.getInt(1)})")
    def cellsOf(p: DataFrame) = p.select(explode(col("cells")).as("c"))
      .select(col("c.d").as("d"), col("c.b").as("b"), col("c.cnt").as("cnt"))
    val est = Sketch.countMinJoinSize(cellsOf(pa), cellsOf(pb), depth)
      .withColumnRenamed("est", "est_join_rows")
    pa.select(col("n").as("n_a"), col("max_share").as("max_share_a"))
      .crossJoin(broadcast(
        pb.select(col("n").as("n_b"), col("max_share").as("max_share_b"))))
      .crossJoin(broadcast(est))
      .select(col("n_a"), col("n_b"), col("est_join_rows"),
        col("max_share_a"), col("max_share_b"),
        strategyCol(broadcastRows, hotShare))
  }

  /** All-in-one pipeline gate: one row with every violation count. The
    * independent aggregates stay separate jobs by design — each is a
    * map-side-combinable pass and Spark schedules them concurrently when
    * the caller collects the crossJoined row.
    */
  def gate(df: DataFrame, uniqueKey: Seq[String], notNull: Seq[String]): DataFrame =
    duplicateKeyCount(df, uniqueKey).crossJoin(nullCounts(df, notNull))
}
