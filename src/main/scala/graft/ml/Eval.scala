package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier evaluation at corpus scale — the metrics a quality /
  * language-ID gate ships with before anyone trusts it on 100 TB of
  * crawl: ROC-AUC for score-threshold gates ([[aucBinary]]) and
  * per-class precision / recall / F1 for argmax classifiers
  * ([[prfReport]]). Reference scope: siuba has nothing like this; it
  * sits in the training-data extension layer next to
  * [[graft.text.Classify]] (whose confusion matrix q_nb_confusion these
  * verbs consume and extend).
  *
  * Determinism contract: both metrics are pure count arithmetic — AUC is
  * the tie-corrected Mann–Whitney U statistic over exact (score → pos,
  * neg) counts, PRF reads a confusion relation — with ONE final division
  * each, so they replay bitwise in DuckDB (q_nb_auc / q_nb_prf).
  */
object Eval {

  /** Binary ROC-AUC of a score column against a boolean label — the
    * tie-corrected rank-sum (Mann–Whitney) form:
    *
    *   AUC = [ Σ_s pos_s · (2·neg_below(s) + neg_s) ] / (2 · P · N)
    *
    * i.e. P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), every term an exact
    * long until the single division. Rows group by score first (ties are
    * HANDLED, not assumed away), so pass a score rounded to the
    * cross-engine 6dp when it carries transcendental leaves (the q_lm
    * discipline — q_nb_auc rounds its log-odds before calling this).
    *
    * Shapes at 100 TB: one map-side-combined (score → pos, neg) count
    * aggregate (bounded by distinct scores), then the cumulative
    * negatives-below come from [[graft.ops.Scale.globalCumSum]]'s
    * range-partitioned two-phase prefix sum — NO global window ever sees
    * data rows — and one scalar aggregate folds the U statistic. Output:
    * one row (n_pos, n_neg, auc), auc NULL when either class is absent
    * (AUC is undefined there; a gate should fail loudly on it, not read
    * 0.5).
    */
  def aucBinary(df: DataFrame, labelCol: String,
                scoreCol: String): DataFrame = {
    val by = df.groupBy(scoreCol).agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    val c = graft.ops.Scale.globalCumSum(by, Seq(col(scoreCol)),
      col("neg"), "cum_neg")
    c.agg(sum("pos").as("n_pos"), sum("neg").as("n_neg"),
        sum(col("pos") *
          (lit(2L) * (col("cum_neg") - col("neg")) + col("neg")))
          .as("__u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** The full precision–recall sweep of a binary score — one row per
    * DISTINCT observed score s, treating s as the gate threshold
    * (predict positive iff score ≥ s):
    *
    *   tp(s) = Σ pos over scores ≥ s,   fp(s) = Σ neg over scores ≥ s,
    *   precision = tp / (tp + fp),      recall = tp / P
    *
    * — the curve a threshold choice is actually read off, computed
    * without materializing per-threshold predictions: one (score → pos,
    * neg) count aggregate, ascending prefix sums (the ≥-tail is total −
    * prefix + own row, all exact longs), two divisions per row. The
    * tp+fp denominator is never 0 (the threshold IS an observed score,
    * so its own row contributes ≥ 1); recall is NULL when no positives
    * exist. Same scale shapes as [[aucBinary]]: two-phase prefix sums
    * over the distinct-score relation, a broadcast 1-row total, no
    * global window over data. Output: (s, tp, fp, precision, recall),
    * ratios rounded to the cross-engine 6dp (pass a 6dp-rounded score —
    * the [[aucBinary]] discipline).
    */
  def prCurve(df: DataFrame, labelCol: String,
              scoreCol: String): DataFrame = {
    val by = df.groupBy(col(scoreCol).as("s")).agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    val c = graft.ops.Scale.globalCumSums(by, Seq(col("s")),
      Seq(col("pos") -> "cum_pos", col("neg") -> "cum_neg"))
    val tot = by.agg(sum("pos").as("__P"), sum("neg").as("__N"))
    c.crossJoin(broadcast(tot))
      .select(col("s"),
        (col("__P") - col("cum_pos") + col("pos")).as("tp"),
        (col("__N") - col("cum_neg") + col("neg")).as("fp"),
        col("__P"))
      .withColumn("precision",
        round(col("tp") / (col("tp") + col("fp")), 6))
      .withColumn("recall",
        when(col("__P") > 0, round(col("tp") / col("__P"), 6)))
      .drop("__P")
  }

  /** Per-class precision / recall / F1 from a confusion relation
    * (truth, pred, n) — [[graft.text.Classify]]'s q_nb_confusion output
    * shape. For each class c over the label universe (classes appearing
    * as truth OR pred):
    *
    *   tp = n(c, c),  n_truth = Σ_p n(c, p),  n_pred = Σ_t n(t, c),
    *   precision = tp / n_pred,  recall = tp / n_truth,
    *   f1 = 2·tp / (n_truth + n_pred)
    *
    * (the last identity — 2TP/(2TP+FP+FN) — keeps F1 one exact division
    * instead of a float composition of two). Undefined cells are NULL:
    * precision for a never-predicted class, recall for a never-true one.
    * The confusion relation is |classes|²-bounded, so every aggregate
    * and join here is micro-table work regardless of corpus size.
    * Output: (cls, tp, n_truth, n_pred, precision, recall, f1), all
    * ratios rounded to the cross-engine 6dp.
    */
  def prfReport(confusion: DataFrame): DataFrame = {
    val tp = confusion.filter(col("truth") === col("pred"))
      .select(col("truth").as("cls"), col("n").as("tp"))
    val nt = confusion.groupBy(col("truth").as("cls"))
      .agg(sum("n").as("n_truth"))
    val np = confusion.groupBy(col("pred").as("cls"))
      .agg(sum("n").as("n_pred"))
    nt.join(np, Seq("cls"), "full")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .withColumn("precision",
        when(col("n_pred") > 0, round(col("tp") / col("n_pred"), 6)))
      .withColumn("recall",
        when(col("n_truth") > 0, round(col("tp") / col("n_truth"), 6)))
      .withColumn("f1",
        when(col("n_truth") + col("n_pred") > 0,
          round(lit(2L) * col("tp") /
            (col("n_truth") + col("n_pred")), 6)))
  }

  /** One-row rollup of a [[prfReport]] relation — the single numbers a
    * gate comparison reads: micro accuracy Σtp/Σn_truth, macro-F1 (mean
    * of per-class F1, NULL-as-0 — scikit-learn's `zero_division=0`
    * convention), and truth-weighted F1 Σ(n_truth·F1)/Σn_truth. The
    * per-class F1s are the report's 6dp-rounded values; their sums fold
    * in class order (the sum_lp discipline) so the rollup replays
    * bitwise in the oracle. The report is |classes|-bounded, so this is
    * micro-table work.
    */
  def prfSummary(report: DataFrame): DataFrame =
    report.agg(
      count(lit(1)).as("n_classes"),
      sum("tp").as("__tp"), sum("n_truth").as("__nt"),
      expr("aggregate(transform(array_sort(collect_list(" +
        "struct(cls, coalesce(f1, 0.0D) AS f))), s -> s.f), 0.0D," +
        " (a, x) -> a + x)").as("__sf"),
      expr("aggregate(transform(array_sort(collect_list(" +
        "struct(cls, n_truth * coalesce(f1, 0.0D) AS wf))), s -> s.wf)," +
        " 0.0D, (a, x) -> a + x)").as("__swf"))
    .select(col("n_classes"),
      when(col("__nt") > 0,
        round(col("__tp") / col("__nt"), 6)).as("accuracy"),
      when(col("n_classes") > 0,
        round(col("__sf") / col("n_classes"), 6)).as("macro_f1"),
      when(col("__nt") > 0,
        round(col("__swf") / col("__nt"), 6)).as("weighted_f1"))

  /** Reliability report + expected calibration error over a binary
    * scored relation (labelCol boolean, scoreCol a log-odds score, the
    * [[aucBinary]] shape): each document's score maps to a probability
    * via the logistic sigmoid, quantized to MICRO-probability integers
    * pm = round(10⁶·σ(s)) so every per-bin statistic is exact count
    * arithmetic (sums of longs — order-free, DuckDB-replayable), then
    * `bins` fixed-width probability bins. Per bin: n, n_pos, mean
    * confidence Σpm/n/10⁶, empirical accuracy n_pos/n; ECE =
    * Σ n_b/N·|acc_b − conf_b| folded in bin order (the sum_lp
    * discipline) and repeated on every row. This is the "is the gate's
    * confidence meaningful" artifact a threshold-calibrated admission
    * gate ships with (Guo et al. 2017's ECE over Naeini's fixed-width
    * binning).
    *
    * Shapes at 100 TB: one map pass to (bin, pm, y), one hash aggregate
    * to ≤ `bins` rows, ECE a fold over that micro-relation — nothing
    * scales past the corpus scan.
    */
  def calibrationReport(df: DataFrame, labelCol: String, scoreCol: String,
                        bins: Int = 10): DataFrame =
    calibrationFromBins(calibrationBins(df, labelCol, scoreCol, bins))

  /** The exact per-bin sufficient statistics behind
    * [[calibrationReport]] — (bin, n, n_pos, __spm), all longs, one row
    * per non-empty bin. MERGEABLE: every column is a sum, so
    * bins(A ∪ B) = per-bin column sums of bins(A) and bins(B) — the
    * property the streaming ECE monitor's carry state rests on
    * ([[eceMonitorIngest]]), and why a 100 TB calibration report can be
    * assembled from per-shard partials without a second corpus pass.
    */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins > 1, "need at least 2 bins")
    val pm = round(lit(1000000.0) / (lit(1.0) + exp(-col(scoreCol))), 0)
      .cast("long")
    df.select(pm.as("pm"), when(col(labelCol), 1L).otherwise(0L).as("y"))
      .select(expr(s"least(pm * $bins div 1000000, ${bins - 1})").as("bin"),
        col("pm"), col("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("pm").as("__spm"))
  }

  /** Merge [[calibrationBins]] parts built over disjoint row sets into
    * the bins of their union — every column is a sum, so calibration
    * reports maintain INCREMENTALLY (per-shard partials at 100 TB, the
    * streaming monitor's carry) with no second pass over the rows; the
    * [[graft.ops.Scale.mergeShardManifests]]-style mergeability claim,
    * here for the gate's reliability artifact. One micro-table
    * aggregate. */
  def mergeCalibrationBins(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "need at least one bins part")
    parts.reduce(_.unionByName(_))
      .groupBy("bin").agg(sum("n").as("n"), sum("n_pos").as("n_pos"),
        sum("__spm").as("__spm"))
  }

  /** [[calibrationReport]]'s derivation from a precomputed (possibly
    * merged) [[calibrationBins]] relation — shared code object, so a
    * report assembled from accumulated streaming bins is BIT-identical
    * to the one-shot batch report over the same rows. */
  def calibrationFromBins(b: DataFrame): DataFrame = {
    val tot = b.agg(sum("n").as("__N"))
    val rep = b.crossJoin(broadcast(tot))
      .withColumn("__conf", col("__spm") / col("n") / lit(1000000.0))
      .withColumn("__acc", col("n_pos") / col("n"))
      .withColumn("__term",
        col("n") / col("__N") * abs(col("__acc") - col("__conf")))
    val ece = rep.agg(
      expr("aggregate(transform(array_sort(collect_list(" +
        "struct(bin, __term))), s -> s.__term), 0.0D," +
        " (a, x) -> a + x)").as("__ece"))
    rep.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("__conf"), 6).as("conf"),
        round(col("__acc"), 6).as("acc"),
        round(col("__ece"), 6).as("ece"))
  }

  /** ONE INGEST STEP of the cumulative calibration monitor — the gate's
    * ECE watched ON INGEST, not just at train time: the arriving scored
    * micro-batch's [[calibrationBins]] fold into the standing per-bin
    * totals (≤ `bins` rows of exact longs — the mergeable sufficient
    * statistics), and the emitted report is [[calibrationFromBins]] over
    * the MERGED totals — the calibration of everything streamed so far,
    * bit-identical to the one-shot batch report over the same rows
    * (StreamingSpec pins it). A drifting ece column is the live signal
    * that the admission gate's threshold has stopped meaning the
    * probability it was calibrated to.
    *
    * State hardening (the [[graft.ops.Scale.contextWindowsIngest]]
    * conventions): the carry directory swaps via staged rename +
    * `_COMMITTED` marker; the foreachBatch `batchId` and a bin-content
    * fingerprint ride in meta, so a replayed batch is detected and
    * RE-EMITS the current report instead of double-counting (for a
    * cumulative monitor, the post-merge state of the original delivery
    * IS the replay's correct output); a `bins` mismatch against the
    * persisted state fails loudly (merging different bin widths is
    * silently wrong).
    */
  def eceMonitorIngest(spark: org.apache.spark.sql.SparkSession,
                       statePath: String, batch: DataFrame,
                       labelCol: String, scoreCol: String, bins: Int = 10,
                       batchId: Long = -1L): DataFrame = {
    val cs = graft.ops.CarryState.open(spark, statePath)
    val hasState = cs.exists
    val meta: Option[org.apache.spark.sql.Row] = if (hasState)
      Some(spark.read.parquet(s"$statePath/carry/meta").head()) else None
    meta.foreach(m => require(m.getAs[Long]("bins") == bins.toLong,
      s"eceMonitorIngest: state was built with ${m.getAs[Long]("bins")} " +
        s"bins, called with $bins — bin widths cannot merge"))
    val standing: Map[Long, (Long, Long, Long)] = if (hasState)
      spark.read.parquet(s"$statePath/carry/bins").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3))).toMap
      else Map.empty
    val bb = calibrationBins(batch, labelCol, scoreCol, bins).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // effect-equality fingerprint: two batches with identical bin
    // statistics are interchangeable for a cumulative monitor
    val fp = scala.util.hashing.MurmurHash3
      .orderedHash(bb.map(_.toString())).toLong
    val n = bb.map(_._2._1).sum
    import spark.implicits._
    def report(rows: Map[Long, (Long, Long, Long)]): DataFrame =
      calibrationFromBins(rows.toSeq
        .map { case (b, (nn, np, sp)) => (b, nn, np, sp) }
        .toDF("bin", "n", "n_pos", "__spm"))
    if (graft.ops.CarryState.isReplay("eceMonitorIngest", batchId, fp, n,
        meta))
      return report(standing)
    val merged = (standing.keySet ++ bb.map(_._1)).map { b =>
      val (n0, p0, s0) = standing.getOrElse(b, (0L, 0L, 0L))
      val (n1, p1, s1) = bb.toMap.getOrElse(b, (0L, 0L, 0L))
      b -> (n0 + n1, p0 + p1, s0 + s1)
    }.toMap
    graft.ops.CarryState.commit(cs) { dir =>
      merged.toSeq.map { case (b, (nn, np, sp)) => (b, nn, np, sp) }
        .toDF("bin", "n", "n_pos", "__spm").repartition(1)
        .write.mode("overwrite").parquet(s"$dir/bins")
      spark.range(1).select(lit(bins.toLong).as("bins"),
          lit(batchId).as("last_batch_id"), lit(fp).as("last_fp"),
          lit(n).as("last_n"))
        .write.mode("overwrite").parquet(s"$dir/meta")
    }
    report(merged)
  }
}
