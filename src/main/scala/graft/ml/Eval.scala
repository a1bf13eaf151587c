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
}
