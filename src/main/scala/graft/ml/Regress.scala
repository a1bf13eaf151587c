package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear-probe regression at corpus scale — the FineWeb-Edu shape: fit a
  * small linear model on document features ONCE, then score every
  * document with a map-only projection. Reference semantics: ordinary
  * least squares / ridge via the normal equations
  *
  *   (XᵀX + λI') w = Xᵀy      (I' = identity with a 0 for the intercept —
  *                             the standard unpenalized-bias convention)
  *
  * solved in closed form by Cramer's rule. The features are INTEGER
  * columns by contract (quantize floats upstream, the q_semantic_dedup
  * discipline): XᵀX and Xᵀy are then EXACT BIGINT sums — order-invariant,
  * partition-invariant, and bit-portable — and every float op downstream
  * (the determinant expansion and one division per weight) is a fixed
  * arithmetic DAG over those exact sums, so the whole fit→predict
  * pipeline is deterministic and replays in DuckDB (q_linear_probe).
  *
  * Shapes at 100 TB:
  *   - FIT is ONE map-side-combined aggregate producing (d+1)(d+2)/2 +
  *     (d+1) scalars — the only corpus pass; the solve is arithmetic on
  *     that single row (no driver round-trip, the model stays a lazy
  *     1-row relation).
  *   - PREDICT rides the 1-row weights through a broadcast (the scalar-
  *     aggregate crossJoin pattern PlanAudit exempts by construction) and
  *     is otherwise a map-only projection.
  *   - d is a model-capacity knob, not data: the Cramer expansion is
  *     (d+1)! terms, capped at d ≤ 4 features (5×5 dets). Larger probes
  *     belong to an iterative solver, not closed form.
  */
object Regress {

  /** Laplace expansion along the first row, terms folded LEFT TO RIGHT
    * with alternating signs — the fixed association order the DuckDB
    * replica mirrors term for term.
    */
  private def det(m: Seq[Seq[Column]]): Column =
    if (m.size == 1) m(0)(0)
    else {
      val terms = m(0).indices.map { j =>
        val minor = m.tail.map(row =>
          row.zipWithIndex.collect { case (c, i) if i != j => c })
        m(0)(j) * det(minor)
      }
      terms.zipWithIndex.tail.foldLeft(terms.head) { case (acc, (t, j)) =>
        if (j % 2 == 1) acc - t else acc + t
      }
    }

  /** The normal-equation sums as ONE 1-row aggregate: `s_i_j` = Σ xᵢ·xⱼ
    * (x₀ ≡ 1, so s_0_0 = n, s_0_j = Σ xⱼ) for i ≤ j, and `b_i` = Σ xᵢ·y.
    * Exact BIGINT arithmetic — callers must pass integer-valued columns.
    */
  def gram(df: DataFrame, yCol: String, xCols: Seq[String]): DataFrame = {
    require(xCols.nonEmpty && xCols.size <= 4,
      "1 to 4 features (the Cramer expansion is (d+1)! terms)")
    val xs: Seq[Column] = lit(1L) +: xCols.map(c => col(c).cast("long"))
    val y = col(yCol).cast("long")
    val aggs =
      (for {
        i <- xs.indices; j <- xs.indices if i <= j
      } yield sum(xs(i) * xs(j)).as(s"s_${i}_$j")) ++
        xs.indices.map(i => sum(xs(i) * y).as(s"b_$i"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Fit OLS (λ = 0) or ridge (λ > 0, intercept unpenalized) and return
    * the model as a 1-row DataFrame (w_0 = intercept, w_1..w_d = feature
    * weights, det = the system determinant — 0 signals a singular design,
    * surfaced as NULL weights rather than a throw so corpus-wide fits
    * never kill a pipeline). One corpus pass; the solve is a fixed
    * double-arithmetic DAG over the exact integer sums.
    */
  def fitOls(df: DataFrame, yCol: String, xCols: Seq[String],
             lambda: Long = 0L): DataFrame = {
    require(lambda >= 0L, "lambda must be >= 0")
    val g = gram(df, yCol, xCols)
    val d1 = xCols.size + 1
    def s(i: Int, j: Int): Column = {
      val c = if (i <= j) col(s"s_${i}_$j") else col(s"s_${j}_$i")
      // ridge adds lambda on the non-intercept diagonal BEFORE the cast:
      // the regularized system stays exact-integer
      val r = if (i == j && i > 0 && lambda > 0L) c + lit(lambda) else c
      r.cast("double")
    }
    val a: Seq[Seq[Column]] =
      (0 until d1).map(i => (0 until d1).map(j => s(i, j)))
    val b: Seq[Column] = (0 until d1).map(i => col(s"b_$i").cast("double"))
    val dt = det(a)
    val ws = (0 until d1).map { k =>
      val ak = (0 until d1).map(i =>
        (0 until d1).map(j => if (j == k) b(i) else a(i)(j)))
      when(dt =!= 0.0d, det(ak) / dt).as(s"w_$k")
    }
    g.select(ws :+ dt.as("det"): _*)
  }

  /** Persist a fitted model (the [[fitOls]] 1-row relation, weights +
    * det) as a parquet artifact: fit ONCE — the only corpus pass — and
    * every future batch or stream scores against the frozen row
    * ([[predictFromModel]],
    * [[graft.streaming.StreamVerbs.streamingProbeScore]]).
    */
  def saveModel(weights: DataFrame, path: String): Unit =
    weights.write.mode("overwrite").parquet(path)

  /** Score against a persisted [[saveModel]] artifact — bit-identical to
    * scoring with the in-memory fit (RegressSpec pins it); the 1-row
    * weights relation broadcasts, the scan stays map-only.
    */
  def predictFromModel(spark: org.apache.spark.sql.SparkSession,
                       path: String, df: DataFrame, xCols: Seq[String],
                       yCol: Option[String] = None): DataFrame =
    predict(df, spark.read.parquet(path), xCols, yCol)

  /** Score rows against a fitted model: pred = w₀ + x₁·w₁ + … + x_d·w_d
    * (left-fold order — the fixed association the replica mirrors), plus
    * `resid` when `yCol` is given. The 1-row weights broadcast; the scan
    * is map-only.
    */
  def predict(df: DataFrame, weights: DataFrame, xCols: Seq[String],
              yCol: Option[String] = None): DataFrame = {
    val joined = df.crossJoin(broadcast(
      weights.select((0 to xCols.size).map(k => col(s"w_$k")): _*)))
    val pred = xCols.zipWithIndex.foldLeft(col("w_0")) {
      case (acc, (c, i)) => acc + col(c).cast("double") * col(s"w_${i + 1}")
    }
    val withPred = joined.withColumn("pred", pred)
      .drop((0 to xCols.size).map(k => s"w_$k"): _*)
    yCol.fold(withPred)(y =>
      withPred.withColumn("resid", col(y).cast("double") - col("pred")))
  }
}
