package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Regress

class RegressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("OLS recovers an exact integer linear relationship to the bit") {
    import spark.implicits._
    // y = 3 + 2*x1 - x2 exactly: the Gram sums are exact integers, the
    // Cramer ratios are exact in doubles at this scale, so the recovered
    // weights and every residual must be EXACTLY representable — 0.0
    val rows = for (i <- 1L to 50L) yield {
      val x1 = (i * 7) % 23; val x2 = (i * 3) % 11
      (i, x1, x2, 3 + 2 * x1 - x2)
    }
    val df = rows.toDF("id", "x1", "x2", "y")
    val w = Regress.fitOls(df, "y", Seq("x1", "x2")).head()
    assert(w.getDouble(0) == 3.0 && w.getDouble(1) == 2.0 &&
      w.getDouble(2) == -1.0, w.toString)
    val resid = Regress.predict(df, Regress.fitOls(df, "y", Seq("x1", "x2")),
        Seq("x1", "x2"), Some("y"))
      .agg(max(abs(col("resid")))).head().getDouble(0)
    assert(resid == 0.0, s"max |resid| $resid")
  }

  test("single-feature fit matches the closed-form slope/intercept") {
    import spark.implicits._
    val pts = Seq((1L, 1L, 2L), (2L, 2L, 3L), (3L, 3L, 5L), (4L, 4L, 6L))
    val df = pts.toDF("id", "x1", "y")
    val w = Regress.fitOls(df, "y", Seq("x1")).head()
    // hand normal equations: n=4, Sx=10, Sxx=30, Sy=16, Sxy=47
    // slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) = (188-160)/(120-100) = 1.4
    // intercept = (Sy - slope*Sx)/n = (16-14)/4 = 0.5
    assert(math.abs(w.getDouble(1) - 1.4) < 1e-12 &&
      math.abs(w.getDouble(0) - 0.5) < 1e-12, w.toString)
  }

  test("ridge shrinks feature weights toward zero, intercept unpenalized") {
    import spark.implicits._
    val rows = for (i <- 1L to 40L) yield {
      val x1 = (i * 5) % 17
      (i, x1, 10 + 3 * x1)
    }
    val df = rows.toDF("id", "x1", "y")
    val w0 = Regress.fitOls(df, "y", Seq("x1")).head()
    val wr = Regress.fitOls(df, "y", Seq("x1"), lambda = 1000L).head()
    assert(w0.getDouble(1) == 3.0, w0.toString)
    assert(math.abs(wr.getDouble(1)) < math.abs(w0.getDouble(1)),
      s"ridge ${wr.getDouble(1)} vs ols ${w0.getDouble(1)}")
    assert(wr.getDouble(1) > 0.0, "shrunk, not sign-flipped")
  }

  test("weights are bitwise partition-invariant (integer Gram sums)") {
    import spark.implicits._
    val rows = for (i <- 1L to 200L) yield
      (i, (i * 13) % 37, (i * 29) % 19, (i * 7) % 31)
    val df = rows.toDF("id", "x1", "x2", "y")
    def fit(d: org.apache.spark.sql.DataFrame): Seq[Double] = {
      val r = Regress.fitOls(d, "y", Seq("x1", "x2")).head()
      (0 to 2).map(r.getDouble)
    }
    assert(fit(df) == fit(df.repartition(17)),
      "integer sums must make the fit partition-invariant")
  }

  test("persisted model scoring == inline, bit-identical") {
    import spark.implicits._
    val rows = for (i <- 1L to 120L) yield
      (i, (i * 11) % 29, (i * 17) % 13, (i * 5) % 41)
    val df = rows.toDF("id", "x1", "x2", "y")
    val fit = Regress.fitOls(df.filter(col("id") % 2 === 0), "y",
      Seq("x1", "x2"))
    val inline = Regress.predict(df, fit, Seq("x1", "x2"), Some("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(4), r.getDouble(5)))).toMap
    val path = java.nio.file.Files
      .createTempDirectory("graft-probe-model").toString
    Regress.saveModel(fit, path)
    val persisted = Regress.predictFromModel(spark, path, df,
        Seq("x1", "x2"), Some("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(4), r.getDouble(5)))).toMap
    assert(persisted == inline && inline.size == 120)
  }

  test("singular design yields NULL weights, not a throw") {
    import spark.implicits._
    // x2 = 2*x1: collinear -> det 0
    val df = (1L to 10L).map(i => (i, i % 5, (i % 5) * 2, i))
      .toDF("id", "x1", "x2", "y")
    val w = Regress.fitOls(df, "y", Seq("x1", "x2")).head()
    assert(w.getDouble(3 + 0) == 0.0 || w.getAs[Double]("det") == 0.0)
    assert(w.isNullAt(0) && w.isNullAt(1) && w.isNullAt(2), w.toString)
    // guards
    assertThrows[IllegalArgumentException](
      Regress.fitOls(df, "y", Seq.empty))
    assertThrows[IllegalArgumentException](
      Regress.fitOls(df, "y", Seq("x1"), lambda = -1L))
    assertThrows[IllegalArgumentException](
      Regress.fitOls(df, "y", Seq("x1", "x2", "x1", "x2", "x1")))
  }
}
