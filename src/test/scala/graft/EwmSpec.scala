package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Vec

/** Differential tests for the EwmMean window function against a naive
  * sequential reimplementation of the pandas recursions.
  */
class EwmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(xs: Seq[Option[Double]], alpha: Double,
                    adjust: Boolean): Seq[Option[Double]] = {
    var num: Option[Double] = None
    var den = 0.0
    xs.map {
      case Some(x) =>
        if (adjust) {
          num = Some(x + (1 - alpha) * num.getOrElse(0.0))
          den = 1.0 + (1 - alpha) * den
          Some(num.get / den)
        } else {
          num = Some(num.map(m => (1 - alpha) * m + alpha * x).getOrElse(x))
          num
        }
      case None =>
        if (adjust) { if (den == 0.0) None else Some(num.get / den) } else num
    }
  }

  private val xs: Seq[Option[Double]] =
    Seq(Some(10.0), Some(20.0), None, Some(5.0), Some(40.0), None, None, Some(1.0))

  test("ewmMean equals the pandas recursion for both adjust modes") {
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "x")
    for (adjust <- Seq(false, true); alpha <- Seq(0.5, 0.2, 1.0)) {
      val got = Tbl(df)
        .arrange(col("i"))
        .mutate("m" -> Vec.ewmMean(col("x"), alpha, adjust))
        .df.orderBy("i").collect()
        .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
      assert(got == naive(xs, alpha, adjust), s"adjust=$adjust alpha=$alpha")
    }
  }

  test("ewmMean is per-group and partition-invariant") {
    val df = (1L to 500L).map(i => (i % 7, i, (i * 31 % 100).toDouble))
      .toDF("g", "i", "x")
    def run(d: org.apache.spark.sql.DataFrame) = Tbl(d)
      .groupBy("g").arrange(col("i"))
      .mutate("m" -> Vec.ewmMean(col("x"), 0.3))
      .df.select("g", "i", "m")
    TestSpark.assertSameRows(run(df), run(df.repartition(11)), "ewm repartition")
    // spot-check one group against the naive loop
    val g0 = (1L to 500L).filter(_ % 7 == 0).map(i => Some((i * 31 % 100).toDouble))
    val got = run(df).where(col("g") === 0).orderBy("i")
      .collect().map(_.getDouble(2)).toSeq
    assert(got == naive(g0, 0.3, adjust = false).map(_.get))
  }
}
