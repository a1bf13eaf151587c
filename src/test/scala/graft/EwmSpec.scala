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

  private def naiveVar(xs: Seq[Option[Double]], alpha: Double,
                       bias: Boolean): Seq[Option[Double]] = {
    val keep = 1 - alpha
    var sw = 0.0; var swx = 0.0; var sw2 = 0.0; var swx2 = 0.0
    xs.map { o =>
      o.foreach { x =>
        sw = 1.0 + keep * sw
        swx = x + keep * swx
        sw2 = 1.0 + keep * keep * sw2
        swx2 = x * x + keep * swx2
      }
      val m = swx / sw
      val vb = swx2 / sw - m * m
      if (bias) { if (sw == 0.0) None else Some(vb) }
      else if (sw * sw == sw2) None
      else Some(vb * ((sw * sw) / (sw * sw - sw2)))
    }
  }

  test("ewmVar/ewmStd equal the decayed-sums recursion; unbiased matches pandas on a pinned case") {
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "x")
    for (bias <- Seq(false, true); alpha <- Seq(0.5, 0.2)) {
      val got = Tbl(df)
        .arrange(col("i"))
        .mutate("v" -> Vec.ewmVar(col("x"), alpha, bias))
        .df.orderBy("i").collect()
        .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
      assert(got == naiveVar(xs, alpha, bias), s"bias=$bias alpha=$alpha")
    }
    // pandas pin: Series([10,20,5]).ewm(alpha=0.5, adjust=True).var()
    //   -> [NaN, 50.0, 75.0]: weights [.25,.5,1], weighted mean 10, biased
    //   var 75/1.75 = 42.857, reliability factor sw²/(sw²−sw2) = 1.75
    val pinned = Tbl(Seq((0L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("i", "x"))
      .arrange(col("i"))
      .mutate("v" -> Vec.ewmVar(col("x"), 0.5))
      .df.orderBy("i").collect()
    assert(pinned(0).isNullAt(2))
    assert(math.abs(pinned(1).getDouble(2) - 50.0) < 1e-9)
    assert(math.abs(pinned(2).getDouble(2) - 75.0) < 1e-9)
    // std = sqrt(var)
    val s = Tbl(Seq((0L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("i", "x"))
      .arrange(col("i"))
      .mutate("sd" -> Vec.ewmStd(col("x"), 0.5))
      .df.orderBy("i").collect()
    assert(math.abs(s(1).getDouble(2) - math.sqrt(50.0)) < 1e-9)
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
