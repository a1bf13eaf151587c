package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Fuzzy

class FuzzySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def names = {
    import spark.implicits._
    Seq(
      (1L, "goldenrod lace"),
      (2L, "goldenrod face"),    // sub of 1 -> dist 1
      (3L, "goldenrd lace"),     // deletion of 1 -> dist 1
      (4L, "golden lace"),       // dist 3 from 1 -> outside maxDist 2
      (5L, "silver spring")
    ).toDF("id", "nm")
  }

  test("editDistanceJoin: within-block pairs at the exact distances, band prunes") {
    val out = Fuzzy.editDistanceJoin(names, "id", "nm", names, "id", "nm",
        maxDist = 2)
      .where(col("id_a") < col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 1L)
    assert(out((1L, 3L)) == 1L)
    assert(out((2L, 3L)) == 2L)
    assert(out((3L, 4L)) == 2L) // "goldenrd"->"golden": two deletions
    assert(!out.contains((1L, 4L))) // dist 3 > maxDist
    assert(!out.contains((1L, 5L))) // different block
    assert(out.size == 4)
  }

  test("editDistanceJoin matches brute force within its blocking contract") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name").as("nm"))
    val got = Fuzzy.editDistanceJoin(docs, "id", "nm", docs, "id", "nm",
        maxDist = 3)
      .where(col("id_a") < col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    val expected = (for {
      (ia, na) <- rows; (ib, nb) <- rows
      if ia < ib && na.take(3) == nb.take(3) &&
        math.abs(na.length - nb.length) <= 3
      d = lev(na, nb) if d <= 3
    } yield (ia, ib) -> d.toLong).toMap
    assert(got == expected,
      s"got ${got.size} pairs, expected ${expected.size}")
  }

  test("sortedNeighborhoodJoin equals the brute-force sliding window") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name").as("nm"))
    val got = Fuzzy.sortedNeighborhoodJoin(docs, "id", "nm",
        sortKey = col("nm"), windowSize = 4, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    val sorted = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, nm) => (nm, id) }
    val expected = (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + 4, sorted.length)
      d = lev(sorted(i)._2, sorted(j)._2) if d <= 3
    } yield (sorted(i)._1, sorted(j)._1) -> d.toLong).toMap
    assert(got == expected, s"got ${got.size} vs expected ${expected.size}")
    assert(expected.nonEmpty, "fixture should produce at least one pair")
  }

  test("bestMatch: min distance wins, id tiebreak, misses drop") {
    import spark.implicits._
    val probes = Seq((10L, "goldenrod lace")).toDF("pid", "ptext")
    val best = Fuzzy.bestMatch(probes, "pid", "ptext", names, "id", "nm",
        maxDist = 2, broadcastLeft = true).collect()
    assert(best.length == 1)
    assert(best(0).getLong(best(0).fieldIndex("id_b")) == 1L) // exact, dist 0
    assert(best(0).getLong(best(0).fieldIndex("dist")) == 0L)
    val miss = Seq((11L, "zzzz")).toDF("pid", "ptext")
    assert(Fuzzy.bestMatch(miss, "pid", "ptext", names, "id", "nm",
      maxDist = 2).count() == 0)
  }
}
