package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Property tests over the pure tidyselect resolver (no Spark involved) —
  * the ScalaCheck upgrade over the reference's example-based tests
  * (SURVEY §5).
  */
class SelectPropsSpec extends AnyFunSuite {
  // scalatestplus bridge isn't in the offline cache: run scalacheck directly
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val genCols: Gen[List[String]] =
    Gen.chooseNum(1, 12).flatMap { n =>
      Gen.listOfN(n, Gen.identifier.map(_.take(8))).map(_.distinct)
    }.suchThat(_.nonEmpty)

  private def fields(cols: Seq[String]): Seq[(String, DataType)] =
    cols.map(_ -> (StringType: DataType))

  test("everything() selects all columns in order") {
    check(Prop.forAll(genCols) { cols =>
      Sel.resolveT(fields(cols), Seq(Sel.everything)).map(_._2) == cols
    })
  }

  test("negation selects the exact complement") {
    check(Prop.forAll(genCols) { cols =>
      Prop.forAll(Gen.someOf(cols).suchThat(_.nonEmpty)) { dropped =>
        val out = Sel.resolveT(fields(cols),
          dropped.map(d => Sel.Not(Sel.Name(d)): Sel).toSeq)
        out.map(_._2) == cols.filterNot(dropped.contains)
      }
    })
  }

  test("selection is idempotent under duplication (first mention wins)") {
    check(Prop.forAll(genCols) { cols =>
      val sels = (cols ++ cols).map(c => Sel.Name(c): Sel)
      Sel.resolveT(fields(cols), sels).map(_._2) == cols
    })
  }

  test("name range equals the positional slice") {
    check(Prop.forAll(genCols.suchThat(_.size >= 2)) { cols =>
      Prop.forAll(Gen.choose(0, cols.size - 1), Gen.choose(0, cols.size - 1)) {
        (i, j) =>
          val out = Sel.resolveT(fields(cols),
            Seq(Sel.NameRange(cols(i), cols(j)))).map(_._2)
          out == cols.slice(math.min(i, j), math.max(i, j) + 1)
      }
    })
  }

  test("rename preserves the source column and renames the output") {
    check(Prop.forAll(genCols) { cols =>
      val out = Sel.resolveT(fields(cols),
        Seq(Sel.Rename("zz_new", Sel.Name(cols.head))))
      out == Seq(("zz_new", cols.head))
    })
  }

  test("predicate selection equals driver-side filter") {
    check(Prop.forAll(genCols, Gen.alphaLowerChar) { (cols, ch) =>
      val p = ch.toString
      val out = Sel.resolveT(fields(cols), Seq(Sel.startsWith(p))).map(_._2)
      out == cols.filter(_.startsWith(p))
    })
  }

  test("type predicate selects exactly the matching dtypes") {
    check(Prop.forAll(genCols.suchThat(_.size >= 2)) { cols =>
      val typed = cols.zipWithIndex.map { case (c, i) =>
        c -> (if (i % 2 == 0) (DoubleType: DataType) else StringType)
      }
      val out = Sel.resolveT(typed, Seq(Sel.whereNumeric)).map(_._2)
      out == typed.filter(_._2 == DoubleType).map(_._1)
    })
  }

  test("positional selection and ranges match list indexing") {
    check(Prop.forAll(genCols.suchThat(_.size >= 2)) { cols =>
      Prop.forAll(Gen.choose(0, cols.size - 1), Gen.choose(0, cols.size - 1)) {
        (i, j) =>
          val pos = Sel.resolveT(fields(cols), Seq(Sel.Pos(i))).map(_._2)
          val rng = Sel.resolveT(fields(cols),
            Seq(Sel.PosRange(math.min(i, j), math.max(i, j)))).map(_._2)
          pos == Seq(cols(i)) &&
            rng == cols.slice(math.min(i, j), math.max(i, j) + 1)
      }
    })
  }
}
