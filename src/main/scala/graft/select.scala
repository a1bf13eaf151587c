package graft

import org.apache.spark.sql.types._

/** Tidyselect-style column selection, resolved eagerly against a schema.
  *
  * Mirrors the reference's selection language (siuba/dply/tidyselect.py:10-98,
  * 143-197): names, positions, inclusive slices, name predicates
  * (startswith/endswith/contains/matches), `where()` dtype predicates
  * (siuba/dply/across.py:158-164), negation, and rename (`newName -> oldSel`).
  * Resolution is pure driver-side logic; the engine then issues one `select`.
  */
sealed trait Sel

object Sel {
  final case class Name(n: String)                    extends Sel
  final case class Pos(i: Int)                        extends Sel
  /** Inclusive name slice, like `_["a":"c"]`. */
  final case class NameRange(from: String, to: String) extends Sel
  /** Inclusive position slice. */
  final case class PosRange(from: Int, to: Int)       extends Sel
  final case class Pred(f: String => Boolean, desc: String) extends Sel
  /** tidyselect `where()`: select by column dtype. */
  final case class TypePred(f: DataType => Boolean, desc: String) extends Sel
  final case class Not(s: Sel)                        extends Sel
  /** Rename-on-select: `newName -> oldSelection`. */
  final case class Rename(newName: String, old: Sel)  extends Sel

  def startsWith(p: String): Sel = Pred(_.startsWith(p), s"startswith($p)")
  def endsWith(p: String): Sel   = Pred(_.endsWith(p), s"endswith($p)")
  def contains(p: String): Sel   = Pred(_.contains(p), s"contains($p)")
  def matches(re: String): Sel   = Pred(_.matches(re), s"matches($re)")
  def everything: Sel            = Pred(_ => true, "everything()")
  def whereNumeric: Sel = TypePred(_.isInstanceOf[NumericType], "where(is_numeric)")
  def whereString: Sel  = TypePred(t => t == StringType, "where(is_string)")
  def whereTemporal: Sel = TypePred(
    t => t == TimestampType || t == DateType, "where(is_datetime)")
  def whereBool: Sel = TypePred(t => t == BooleanType, "where(is_bool)")

  /** Resolve a selection list against (name, dtype) fields to
    * `(outputName, sourceName)` pairs, in selection order, de-duplicated on
    * source (first mention wins, as in the reference's `var_create`
    * ordering). A selection consisting solely of negations selects the
    * complement, like tidyselect.
    */
  def resolveT(fields: Seq[(String, DataType)], sels: Seq[Sel]): Seq[(String, String)] = {
    val cols = fields.map(_._1)
    val types = fields.toMap
    def expand(s: Sel): Seq[(String, String)] = s match {
      case Name(n) =>
        if (!cols.contains(n)) throw GraftError(s"select: unknown column '$n'")
        Seq(n -> n)
      case Pos(i)             => Seq(cols(i) -> cols(i))
      case NameRange(a, b) =>
        val ia = cols.indexOf(a); val ib = cols.indexOf(b)
        if (ia < 0 || ib < 0) throw GraftError(s"select: unknown range $a:$b")
        cols.slice(math.min(ia, ib), math.max(ia, ib) + 1).map(c => c -> c)
      case PosRange(a, b)     => cols.slice(a, b + 1).map(c => c -> c)
      case Pred(f, _)         => cols.filter(f).map(c => c -> c)
      case TypePred(f, _)     => cols.filter(c => f(types(c))).map(c => c -> c)
      case Rename(nw, old)    => expand(old).take(1).map { case (_, src) => nw -> src }
      case Not(inner)         => expand(inner) // handled at top level
    }
    val (negs, poss) = sels.partition(_.isInstanceOf[Not])
    val negged = negs.flatMap { case Not(inner) => expand(inner).map(_._2); case _ => Nil }.toSet
    val positive =
      if (poss.isEmpty && negs.nonEmpty) cols.filterNot(negged).map(c => c -> c)
      else poss.flatMap(expand).filterNot { case (_, src) => negged(src) }
    // de-dup on source column, first mention wins
    val seen = scala.collection.mutable.LinkedHashMap[String, String]()
    positive.foreach { case (out, src) => if (!seen.contains(src)) seen(src) = out }
    seen.toSeq.map { case (src, out) => (out, src) }
  }

  /** Name-only resolution (no dtype info; TypePred matches nothing). */
  def resolve(cols: Seq[String], sels: Seq[Sel]): Seq[(String, String)] =
    resolveT(cols.map(_ -> (NullType: DataType)), sels)
}

final case class GraftError(msg: String) extends RuntimeException(msg)
