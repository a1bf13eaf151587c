package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** `across()` — apply a set of functions over a tidyselection
  * (siuba/dply/across.py:126-155). Pure API-layer expansion into
  * (name, Column) pairs; the name template supports `{col}` and `{fn}`
  * like the reference's `"{col}_{fn}"` default.
  */
object Across {
  def apply(t: Tbl, sel: Seq[Sel], fns: Seq[(String, Column => Column)],
            template: String = "{col}_{fn}"): Seq[(String, Column)] = {
    val srcs = Sel.resolveT(t.typedFields, sel).map(_._2)
    if (fns.size == 1 && fns.head._1.isEmpty)
      srcs.map(c => c -> fns.head._2(col(c)))
    else
      srcs.flatMap { c =>
        fns.map { case (fnName, f) =>
          template.replace("{col}", c).replace("{fn}", fnName) -> f(col(c))
        }
      }
  }
}
