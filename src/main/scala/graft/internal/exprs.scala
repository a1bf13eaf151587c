package graft.internal

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.graftshim.Shim

/** Forwarders to the ColumnNode rewriter (which must live under
  * org.apache.spark.sql — see graftshim.Shim for the why and the semantics).
  */
object exprs {
  def containsAgg(c: Column): Boolean = Shim.containsAgg(c)
  def containsWindow(c: Column): Boolean = Shim.containsWindow(c)
  def windowizeAggs(c: Column, spec: WindowSpec): Column =
    Shim.windowizeAggs(c, spec)
}
