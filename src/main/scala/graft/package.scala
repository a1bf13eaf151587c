import scala.language.implicitConversions
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec

/** graft — a Spark-native analytics engine with the query surface of
  * machow/siuba (dplyr/tidyr-style verbs), re-expressed on
  * `org.apache.spark.sql`. See SURVEY.md for the blueprint.
  */
package object graft {
  /** Plain Columns become context-aware expressions: any aggregate subtree is
    * auto-wrapped in `.over(partitionBy(groupKeys))`, giving the reference's
    * grouped-aggregate broadcasting (`_.x - _.x.mean()` inside mutate).
    * On an ungrouped table this is a window over an empty partition — a
    * single-partition pass, inherently global like the semantics it
    * implements; prefer grouped use at scale.
    */
  implicit def columnToGExpr(c: Column): GExpr = new GExpr {
    def toCol(ctx: WinCtx): Column =
      if (internal.exprs.containsAgg(c)) internal.exprs.windowizeAggs(c, ctx.plain)
      else c
  }
}
