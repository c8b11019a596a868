package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point: registers every graft expression at
 * session build time, so a cluster deployment enables the engine with
 *   --conf spark.sql.extensions=graft.functions.GraftExtensions
 * (the same expressions `CellExprs.install` adds per-session in-process).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    CellExprs.registrations.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.CellExprs", name),
        (es: Seq[Expression]) => builder(es)))
    }
  }
}
