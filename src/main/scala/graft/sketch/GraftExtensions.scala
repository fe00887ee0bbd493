package graft.sketch

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions registering the engine's custom Catalyst surface,
  * so `spark.sql.extensions=graft.sketch.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes `kll_sketch` available in
  * every session of a cluster without per-session registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("kll_sketch"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllSketchAgg(exprs.head)))
  }
}
