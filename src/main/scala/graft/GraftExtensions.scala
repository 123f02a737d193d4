package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** SparkSessionExtensions entry point: installs the engine's native
  * expressions at session build time —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * so SQL-text users get `graft_dot` without touching library code
  * (SURVEY §2.10/§4.3: the extension tier above runtime registry
  * registration, which `VectorExpressions.register` still provides for
  * sessions we don't construct). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
  }
}
