package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans.ExtractExpression

/** Session extensions (the public injection seam): registers the native
  * `graft_extract` Catalyst expression. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`; sessions
  * built without it transparently use the equivalent Scala UDF path in
  * ExtractJob (same kernel, same bytes, just the converter overhead). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_extract"),
      new ExpressionInfo(classOf[ExtractExpression].getName, "graft_extract"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_extract(url, payload) takes 2 arguments")
        ExtractExpression(children.head, children(1))
      }))
  }
}
