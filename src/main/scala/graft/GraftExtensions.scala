package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayAgreeCount, DotProduct}

/** Production registration path for the engine's custom Catalyst
  * expressions: `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) injects them at session build,
  * so spark-submit / thrift-server users get `graft_dot` / `graft_agree`
  * without calling VectorExprs.register. Query bodies still call the
  * idempotent runtime registration so they work on any session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_agree"),
      new ExpressionInfo(classOf[ArrayAgreeCount].getName, "graft_agree"),
      (children: Seq[Expression]) => ArrayAgreeCount(children(0), children(1))))
  }
}
