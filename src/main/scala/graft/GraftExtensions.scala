package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, SigAgreement, TrimNonAlpha}

/** Engine extensions installed via `SparkSession.builder.withExtensions`
  * (or `spark.sql.extensions=graft.GraftExtensions`): registers the
  * engine's native expressions with the function registry so they are
  * callable from SQL and `call_function`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.CollapseNormalize)
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[TrimNonAlpha].getName, "graft_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_normalize takes exactly one argument")
        TrimNonAlpha.normalized(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes exactly two arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sig_match"),
      new ExpressionInfo(classOf[SigAgreement].getName, "graft_sig_match"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_sig_match takes exactly two arguments")
        SigAgreement(children.head, children(1))
      }))
  }
}
