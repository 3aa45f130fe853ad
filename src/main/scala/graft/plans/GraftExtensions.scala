package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, MinHashSignature, SimHash}

/** Session extensions registering the engine's native expressions with the
  * SQL function registry, so `spark.sql("... graft_dot(a, b) ...")` works
  * next to the DataFrame-level [[graft.functions.VectorFunctions]] entry
  * points. Install with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * The engine's operators do NOT depend on this registration (they wrap
  * the expressions directly), so they run unchanged on sessions built
  * without it — the extension only adds the SQL-surface name. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"graft_dot expects 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"graft_minhash expects 2 arguments, got ${children.length}")
        MinHashSignature(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 3, s"graft_simhash expects 3 arguments, got ${children.length}")
        SimHash(children.head, children(1), children(2))
      }))
  }
}
