package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the custom expressions for SQL use:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   // or: spark.sql.extensions=graft.plans.GraftExtensions
  *   spark.sql("SELECT vec_dot(a.embedding, b.embedding) …")
  *
  * The Scala Column API (`VectorFunctions`) works without this; the
  * extension only adds SQL-name resolution.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
  }
}
