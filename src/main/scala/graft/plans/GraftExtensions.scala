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

  /** The shingle width argument must be a non-null foldable literal (it
    * shapes the expression itself, like the builtins' `round(x, 2)`);
    * missing/NULL/non-literal widths get the clean message rather than a
    * raw NPE or IndexOutOfBounds from inside analysis. */
  private def intLit(exprs: Seq[Expression], i: Int, fn: String): Int = {
    require(exprs.length > i, s"$fn: expects ${i + 1} arguments, got ${exprs.length}")
    val e = exprs(i)
    require(e.foldable, s"$fn: n must be a literal integer")
    val v = e.eval()
    require(v != null, s"$fn: n must be a non-NULL literal integer")
    v.asInstanceOf[Number].intValue
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head, intLit(exprs, 1, "word_shingles"))))
    e.injectFunction((FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[WordShingleHashes].getName, "word_shingle_hashes"),
      (exprs: Seq[Expression]) => WordShingleHashes(exprs.head, intLit(exprs, 1, "word_shingle_hashes"))))
    e.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (exprs: Seq[Expression]) => SimHash60(exprs.head)))
  }
}
