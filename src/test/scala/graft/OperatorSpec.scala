package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns

/** Per-operator units on tiny literal frames (SURVEY.md §5.4) plus
  * smoke-level invariants for every registered query at sf0.001. */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tokens splits on whitespace runs and drops empties") {
    import spark.implicits._
    val r = Seq("  a  bb\tc ", "", "x").toDF("text")
      .select(TextFns.tokens(col("text")).as("t")).as[Seq[String]].collect()
    assert(r(0) === Seq("a", "bb", "c"))
    assert(r(1) === Seq())
    assert(r(2) === Seq("x"))
  }

  test("shingles: fewer tokens than n gives empty, duplicates removed") {
    import spark.implicits._
    val r = Seq("a b", "a b c d", "a b a b a b").toDF("text")
      .select(TextFns.shingles(TextFns.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].collect()
    assert(r(0) === Seq())
    assert(r(1) === Seq("a b c", "b c d"))
    assert(r(2).sorted === Seq("a b a", "b a b")) // deduped
  }

  test("polyHash and md5Int match known cross-engine values") {
    import spark.implicits._
    val r = Seq("abc").toDF("t")
      .select(TextFns.polyHash(col("t")), TextFns.md5Int(lit("hello world")))
      .as[(Long, Long)].head()
    assert(r._1 === 96354L) // == duckdb list_reduce fold
    assert(r._2 === 1589001147L) // == duckdb ('0x'||substr(md5,1,8))::BIGINT
  }

  test("custom expressions propagate null instead of failing analysis") {
    import spark.implicits._
    // NullType literal (NullPropagation folds the null-intolerant expr)
    // and a typed-but-null array (null-safe eval) both yield null — the
    // same behavior as null-tolerant builtins (round-2 ADVICE)
    val r = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(
        graft.plans.VectorFunctions.vec_dot(lit(null), col("a")).as("n1"),
        graft.plans.VectorFunctions.vec_dot(col("a"), col("b")).as("n2"),
        graft.plans.VectorFunctions.vec_dot(col("a"), col("a")).as("d"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) === 5.0)
  }

  test("all six custom expressions resolve by name in SQL") {
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  poly_hash('abc') AS ph,
        |  size(word_shingles('a b c d', 3)) AS nsh,
        |  size(word_shingle_hashes('a b c d', 3)) AS nh,
        |  sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS ic,
        |  simhash32('hello world') AS sh""".stripMargin).head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) === 96354L)
    assert(r.getInt(2) === 2 && r.getInt(3) === 2)
    assert(r.getLong(4) === 2L)
    assert(r.getLong(5) >= 0L && r.getLong(5) <= 0xFFFFFFFFL)
  }

  test("textRepetition flags looping/boilerplate docs and passes varied ones") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("rep")
    Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam", "en", "s", 49L),
      (2L, ("the quick brown fox jumps over lazy dogs " +
        "while seven wizards brew unique potions quietly tonight"), "en", "s", 98L),
      (3L, "buy now " * 12 + "limited offer", "en", "s", 109L),
      (4L, "solo", "en", "s", 4L)) // <2 tokens: excluded
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = ops.TextAnalysis.textRepetition(spark, tmp.toString).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(rows === Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("every registered query returns rows at sf0.001 (t1 smoke)") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        val n = fn(spark, TestSpark.sf0001).count()
        if (n > 0 || name.startsWith("dedup_") || name.startsWith("q_anti")) None
        else Some(s"$name: 0 rows")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("every query with an oracle is registered, and entry returns rows") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
