package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.jobs.ReferenceJobs

/** A8 text sink round-trip + approximate-distinct accuracy. */
class SinkAndApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("writeResultText emits reference-format lines (W4 golden round-trip)") {
    val refDir = "/root/reference/exampleCodes/finding_the_suspects"
    val result = ReferenceJobs.suspects(spark, s"$refDir/sample.data")
    val out = java.nio.file.Files.createTempDirectory("sink").toString
    ReferenceJobs.writeResultText(result, out)

    def canon(lines: Iterator[String]): Seq[(String, Seq[String])] =
      lines.filter(_.nonEmpty).map { l =>
        val p = l.trim.split("\\s+"); (p.head, p.tail.sorted.toSeq)
      }.toSeq.sortBy(_._1)

    val written = canon(spark.read.textFile(out).collect().iterator)
    val golden = canon(scala.io.Source.fromFile(s"$refDir/final_result.out").getLines())
    assert(written === golden)
  }

  test("approx_count_distinct: exact columns match, every in-bounds flag true") {
    // bounds-check oracle form: the query itself carries the exact
    // counts and a per-sketch flag; the independent qDistinctCounts
    // cross-checks the exact side
    val rows = ops.Relational.qApproxDistinct(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(5)),
          (r.getBoolean(2), r.getBoolean(4), r.getBoolean(6)))).toMap
    val exact = ops.Relational.qDistinctCounts(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === exact.keySet)
    for ((k, (es, oks)) <- rows) {
      assert(es === exact(k), s"$k: exact columns $es vs recount ${exact(k)}")
      assert(oks == ((true, true, true)), s"$k: HLL out of bounds: $oks")
    }
  }

  test("sketch-only heavy hitters serve every truly-heavy word, no exact pass") {
    val out = ops.TextAnalysis.textHeavyHittersSketch(spark, TestSpark.sf0001).collect()
    val served = out.map(_.getString(0)).toSet
    // exact side is computed HERE, test-only — the operator under test never does
    val words = Tables(spark, TestSpark.sf0001, "documents")
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("word"))
    val total = words.count()
    val threshold = math.max(1L, math.ceil(total * ops.TextAnalysis.hhFraction).toLong)
    val exactCounts = words.groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactHeavy = exactCounts.filter(_._2 >= threshold).keySet
    assert(exactHeavy.nonEmpty, "no word reaches the serving threshold — test is vacuous")
    // containment: Misra-Gries candidates + CMS overestimate can never
    // drop a word with exact freq >= threshold (pigeonhole + est >= exact)
    assert(exactHeavy.subsetOf(served), s"sketch path missed: ${exactHeavy -- served}")
    // soundness: every served word is within eps·N of the threshold, and
    // its estimate obeys the one-sided CMS bound
    val slack = (ops.TextAnalysis.cmsEps * total).ceil.toLong
    out.foreach { r =>
      val (w, est) = (r.getString(0), r.getLong(1))
      val exact = exactCounts.getOrElse(w, 0L)
      assert(est >= exact, s"$w: CMS underestimated ($est < $exact)")
      assert(est - exact <= slack, s"$w: error ${est - exact} > eps*N $slack")
      assert(exact >= threshold - slack, s"$w served but exact $exact << threshold $threshold")
    }
  }

  test("count-min sketch estimates bound the exact counts (one-sided, eps·N)") {
    import org.apache.spark.sql.functions._
    val rows = ops.TextAnalysis.textHeavyHitters(spark, TestSpark.sf0001).collect()
    assert(rows.length === 20)
    val totalTokens = Tables(spark, TestSpark.sf0001, "documents")
      .select(sum(size(graft.functions.TextFns.tokens(col("text"))))).head().getLong(0)
    val bound = (ops.TextAnalysis.cmsEps * totalTokens).ceil.toLong
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: CMS underestimated ($est < $exact)")
      assert(est - exact <= bound, s"${r.getString(0)}: error ${est - exact} > eps*N $bound")
    }
  }
}
