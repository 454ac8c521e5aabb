package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** BPE tokenizer induction against an independent in-memory reference
  * implementation of the same rules (overlap-counted pair frequencies,
  * lexicographic tie-break, boundary-anchored two-pass merge — see
  * `textBpeTrain`'s scaladoc for why two passes reach the fixed
  * point). */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def referenceBpe(words: Seq[String], k: Int): Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[String, Long] = words.groupBy(identity)
      .map { case (w, g) => w.split("").mkString(" ") -> g.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      vocab.foreach { case (w, f) =>
        w.split(" ").sliding(2).foreach {
          case Array(l, r) => counts((l, r)) += f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((step.toLong, l, r, l + r, c))
        val (pat, rep) = (s" $l $r ", s" ${l + r} ")
        vocab = vocab.map { case (w, f) =>
          (" " + w + " ").replace(pat, rep).replace(pat, rep).trim -> f
        }
        step += 1
      }
    }
    out.toSeq
  }

  test("learned merges match the reference implementation on a planted corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe-train").toString
    val texts = Seq(
      "low lower lowest low low lowest",
      "new newer newest new wider wide wide newer",
      "low lower newer new wide west lowest wide")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.textBpeTrain(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    val words = texts.flatMap(_.split("\\s+"))
    val want = referenceBpe(words, TextAnalysis.bpeTrainMerges)
    assert(got.nonEmpty && got === want,
      s"merge tables diverged:\n got: $got\nwant: $want")
    // the merged symbol really is the concatenation, and steps are 1..n
    got.foreach { case (_, l, r, m, _) => assert(m == l + r) }
    assert(got.map(_._1) == (1L to got.size))
  }

  test("training reads the corpus once: merge iterations run over the cached vocabulary") {
    val dir = TestSpark.sf0001
    val docBytes = new java.io.File(s"$dir/documents.parquet").listFiles() match {
      case null => new java.io.File(s"$dir/documents.parquet").length()
      case fs => fs.filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val acc = new java.util.concurrent.atomic.AtomicLong()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) acc.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      assert(TextAnalysis.textBpeTrain(spark, dir).count() > 0)
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(l)
    // one corpus read for the word-frequency aggregation (+ cache
    // materialization slack); K iterations re-scanning the parquet
    // would read >= K times the file size
    assert(acc.get() < 3 * docBytes,
      s"BPE training read ${acc.get()} B against a $docBytes B corpus — " +
        "iterations are re-reading the documents parquet instead of the cached vocab")
  }
}
