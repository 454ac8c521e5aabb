package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, Autopilot, TextAnalysis}

/** The autopilot drives a drifted-then-healed lifecycle end-to-end
  * through ONE entry point: health report → threshold → maintenance op
  * → healthy report → no-op on the next pass. Thresholds are evaluated
  * against exactly the metrics the oracled health queries emit. */
class AutopilotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def decisions(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
      r.getString(4), r.getBoolean(5))).toSeq

  test("IVF drift lifecycle: skew alarm -> retrain -> balanced -> no-op") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("autopilot-ivf").toString
    def vec(id: Long, shift: Double): Seq[Float] =
      (0 until 64).map(d =>
        (math.sin(id * 0.7 + d * 1.3) * 0.5 + (if (d == 0) shift else 0.0)).toFloat)
    // seed blob around the origin; drifted landing batch far along e0
    (0L until 1000L).map(i => (i, vec(i, 0.0), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/seed/embeddings.parquet")
    (2000L until 3000L).map(i => (i, vec(i, 50.0), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/batch/embeddings.parquet")
    AnnIndex.ivfIndexWrite(spark, s"$tmp/seed", s"$tmp/idx")
    AnnIndex.ivfIndexAppend(spark, s"$tmp/batch", s"$tmp/idx")
    def skew(): Double = AnnIndex.ivfIndexHealth(spark, s"$tmp/idx").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap.apply("hot_list_skew")
    val drifted = skew()
    assert(drifted > 3.0, s"drift staging too weak: skew $drifted")
    // ONE entry point: alarm -> retrain over the index's corpus dirs
    val d1 = decisions(Autopilot.indexAutopilot(spark, s"$tmp/idx",
      Seq(s"$tmp/seed", s"$tmp/batch"), hotListSkewMax = 3.0))
    assert(d1.exists { case (f, t, v, a, p) =>
      f == "ivf" && t == "hot_list_skew" && v == drifted && a == "retrain" && p },
      s"retrain did not fire: $d1")
    val healed = skew()
    assert(healed < 3.0, s"retrain did not re-balance: skew $drifted -> $healed")
    // serving still covers the whole corpus after the autopilot pass
    assert(spark.read.parquet(s"$tmp/idx/lists").select(col("vec_id"))
      .distinct().count() == 2000L)
    // second pass on the healed index: nothing fires
    val d2 = decisions(Autopilot.indexAutopilot(spark, s"$tmp/idx",
      Seq(s"$tmp/seed", s"$tmp/batch"), hotListSkewMax = 3.0))
    assert(d2.forall(!_._5), s"autopilot acted on a healthy index: $d2")
  }

  test("text staleness lifecycle: frozen stats drift -> compact -> caught up -> no-op") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("autopilot-text").toString
    def doc(i: Long) = (i, s"alpha beta w$i t${i % 7}", "en", "s")
    (1L to 100L).map(doc).toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/c/documents.parquet")
    TextAnalysis.textIndexWrite(spark, s"$tmp/c", s"$tmp/idx")
    // 40 appended docs: staleness share 0.4 over the frozen stats
    TextAnalysis.textIndexAppendBatch(spark,
      (101L to 140L).map(doc).toDF("doc_id", "text", "lang", "source"), s"$tmp/idx")
    def health(): Map[String, Double] = TextAnalysis.textIndexHealth(spark, s"$tmp/idx")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(health()("stats_staleness") == 40.0)
    val d1 = decisions(Autopilot.indexAutopilot(spark, s"$tmp/idx"))
    assert(d1.exists { case (f, t, _, a, p) =>
      f == "text" && t == "stats_staleness_share" && a == "compact" && p },
      s"staleness compact did not fire: $d1")
    val h2 = health()
    assert(h2("stats_staleness") == 0.0 && h2("stats_n_docs") == 140.0,
      s"compact did not catch the statistics up: $h2")
    val d2 = decisions(Autopilot.indexAutopilot(spark, s"$tmp/idx"))
    assert(d2.forall(!_._5), s"autopilot acted on a healthy text index: $d2")
  }

  test("tombstone debt compacts; unknown layouts fail loudly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("autopilot-ts").toString
    (1L to 50L).map(i => (i, s"gamma delta w$i", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/c/documents.parquet")
    TextAnalysis.textIndexWrite(spark, s"$tmp/c", s"$tmp/idx")
    TextAnalysis.textIndexDelete(spark, s"$tmp/idx", Seq(3L, 4L))
    val d = decisions(Autopilot.indexAutopilot(spark, s"$tmp/idx"))
    assert(d.exists { case (_, t, v, a, p) =>
      t == "pending_tombstones" && v == 2.0 && a == "compact" && p }, s"$d")
    assert(TextAnalysis.textIndexHealth(spark, s"$tmp/idx").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
      .apply("pending_tombstones") == 0.0, "compact did not retire the tombstones")
    intercept[IllegalArgumentException](
      Autopilot.indexAutopilot(spark, s"$tmp/nothing-here"))
  }
}
