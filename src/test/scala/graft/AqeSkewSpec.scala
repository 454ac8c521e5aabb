package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew handling: AQE splits q_skew_join's hot shuffle partition.
  *
  * The 100 TB story has two answers to hot keys — manual salting
  * (q_salted_agg, chosen at write time) and AQE's skew-join split
  * (chosen at RUN time from actual partition sizes). This spec pins the
  * second: with the skew thresholds scaled down to test-data volumes
  * (the defaults are sized for 256 MB shuffle partitions), the executed
  * plan must contain a sort-merge join marked `skew=true`, and the
  * result must be bit-identical to the same query with skew handling
  * off — the split is a physical rewrite only.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  // sf0.01: the hot partition needs enough COMPRESSED shuffle bytes to
  // clear the (already lowered) skew threshold; sf0.001 shuffles only a
  // few KB and AQE just coalesces everything instead
  private val sf001 = "/root/testdata/sf0.01"

  private val tuning = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.5",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
  )

  private def withConfs[A](confs: Map[String, String])(body: => A): A = {
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition (skew=true) without changing the result") {
    val (skewRows, plan) = withConfs(tuning) {
      val df = ops.Relational.qSkewJoin(spark, sf001)
      val rows = df.collect()
      (rows, df.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("skew=true"),
      s"no skew-split join in the executed plan:\n${plan.take(2000)}")
    val plainRows = withConfs(Map("spark.sql.adaptive.skewJoin.enabled" -> "false")) {
      ops.Relational.qSkewJoin(spark, sf001).collect()
    }
    assert(skewRows.toSeq === plainRows.toSeq)
    assert(skewRows.nonEmpty)
  }
}
