package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth: results written as CSV and JSON round-trip
  * losslessly (the reference only ever reads/writes line text; the engine
  * exposes Spark's full format set for free — this pins the two most
  * common interchange formats). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("csv and json sinks round-trip a query result") {
    val base = java.nio.file.Files.createTempDirectory("graft-formats")
    val df = ops.Relational.q1PricingSummary(spark, TestSpark.sf0001)
    val expected = df.collect().map(_.toSeq).toSeq

    df.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val csvBack = spark.read.option("header", "true").schema(df.schema).csv(s"$base/csv")
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    assert(csvBack.collect().map(_.toSeq).toSeq === expected)

    df.write.mode("overwrite").json(s"$base/json")
    val jsonBack = spark.read.schema(df.schema).json(s"$base/json")
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    assert(jsonBack.collect().map(_.toSeq).toSeq === expected)

    // ORC: the other columnar interchange format warehouses expect
    df.write.mode("overwrite").orc(s"$base/orc")
    val orcBack = spark.read.schema(df.schema).orc(s"$base/orc")
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    assert(orcBack.collect().map(_.toSeq).toSeq === expected)
  }

  test("partitioned corpus sink prunes partitions on language-filtered reads") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").resolve("corpus")
    ops.Curation.materializeCorpus(spark, TestSpark.sf0001, out.toString)
    // hive-style lang=... directories exist
    assert(java.nio.file.Files.exists(out.resolve("lang=en")))

    val back = spark.read.parquet(out.toString).filter(col("lang") === "en")
    val expected = ops.Curation.curateSampleStratified(spark, TestSpark.sf0001)
      .filter(col("lang") === "en").count()
    assert(back.count() === expected)
    assert(expected > 0)

    // the filter must land in PartitionFilters (directory pruning), not
    // as a data filter evaluated per row
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(800))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.replaceAll(""".*PartitionFilters: \[([^\]]*)\].*""", "$1").contains("lang"),
      s"lang filter not pushed to partition pruning: $pf")
  }
}
