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
  }
}
