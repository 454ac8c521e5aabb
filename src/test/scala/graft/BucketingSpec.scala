package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: writing both join sides bucketed by
  * the join key lets the sort-merge join read bucket-aligned splits with
  * NO shuffle exchange — the pre-partitioning strategy for repeated big
  * joins at 100 TB (pay the shuffle once at write time, never again). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed join plans without a shuffle and matches the unbucketed result") {
    val base = java.nio.file.Files.createTempDirectory("graft-buckets")
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
    val orders = Tables(spark, TestSpark.sf0001, "orders")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the test exercises the bucketed SMJ path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      li.write.bucketBy(8, "l_orderkey")
        .option("path", s"$base/li_b").mode("overwrite").format("parquet")
        .saveAsTable("li_b")
      orders.write.bucketBy(8, "o_orderkey")
        .option("path", s"$base/ord_b").mode("overwrite").format("parquet")
        .saveAsTable("ord_b")

      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      val bucketed = joined.agg(count(lit(1)), sum(col("l_quantity"))).head()
      val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)), sum(col("l_quantity"))).head()
      assert(bucketed.getLong(0) === plain.getLong(0))
      assert(bucketed.getDouble(1) === plain.getDouble(1))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
