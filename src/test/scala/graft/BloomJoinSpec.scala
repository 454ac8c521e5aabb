package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the third leg of the 100 TB join
  * toolkit next to bucketing (BucketingSpec) and AQE skew splitting
  * (AqeSkewSpec): when a selective filter sits on the build side of a
  * shuffle join, Catalyst's InjectRuntimeFilter builds a bloom filter
  * from the filtered keys (`bloom_filter_agg`) and pushes a
  * `might_contain` probe into the other side's scan, so the fact table
  * drops non-joining rows BEFORE the shuffle instead of carrying them
  * to the join. At 100 TB that is the difference between shuffling the
  * full fact table and shuffling the ~fraction that survives the
  * dimension filter.
  *
  * The thresholds exist because the filter costs a scan of the build
  * side: `applicationSideScanSizeThreshold` (default 10 GB) gates it to
  * probe sides big enough to repay that, lowered here to fire at test
  * scale; broadcast is disabled because a broadcast join already
  * prunes at the hash table and needs no bloom filter.
  */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private val tuning = Map(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
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

  private def query() = {
    val orders = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    Tables(spark, dir, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
  }

  test("a selective build-side filter injects a bloom probe into the fact scan") {
    withConfs(tuning) {
      val q = query()
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter_agg"), "build side must aggregate a bloom filter")
      assert(opt.contains("might_contain"), "probe side must carry the might_contain filter")
      // the probe must land on the lineitem (application) side: the
      // might_contain call references the fact join key
      assert(opt.replaceAll("(?s)might_contain.*?l_orderkey", "<HIT>").contains("<HIT>"),
        "might_contain must filter l_orderkey")
    }
  }

  test("the runtime filter is a pure execution rewrite: results are identical") {
    val off = withConfs(tuning + ("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")) {
      query().collect().map(_.toString).sorted
    }
    val on = withConfs(tuning) {
      val q = query()
      assert(q.queryExecution.optimizedPlan.toString.contains("might_contain"))
      q.collect().map(_.toString).sorted
    }
    assert(on === off)
    assert(on.nonEmpty)
  }
}
