package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", "4")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"

  /** The correctness-gate scale — for pins that must hold on the SAME
    * corpus the DuckDB oracle compare runs against (e.g. "the lowcut
    * MaxScore twins really take the pruned path there"). */
  val sf001 = "/root/testdata/sf0.01"
}
