package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jobs.ReferenceJobs

/** Harness-level behaviors from SURVEY.md §2A: size-based line-aligned
  * input splitting (A2) and scheduler progress reporting (A9). */
class HarnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("A2: results invariant under input split size (line-aligned chunking)") {
    val path = "/root/reference/exampleCodes/finding_the_suspects/sample.data"
    // default splits
    val a = ReferenceJobs.suspects(spark, path).collect().map(_.getString(0)).sorted
    // force many small splits — the Spark analogue of the reference's
    // chunk_size form field (Master.java:45): ~64 KB partitions
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      val b = ReferenceJobs.suspects(spark, path).collect().map(_.getString(0)).sorted
      assert(a.toSeq === b.toSeq)
      assert(a.length === 17)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("A9: ProgressListener observes jobs, stages, tasks") {
    val l = new ProgressListener
    spark.sparkContext.addSparkListener(l)
    try {
      Tables(spark, TestSpark.sf0001, "lineitem").groupBy("l_returnflag").count().collect()
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (l.tasksCompleted.get() < 1 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(l.jobsStarted.get() >= 1)
      assert(l.stagesCompleted.get() >= 1)
      assert(l.tasksCompleted.get() >= 1)
      assert(l.phase.nonEmpty && l.phase != "idle")
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
