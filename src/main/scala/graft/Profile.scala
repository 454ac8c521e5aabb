package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Optimization-round measurement main (guide §1): run named queries
  * with a job-level listener and print, per query, every Spark job's
  * wall time, description, and stage count — the breakdown that tells
  * fixed per-job overhead apart from real compute (the Spark UI is
  * disabled in this environment, so this is the stand-in for the
  * Jobs/Stages pages). Profiling only; the bench contract lives in
  * [[Bench]] and is untouched.
  *
  * Usage: sbt "runMain graft.Profile <query> [query ...]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MPB", "2097152"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, desc: String, start: Long, var end: Long = 0L,
      var stages: Int = 0, var execMs: Long = 0L, var cpuMs: Long = 0L,
      var tasks: Int = 0, var shufR: Long = 0L, var shufW: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val j = Option(stageToJob.get(sc.stageInfo.stageId)).map(jobs.get).orNull
        if (j != null) {
          val m = sc.stageInfo.taskMetrics
          j.execMs += m.executorRunTime
          j.cpuMs += m.executorCpuTime / 1000000L
          j.tasks += sc.stageInfo.numTasks
          j.shufR += m.shuffleReadMetrics.totalBytesRead
          j.shufW += m.shuffleWriteMetrics.bytesWritten
        }
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        js.stageInfos.foreach(si => stageToJob.put(si.stageId, js.jobId))
        val props = Option(js.properties)
        val desc = props.flatMap(p => Option(p.getProperty("spark.job.description")))
          // the streaming engine's own description is id/runId noise —
          // fall through to the call site for those
          .filterNot(_.contains("runId"))
        val d = desc
          .orElse(props.flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?").replaceAll("\\s+", " ")
        jobs.put(js.jobId, Job(js.jobId, d, js.time, stages = js.stageInfos.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.end = je.time
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val q = SparkEntry.queries(name)
      // warmup (codegen/JIT/page cache), untimed and unprofiled
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      jobs.clear()
      val t0 = System.nanoTime()
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // let the listener bus drain
      Thread.sleep(300)
      val js = jobs.values().toArray(Array.empty[Job]).sortBy(_.id)
      val jobSum = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
      println(f"== $name%s wall=$wall%.3fs jobs=${js.length}%d jobTimeSum=$jobSum%.3fs gap=${wall - jobSum}%.3fs")
      val w0 = js.headOption.map(_.start).getOrElse(0L)
      js.foreach { j =>
        println(f"  job ${j.id}%4d ${math.max(0L, j.end - j.start) / 1e3}%7.3fs at=${(j.start - w0) / 1e3}%7.3f stages=${j.stages}%2d exec=${j.execMs / 1e3}%7.3f cpu=${j.cpuMs / 1e3}%7.3f tasks=${j.tasks}%3d shufR=${j.shufR}%9d shufW=${j.shufW}%9d  ${j.desc.take(120)}%s")
      }
    }
    spark.stop()
  }
}
