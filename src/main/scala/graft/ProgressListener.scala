package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Progress reporting (SURVEY.md §2 A9): the reference polls a mutable
  * phase string over HTTP (`/root/reference/master/.../Master.java:71-73`,
  * `GET /progress`); the Spark-native equivalent is a SparkListener fed
  * by the scheduler. `phase` is the machine-readable analogue of the
  * reference's "Mapper phase... / Reducer phase... / All done!" strings.
  */
class ProgressListener extends SparkListener {
  val jobsStarted = new AtomicInteger(0)
  val stagesCompleted = new AtomicInteger(0)
  val tasksCompleted = new AtomicInteger(0)
  private val current = new AtomicReference[String]("idle")

  def phase: String = current.get()

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    jobsStarted.incrementAndGet()
    current.set(s"job ${js.jobId}: ${js.stageInfos.size} stages")
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    stagesCompleted.incrementAndGet()
    current.set(s"stage ${sc.stageInfo.stageId} done (${sc.stageInfo.numTasks} tasks)")
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    tasksCompleted.incrementAndGet()
  }
}
