package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Generic MapReduce compatibility layer — the L2 surface that subsumes
  * the reference harness itself (SURVEY.md §7 step 3).
  *
  * The reference's contract (SURVEY.md §1): a user supplies an arbitrary
  * *mapper* run per chunk and a *reducer* run once over the concatenated
  * mapper outputs (`/root/reference/master/.../Master.java:169-210`,
  * `worker/.../Worker.java:134-160`). Correctness requires map to be
  * chunk-local and reduce to be a merge of partials — exactly Spark's
  * partial/final aggregation model. So the idiomatic port is:
  *
  *   flatMap (mapper, chunk-local) → groupByKey (the shuffle the reference
  *   never had) → Aggregator (partial merge on the map side, final merge
  *   after the shuffle — replacing the single-node reducer process).
  *
  * Unlike the reference, reduce parallelism is per-key, not 1 process
  * (`Master.java:182-208`), removing its hard scalability ceiling.
  */
object MapReduce {

  /** Run a map/reduce job: `mapFn` emits (key, value) pairs per input
    * record; `agg` merges values per key (partial+final). */
  def run[I, K, V, B, O](ds: Dataset[I])(mapFn: I => IterableOnce[(K, V)])(
      agg: Aggregator[V, B, O])(implicit
      kvEnc: Encoder[(K, V)], kEnc: Encoder[K], vEnc: Encoder[V],
      koEnc: Encoder[(K, O)]): Dataset[(K, O)] =
    ds.flatMap(mapFn)
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)

  /** Word count via the generic layer — the reference's W1 expressed as a
    * user map/reduce program against our API instead of an uploaded C++
    * process. */
  def wordCount(lines: Dataset[String]): Dataset[(String, Long)] = {
    val spark = lines.sparkSession
    import spark.implicits._
    run(lines)(line => line.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1L)))(SumLong)
  }

  /** Sum aggregator: the canonical partial+final merge. */
  object SumLong extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
    def outputEncoder: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
  }

}

/** Literal external-executable support — the reference's "the user program
  * IS the UDF" surface (`Worker.java:138,153`: mapper run as an OS process
  * over a chunk file). `RDD.pipe` gives the same line-stream contract,
  * distributed: each partition's lines stream through the command's
  * stdin/stdout. On-worker compilation of C++ (`Worker.java:145-153`) is
  * deliberately not ported; any executable already on the workers works.
  */
object Pipe {
  def run(lines: Dataset[String], cmd: Seq[String]): Dataset[String] = {
    val spark = lines.sparkSession
    import spark.implicits._
    spark.createDataset(lines.rdd.pipe(cmd))
  }

  /** Run a user-supplied python mapper *file* per partition. The script
    * source is read once on the driver and inlined into the command
    * (`python3 -c`), so it is self-contained on every executor of a real
    * cluster — a driver-local path would not exist on remote workers. */
  def runScript(lines: Dataset[String], scriptPath: String): Dataset[String] = {
    val src = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(scriptPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    run(lines, Seq("python3", "-c", src))
  }
}
