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
  * over a chunk file). `RDD.pipe` gives the stdin/stdout line contract,
  * distributed; `runArgv`/`runArgvScript` give the reference's argv-file
  * contract; `runArgvCpp` ports its on-worker C++ compilation
  * (`Worker.java:145-153`), so all four shipped reference workloads run
  * with their unmodified programs (ReferenceGoldenSpec).
  */
object Pipe {
  def run(lines: Dataset[String], cmd: Seq[String]): Dataset[String] = {
    val spark = lines.sparkSession
    import spark.implicits._
    spark.createDataset(lines.rdd.pipe(cmd))
  }

  /** Run a user-supplied python mapper *file* per partition over the
    * stdin/stdout line contract. The script source is read once on the
    * driver and inlined into the command (`python3 -c`), so it is
    * self-contained on every executor of a real cluster — a driver-local
    * path would not exist on remote workers. Inlining breaks scripts that
    * use `__file__`/`sys.argv` and large scripts can exceed exec arg
    * limits; those go through `runArgvScript`, which ships the file with
    * `SparkContext.addFile` instead. */
  def runScript(lines: Dataset[String], scriptPath: String): Dataset[String] = {
    val src = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(scriptPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    run(lines, Seq("python3", "-c", src))
  }

  /** The reference's argv-file contract (`Worker.java:138,153`): the user
    * program is executed as `prog <in-file> <out-file>` over a chunk
    * file, NOT over stdin/stdout — the reference's own shipped example
    * mappers read `sys.argv[1]` and write `sys.argv[2]`. Per partition:
    * spill the partition's lines to a temp in-file, exec the program,
    * stream its out-file back as the partition's output.
    *
    * The out-file is read LAZILY, line by line (round-3 verdict #8): a
    * mapper that expands its input (or a chunk sized near executor
    * headroom) would OOM if the whole file were materialized, and
    * downstream operators with map-side pruning (limit, partial top-k)
    * would pay for lines they never pull. The in-file is deleted as soon
    * as the program exits; the out-file when its iterator is exhausted,
    * with a task-completion listener as the safety net for consumers
    * that stop early — so neither early termination nor task failure
    * leaks temp files.
    *
    * `cmdF` is evaluated ON THE EXECUTOR (so `SparkFiles.get` resolves
    * the shipped copy); it returns the argv prefix the two file paths are
    * appended to. */
  def runArgv(lines: Dataset[String], cmdF: () => Seq[String]): Dataset[String] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.mapPartitions { it =>
      val in = java.nio.file.Files.createTempFile("graft-argv-in", ".data")
      val out = java.nio.file.Files.createTempFile("graft-argv-out", ".data")
      def cleanup(reader: java.io.Reader): Unit = {
        if (reader != null) scala.util.Try(reader.close())
        java.nio.file.Files.deleteIfExists(in)
        java.nio.file.Files.deleteIfExists(out)
      }
      val w = java.nio.file.Files.newBufferedWriter(in, java.nio.charset.StandardCharsets.UTF_8)
      try {
        try it.foreach { l => w.write(l); w.write('\n') } finally w.close()
        val cmd = cmdF() ++ Seq(in.toString, out.toString)
        // stderr merged into stdout and FULLY drained before waitFor: a
        // program chatty on either stream would otherwise fill the ~64KB
        // pipe buffer, block on write, and deadlock the task
        val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        proc.getOutputStream.close()
        val log = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8").mkString
        val exit = proc.waitFor()
        if (exit != 0)
          throw new RuntimeException(s"argv program exited $exit: ${cmd.mkString(" ")}\n$log")
      } catch { case e: Throwable => cleanup(null); throw e }
      java.nio.file.Files.deleteIfExists(in) // program done reading it
      val reader = java.nio.file.Files.newBufferedReader(out, java.nio.charset.StandardCharsets.UTF_8)
      // safety net: a downstream limit may abandon the iterator mid-file
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx != null) ctx.addTaskCompletionListener[Unit](_ => cleanup(reader))
      new Iterator[String] {
        private var line = reader.readLine()
        if (line == null) cleanup(reader) // empty output: release eagerly
        def hasNext: Boolean = line != null
        def next(): String = {
          val l = line
          line = reader.readLine()
          if (line == null) cleanup(reader) // exhausted: release before task end
          l
        }
      }
    }
  }

  /** Driver-side memo of shipped program files, keyed by (applicationId,
    * content-md5): `addFile` registers by basename for the lifetime of
    * the context and has no removeFile, so re-shipping per invocation
    * (bench loops re-run queries hundreds of times) would grow the
    * driver file server and every executor's fetch dir without bound.
    * Identical content ships once; distinct content gets a fresh unique
    * basename (two different `mapper.py`s never collide). */
  private val shippedFiles = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def shipOnce(sc: org.apache.spark.SparkContext, path: java.nio.file.Path): String = {
    val bytes = java.nio.file.Files.readAllBytes(path)
    val key = sc.applicationId + "|" + graft.plans.HashUtil.md5Hex(bytes)
    shippedFiles.computeIfAbsent(key, _ => {
      val unique = java.nio.file.Files.createTempFile("graft-script-", "-" + path.getFileName)
      java.nio.file.Files.write(unique, bytes)
      sc.addFile(unique.toString)
      unique.getFileName.toString
    })
  }

  /** Run a user script file under the argv contract, shipping it to every
    * executor with `SparkContext.addFile` (once per distinct content —
    * see shipOnce). */
  def runArgvScript(lines: Dataset[String], scriptPath: String,
      interpreter: String = "python3"): Dataset[String] = {
    val shippedName = shipOnce(lines.sparkSession.sparkContext,
      java.nio.file.Paths.get(scriptPath))
    runArgv(lines, () => Seq(interpreter, org.apache.spark.SparkFiles.get(shippedName)))
  }

  /** On-worker compilation of C++ user programs — the reference's
    * `codeLang == "cpp"` path (`Worker.java:145-153`, `Master.java:184-201`:
    * `g++ --std=c++11 code.cpp -o binary.out`, then `binary <in> <out>`).
    * The source ships with `addFile`; each executor JVM compiles it at
    * most once (memoized below) — separate JVMs on a real cluster each
    * compile their own copy, exactly the reference's once-per-worker
    * behavior. */
  def runArgvCpp(lines: Dataset[String], cppPath: String): Dataset[String] = {
    val shippedName = shipOnce(lines.sparkSession.sparkContext,
      java.nio.file.Paths.get(cppPath))
    runArgv(lines, () => Seq(Pipe.compiledBinary(shippedName)))
  }

  /** Executor-side compile memo (JVM-global: one compile per worker per
    * shipped source, concurrent partitions share the result). */
  private val binaries = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[mr] def compiledBinary(shippedName: String): String =
    binaries.computeIfAbsent(shippedName, _ => {
      val srcPath = org.apache.spark.SparkFiles.get(shippedName)
      val bin = java.nio.file.Files.createTempFile("graft-cpp-", ".out")
      val cmd = Seq("g++", "--std=c++11", srcPath, "-o", bin.toString)
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      p.getOutputStream.close()
      val log = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8").mkString
      if (p.waitFor() != 0)
        throw new RuntimeException(s"worker-side g++ failed for $shippedName:\n$log")
      bin.toFile.setExecutable(true)
      bin.toString
    })

  /** Dispatch a user program by extension, like the reference's
    * `codeLang` switch: `.cpp` compiles on the worker, anything else
    * runs under `interpreter`. */
  private def argvRunner(lines: Dataset[String], path: String, interpreter: String) =
    if (path.endsWith(".cpp")) runArgvCpp(lines, path)
    else runArgvScript(lines, path, interpreter)

  /** The reference's literal end-to-end job (`Master.java:169-210`):
    * mapper program per chunk, then ONE reducer process over the
    * concatenation of all mapper outputs — the reference's merged-file
    * reduce, including its single-process ceiling (the scalable
    * alternative is MapReduce.run's per-key Aggregator). The single
    * stream is `repartition(1)` — a shuffle barrier — NOT `coalesce(1)`,
    * whose narrow dependency would pull the mapper stage into the one
    * reduce task and run every mapper process sequentially on a single
    * core; the reference runs mappers in parallel across workers and
    * only the reducer alone. Both programs run verbatim under the argv
    * contract — `.py` via the interpreter, `.cpp` compiled on the
    * worker — so a user's existing mapper/reducer pair works unmodified
    * in either language. */
  def argvMapReduce(lines: Dataset[String], mapperScript: String, reducerScript: String,
      interpreter: String = "python3"): Dataset[String] =
    argvRunner(argvRunner(lines, mapperScript, interpreter).repartition(1),
      reducerScript, interpreter)
}
