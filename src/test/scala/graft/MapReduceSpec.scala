package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mr.{MapReduce, Pipe}

/** The generic map/reduce contract (SURVEY.md §1): map chunk-local,
  * reduce = correct merge of partials ⇒ results must be invariant under
  * partitioning and input order. */
class MapReduceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def lines(n: Int, seed: Int) = {
    val words = Seq("a", "bb", "ccc", "dd", "e")
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(1 + rnd.nextInt(5))(words(rnd.nextInt(words.size))).mkString(" "))
  }

  test("MapReduce word count equals a naive oracle") {
    import spark.implicits._
    val data = lines(500, 1)
    val expected = data.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = MapReduce.wordCount(data.toDS()).collect().toMap
    assert(got === expected)
  }

  test("result is invariant under partition count (chunking invariance)") {
    import spark.implicits._
    val data = lines(500, 2)
    val one = MapReduce.wordCount(data.toDS().repartition(1)).collect().toMap
    val many = MapReduce.wordCount(data.toDS().repartition(13)).collect().toMap
    assert(one === many)
  }

  test("result is invariant under input order") {
    import spark.implicits._
    val data = lines(500, 3)
    val a = MapReduce.wordCount(data.toDS()).collect().toMap
    val b = MapReduce.wordCount(scala.util.Random.shuffle(data).toDS()).collect().toMap
    assert(a === b)
  }

  test("Pipe streams lines through an external process (cat)") {
    import spark.implicits._
    val data = lines(100, 4)
    val out = Pipe.run(data.toDS(), Seq("cat")).collect()
    assert(out.sorted.toSeq === data.sorted)
  }

  test("Pipe runs a python mapper (reference A4 contract)") {
    import spark.implicits._
    val script = java.nio.file.Files.createTempFile("mapper", ".py")
    java.nio.file.Files.write(script,
      "import sys\nfor line in sys.stdin:\n    print(len(line.strip()))\n".getBytes)
    val out = Pipe.run(Seq("abc", "de").toDS().coalesce(1), Seq("python3", script.toString))
      .collect().map(_.toInt).sorted
    assert(out.toSeq === Seq(2, 3))
  }

  test("runArgvScript runs an argv-file program per partition (reference Worker.java:138 contract)") {
    import spark.implicits._
    // a sys.argv[1]/sys.argv[2] program — the shape Pipe.run CANNOT run
    val script = java.nio.file.Files.createTempFile("argv-upper", ".py")
    java.nio.file.Files.write(script,
      ("import sys\n" +
        "with open(sys.argv[1]) as fi, open(sys.argv[2], 'w') as fo:\n" +
        "    for line in fi:\n" +
        "        fo.write(line.strip().upper() + '\\n')\n").getBytes)
    val data = lines(100, 5)
    val out = Pipe.runArgvScript(data.toDS().repartition(7), script.toString).collect()
    assert(out.sorted.toSeq === data.map(_.toUpperCase).sorted)
  }

  private def argvTempFiles(): Seq[String] = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    tmp.listFiles().map(_.getName).filter(_.startsWith("graft-argv-")).toSeq
  }

  test("runArgv streams its out-file lazily and deletes temps: full, partial, empty reads") {
    import spark.implicits._
    // an EXPANDING mapper: each input line produces 2000 output lines —
    // the shape that OOMs if the out-file is materialized per partition
    val script = java.nio.file.Files.createTempFile("argv-expand", ".py")
    java.nio.file.Files.write(script,
      ("import sys\n" +
        "with open(sys.argv[1]) as fi, open(sys.argv[2], 'w') as fo:\n" +
        "    for line in fi:\n" +
        "        for i in range(2000):\n" +
        "            fo.write(line.strip() + ':' + str(i) + '\\n')\n").getBytes)
    val before = argvTempFiles()
    val data = (1 to 50).map(i => s"row$i")
    val ds = Pipe.runArgvScript(data.toDS().repartition(4), script.toString)
    // full consumption
    assert(ds.count() === 50L * 2000)
    // partial consumption: limit abandons the iterator mid-file — the
    // task-completion listener must still delete the temps
    assert(ds.limit(7).collect().length === 7)
    // empty output
    val empty = java.nio.file.Files.createTempFile("argv-empty", ".py")
    java.nio.file.Files.write(empty,
      "import sys\nopen(sys.argv[2], 'w').close()\n".getBytes)
    assert(Pipe.runArgvScript(Seq("x").toDS(), empty.toString).collect().isEmpty)
    // no graft-argv temp files left beyond whatever predated the test
    val leaked = argvTempFiles().diff(before)
    assert(leaked.isEmpty, s"leaked argv temp files: $leaked")
  }

  test("runArgv fails loudly when the program exits nonzero") {
    import spark.implicits._
    val script = java.nio.file.Files.createTempFile("argv-fail", ".py")
    java.nio.file.Files.write(script, "import sys\nsys.exit(3)\n".getBytes)
    val ex = intercept[Exception] {
      Pipe.runArgvScript(Seq("x").toDS(), script.toString).collect()
    }
    assert(ex.getMessage.contains("exited 3") ||
      Option(ex.getCause).exists(_.getMessage.contains("exited 3")))
  }
}
