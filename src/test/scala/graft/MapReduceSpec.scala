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
}
