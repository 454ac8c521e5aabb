package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's four example workloads as first-class jobs over
  * line-oriented text files — the literal input format the reference
  * ingests (`/root/reference/master/.../Master.java:112-114,229`: one
  * uploaded text file, split on line boundaries). A user of the reference
  * points these at the same data file they upload today.
  *
  * Input partitioning is Spark's line-aligned file splitting
  * (`spark.sql.files.maxPartitionBytes` ≈ the reference's chunk_size form
  * field, default 10 MB, `Master.java:45`); all aggregation is
  * partial+final hash aggregation instead of the reference's single
  * reducer process.
  */
object ReferenceJobs {

  /** W1 word_count (`exampleCodes/word_count/`): word → frequency,
    * ordered by word (the reference's std::map iteration order). */
  def wordCount(s: SparkSession, path: String): DataFrame =
    s.read.textFile(path).toDF("value")
      .select(explode(split(col("value"), graft.functions.TextFns.WhitespaceRegex)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))

  /** W2 char_count (`exampleCodes/char_count/`): every non-newline char
    * (spaces included, `mapper.py:10-11`) → frequency. */
  def charCount(s: SparkSession, path: String): DataFrame =
    s.read.textFile(path).toDF("value")
      .select(explode(split(col("value"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("ch")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("ch"))

  /** W3 finding_peek_numbers (`exampleCodes/finding_peek_numbers/`): rows
    * `op number start end`; per op, the max over seconds of
    * count(distinct number active that second). Interval expansion via
    * `explode(sequence(start, end))` — the Catalyst form of the mapper's
    * per-second loop (`mapper.cpp:26-30`). */
  def peakNumbers(s: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), graft.functions.TextFns.WhitespaceRegex)
    s.read.textFile(path).toDF("value")
      .select(
        parts.getItem(0).as("op"),
        parts.getItem(1).as("number"),
        parts.getItem(2).cast("int").as("start"),
        parts.getItem(3).cast("int").as("end"))
      .select(col("op"), col("number"), explode(sequence(col("start"), col("end"))).as("sec"))
      .groupBy(col("op"), col("sec"))
      .agg(countDistinct(col("number")).as("active"))
      .groupBy(col("op"))
      .agg(max(col("active")).as("peak"))
      .orderBy(col("op"))
  }

  /** A8 text sink (`Master.java:172` + static serving `Master.java:58`):
    * write a result in the reference's output format — space-separated
    * fields, one line per row (array columns flattened) — as a single
    * text file, ready for download like `final_result.out`. */
  def writeResultText(df: DataFrame, path: String): Unit = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType => array_join(col(f.name), " ")
        case _ => col(f.name).cast("string")
      }
    }
    df.select(concat_ws(" ", cols: _*).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(path)
  }

  /** W4 finding_the_suspects (`exampleCodes/finding_the_suspects/`): rows
    * `name family city year`; key = name-family-year, distinct city set,
    * keep groups with > 10 distinct cities (`reducer.py:18-19`). */
  def suspects(s: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), graft.functions.TextFns.WhitespaceRegex)
    s.read.textFile(path).toDF("value")
      .select(
        concat_ws("-", parts.getItem(0), parts.getItem(1), parts.getItem(3)).as("key"),
        parts.getItem(2).as("city"))
      .groupBy(col("key"))
      .agg(sort_array(collect_set(col("city"))).as("cities"))
      .filter(size(col("cities")) > 10)
      .orderBy(col("key"))
  }
}
