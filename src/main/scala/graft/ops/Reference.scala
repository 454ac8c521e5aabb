package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** Spark-native re-expressions of the reference's four example workloads
  * (SURVEY.md §2B), applied to the driver's parquet testdata.
  *
  * The reference runs each of these as user-supplied mapper/reducer
  * processes over line chunks with a single-node final reduce
  * (`/root/reference/master/.../Master.java:169-210`); here each one is a
  * declarative DataFrame plan, so partial/final hash aggregation,
  * shuffle-by-key, and codegen come from Catalyst instead of hand-rolled
  * combiners inside user code.
  *
  * All queries ORDER BY a unique key so results are deterministic and
  * hash-comparable against the DuckDB oracle.
  */
object Reference {

  /** W1 word_count (reference `exampleCodes/word_count/mapper.cpp:23-28`,
    * `reducer.cpp:24-29`): whitespace-tokenized word frequency, ordered by
    * word. `cin >> str` semantics = split on whitespace runs, drop empties.
    * Scale: explode + partial-agg map-side combine; one shuffle on `word`.
    */
  def w1WordCount(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(explode(split(col("text"), TextFns.WhitespaceRegex)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))

  /** W2 char_count (reference `exampleCodes/char_count/mapper.py:8-15`,
    * `reduce.py:9-15`): per-character frequency over every non-newline
    * character (spaces included, `mapper.py:10-11`). */
  def w2CharCount(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "" && col("ch") =!= "\n")
      .groupBy(col("ch"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("ch"))

  /** W3 finding_peek_numbers (reference `exampleCodes/finding_peek_numbers/
    * mapper.cpp:26-57`, `reducer.cpp:25-50`): per group, the peak over time
    * buckets of count(distinct member active in that bucket). The reference
    * materializes all 86400 seconds in one reducer heap; here it is two
    * hash aggregations — (type, minute) distinct users, then max per type —
    * which distributes and survives arbitrary scale. */
  def w3PeakConcurrent(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .groupBy(col("event_type"))
      .agg(max(col("active_users")).as("peak_active"))
      .orderBy(col("event_type"))

  /** W4 finding_the_suspects (reference `exampleCodes/finding_the_suspects/
    * mapper.py:13-16`, `reducer.py:10-19`): group by key, collect the
    * distinct value set, keep only groups whose set is large (HAVING), emit
    * key + sorted set. Here: customers that used all 5 order priorities.
    * collect_set is bounded (≤5 distinct priorities) so safe at scale.
    * The set is emitted space-joined (`key SP v1 SP v2 …`), matching the
    * reference's output line format (`reducer.py:21-23`) and keeping the
    * result free of array columns for the driver's row-hash compare. */
  def w4SuspectSets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_set(col("o_orderpriority"))).as("pset"))
      .filter(size(col("pset")) >= 5)
      .select(col("o_custkey"), concat_ws(" ", col("pset")).as("priorities"),
        size(col("pset")).cast("long").as("n_priorities"))
      .orderBy(col("o_custkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w1_word_count" -> w1WordCount _,
    "w2_char_count" -> w2CharCount _,
    "w3_peak_concurrent" -> w3PeakConcurrent _,
    "w4_suspect_sets" -> w4SuspectSets _,
  )

  val oracles: Map[String, String] = Map(
    "w1_word_count" ->
      s"""SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(${graft.functions.TextFns.duckTokSql}) AS word FROM documents)
        |GROUP BY word ORDER BY word""".stripMargin,
    "w2_char_count" ->
      """SELECT ch, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)
        |WHERE ch <> chr(10) AND ch <> ''
        |GROUP BY ch ORDER BY ch""".stripMargin,
    "w3_peak_concurrent" ->
      """SELECT event_type, max(active_users) AS peak_active
        |FROM (SELECT event_type, date_trunc('minute', ts) AS minute, count(DISTINCT user_id) AS active_users
        |      FROM events GROUP BY 1, 2)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "w4_suspect_sets" ->
      """SELECT o_custkey, array_to_string(list_sort(list(DISTINCT o_orderpriority)), ' ') AS priorities,
        |       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
        |FROM orders GROUP BY o_custkey
        |HAVING count(DISTINCT o_orderpriority) >= 5
        |ORDER BY o_custkey""".stripMargin,
  )
}
