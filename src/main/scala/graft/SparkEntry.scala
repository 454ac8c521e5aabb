package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2): reference
  * workload re-expressions, the relational operator set, event/time-series
  * operators, and the LLM-pipeline extensions. `oracleSql` carries a
  * DuckDB-equivalent for every SQL-expressible query; queries absent from
  * it are verified rows-only by the driver and covered by ScalaTest specs
  * instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Reference.queries ++
      ops.Relational.queries ++
      ops.Events.queries ++
      ops.TextAnalysis.queries ++
      ops.Curation.queries ++
      ops.Dedup.queries ++
      ops.Similarity.queries ++
      ops.Retrieval.queries ++
      ops.Compat.queries ++
      multimodal.Multimodal.queries ++
      streaming.EventStreams.queries ++
      streaming.IngestDedup.queries ++
      streaming.AnnIngest.queries ++
      streaming.TextIngest.queries ++
      streaming.DecontamIngest.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Reference.oracles ++
      ops.Relational.oracles ++
      ops.Events.oracles ++
      ops.TextAnalysis.oracles ++
      ops.Curation.oracles ++
      ops.Dedup.oracles ++
      ops.Similarity.oracles ++
      ops.Retrieval.oracles ++
      ops.Compat.oracles ++
      multimodal.Multimodal.oracles ++
      streaming.EventStreams.oracles ++
      streaming.IngestDedup.oracles ++
      streaming.AnnIngest.oracles ++
      streaming.TextIngest.oracles ++
      streaming.DecontamIngest.oracles
}
