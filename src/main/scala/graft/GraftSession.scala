package graft

import org.apache.spark.sql.SparkSession

/** Session factory: every graft entry point builds its SparkSession here
  * so behavior-affecting flags are uniform from the first query.
  *
  * In particular `spark.sql.legacy.parquet.nanosAsLong` is set at build
  * time: it is a session-global flag with no per-read form, and the
  * events table (parquet TIMESTAMP(NANOS), see [[Tables]]) requires it.
  * Setting it lazily on first events read would make every other
  * nanos-typed parquet read order-dependent — failing loudly before the
  * first events read, silently returning raw int64 after.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // push doc_id IN (...) lists of MaxScore-contender size into the
      // parquet scan: on a serve-key-sorted index the row-group min/max
      // check skips the mega posting list around the survivors — the
      // parquet analog of Lucene's skip pointers (default is 10, far
      // below a top-k contender set)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "100")
      .config("spark.ui.enabled", "false")
      // the custom expressions resolve by name in spark.sql(...) too
      .withExtensions(new plans.GraftExtensions)
}
