package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The one broadcast-hint rule every query-set-sized build side shares:
  * hint ONLY when Catalyst's own size estimate fits the session's
  * broadcast threshold. An unconditional `broadcast(...)` on a frame
  * that grows with the corpus or query set overrides both the planner's
  * and AQE's size checks, so an externally grown input (a 100× query
  * batch, a mass takedown's tombstone set) would be collected onto the
  * driver regardless — the round-11 IVF-probe lesson, generalized into
  * the repo-wide rule in round 13. Under the gate, small inputs keep
  * their broadcast plan (and their oracle-pinned results and
  * plan-shape pins) byte-for-byte, while a grown frame is left
  * un-hinted for the planner/AQE to place by measured size.
  *
  * Constant-bounded frames (1-row stats, k centroids, capped literals)
  * keep their unconditional hints — the gate is for frames whose row
  * count scales with an input. */
object JoinHints {
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thr > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= thr)
      broadcast(df)
    else df
  }
}
