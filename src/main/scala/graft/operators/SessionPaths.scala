package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session path mining — the behavioral-analytics companion of
  * sessionization (q19) and funnels (q165/q193): each gap-delimited
  * session becomes an ordered path string of its event types
  * ("view>click>purchase"), and the operator reports the top-N most
  * frequent paths — the clickstream shapes that dominate traffic, the
  * input to funnel design and bot-pattern triage.
  *
  * Determinism: events order within a session by (ts, tie), exactly the
  * q19 session ordering; path counting ties break toward the
  * lexicographically smallest path. Session assignment is the q19 gap
  * rule verbatim (> gapMs starts a new session), so q19's sessions and
  * these paths describe the same segmentation.
  *
  * Scale design: one shuffle on the user key; the lag/cumulative-sum
  * windows and the per-session `sort_array(collect_list(...))` are all
  * KEYED (per user / per session — state is one session's events, never
  * the corpus); path counting is one hash aggregation and the top-N is
  * TakeOrderedAndProject, never a global sort.
  */
object SessionPaths {

  /** (path, n_sessions), top `topN` by frequency. `tsMillis` is the
    * event-time expression in ms; `tieCol` breaks intra-ms order. */
  def topPaths(events: DataFrame, userCol: String, tsMillis: Column,
               tieCol: String, typeCol: String, gapMs: Long,
               topN: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(tsMillis, col(tieCol))
    val prev = lag(tsMillis, 1).over(w)
    val isNew = when(prev.isNull || tsMillis - prev > gapMs, 1L).otherwise(0L)
    events
      .withColumn("_ts", tsMillis)
      .withColumn("_new", isNew)
      .withColumn("_sess",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("_sess"))
      // the q15 deterministic-order discipline: collect_list order is
      // undefined, so sort the (ts, tie, type) structs row-locally
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("_ts"), col(tieCol).as("_tie"),
            col(typeCol).as("_et")))),
          x => x.getField("_et")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).cast("long").as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
  }
}
