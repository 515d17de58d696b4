package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing (the overlap form of gaps-and-islands): merge
  * each key's overlapping-or-touching [start, end] intervals into
  * maximal islands. The VARIABLE-duration sibling of q19's gap
  * sessionization — with per-row durations an earlier interval can
  * cover several later ones entirely, so island membership needs the
  * RUNNING MAX of interval ends, not the previous row's end (the
  * classic trap: lag(end) under-merges whenever a long interval
  * swallows short successors). Availability windows, lease/lock spans,
  * validity unions and crawl-visit coverage all reduce to this.
  *
  * Scale design: one shuffle on the key; both windows (running-max-end
  * and island-id cumsum) partition per key and order by (start, tie) —
  * bounded frames, never a corpus window; the island aggregation is
  * one hash agg on (key, island).
  */
object Intervals {

  /** Coalesce per-key intervals. `start`/`end` are expressions in any
    * common integer unit; `tieCol` breaks equal starts. Returns
    * (key, island, start, end, n_rows) with `island` numbered 1.. per
    * key in start order. */
  def coalesce(df: DataFrame, keyCol: String, start: Column, end: Column,
               tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_s"), col(tieCol))
    val prevMaxEnd = max(col("_e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("_s", start)
      .withColumn("_e", end)
      .withColumn("_new",
        when(prevMaxEnd.isNull || col("_s") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col("_s")).as("start"), max(col("_e")).as("end"),
        count(lit(1)).cast("long").as("n_rows"))
  }
}
