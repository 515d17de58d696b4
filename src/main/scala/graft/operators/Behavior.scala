package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral abuse/bot screening over an event stream — the triage a
  * crawl or product pipeline runs before its events feed counters and
  * training data: a scripted client fires fast and narrow (high event
  * rate, few distinct event types), a human is slow and varied.
  *
  * Deliberately built from MERGEABLE per-user statistics only (count,
  * min/max timestamp, small-domain distinct type count) — no
  * inter-arrival sequence stats — so the SAME feature set is computable
  * as one watermarked streaming aggregation (map-side combined,
  * watermark-evicted) and batch ≡ stream is structural. One hash
  * shuffle on the user key; scoring is row-local integer math. */
object Behavior {

  /** Per-user rate/diversity features + bot score. `tsNanos` must be
    * BIGINT event-time nanos. rate_milli = events per minute in
    * milli-units over the user's active span (single-event users span
    * 0 → the GREATEST(·,1) floor makes them read as one full second);
    * score = rate_milli DIV n_types (narrow clients divide by less);
    * bot = score > threshold with at least `minEvents` events (a
    * two-event burst is noise, not evidence). Output: (user, n_events,
    * span_s, n_types, rate_milli, score, bot). */
  def botScore(df: DataFrame, userCol: String, tsNanos: Column,
               typeCol: String, threshold: Long = 100000L,
               minEvents: Long = 20L): DataFrame =
    df.select(col(userCol), tsNanos.as("_t"), col(typeCol).as("_ty"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).cast("long").as("n_events"),
        min(col("_t")).as("_mn"), max(col("_t")).as("_mx"),
        countDistinct(col("_ty")).cast("long").as("n_types"))
      .withColumn("span_s", expr("(_mx - _mn) DIV 1000000000"))
      .select(col(userCol), col("n_events"), col("span_s"), col("n_types"),
        expr("n_events * 60000 DIV GREATEST(span_s, 1)").as("rate_milli"),
        expr("(n_events * 60000 DIV GREATEST(span_s, 1)) DIV n_types")
          .as("score"))
      .withColumn("bot",
        (col("score") > threshold && col("n_events") >= minEvents)
          .cast("long"))
}
