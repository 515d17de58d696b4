package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval sweep-line concurrency — "how many spans are active at
  * once": peak concurrent sessions, lease occupancy, max parallel
  * crawls per day. The classic sweep: every span [s, e) contributes a
  * +1 boundary at s and a −1 at e; the running boundary sum IS the
  * concurrency, and per-day peaks read off the boundary points.
  *
  * Half-open semantics are load-bearing: at time t, a span ending AT t
  * is no longer active while one starting at t is — so boundaries
  * order by (t, delta) with the −1 first; equal-timestamp ties then
  * break on the caller's tie column (deterministic on any engine).
  *
  * Scale design: the running sum is the q112/q147 `scalableCumSum`
  * scheme — a bucketed histogram + per-BUCKET windows, never one
  * corpus-wide ORDER BY window in a single task; the per-day peak is
  * one hash aggregation over the boundary points. Days with no
  * boundary events are omitted (with ≤-day-long spans every active day
  * has boundaries; a gap-spanning variant would carry the last cum
  * forward with q171's LOCF).
  */
object Sweep {

  /** Per-day peak concurrency over spans [start, end) in ms. `tie`
    * must be unique per row (boundary order below t-and-delta).
    * Output: (day_ms, n_boundaries, peak). */
  def peakConcurrencyDaily(df: DataFrame, start: Column, end: Column,
                           tie: Column): DataFrame = {
    val rawId = tie.cast("long")
    // the tie-encoding contract below is GUARDED, not just documented:
    // an id outside [0, 10¹²) would silently corrupt end-before-start
    // ordering, so a violating row raises at scan time (one codegen'd
    // comparison per row — no extra job, no plan-shape change)
    val guardedId = when(rawId >= 0L && rawId < 1000000000000L, rawId)
      .otherwise(raise_error(concat(
        lit("Sweep.peakConcurrencyDaily: tie id out of [0, 1e12) breaks " +
          "the boundary-order encoding: "), rawId.cast("string")))
        .cast("long"))
    val spans = df.select(start.cast("long").as("_s"),
      end.cast("long").as("_e"), guardedId.as("_id"))
    // ends first at equal t: tie key = (delta+1)/2 · 10¹² + id, so a
    // −1 boundary (0·10¹²+id) sorts before a +1 (10¹²+id) — a data
    // contract now enforced above (ids here are table keys ≪ 10¹²;
    // a deployment beyond it raises the constant)
    val bounds = spans.select(col("_s").as("_t"), lit(1L).as("_d"),
        (lit(1000000000000L) + col("_id")).as("_tie"))
      .unionByName(spans.select(col("_e").as("_t"), lit(-1L).as("_d"),
        col("_id").as("_tie")))
    Relational.scalableCumSum(bounds, "_t", "_tie", "_d",
        cumName = "_conc", rankName = "_r")
      .groupBy(expr("(_t DIV 86400000) * 86400000").as("day_ms"))
      .agg(count(lit(1)).cast("long").as("n_boundaries"),
        max(col("_conc")).cast("long").as("peak"))
  }
}
