package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clamped running balance — the stock/credit/quota recurrence
  * b_i = max(0, b_{i-1} + δ_i), which NO window function expresses
  * directly (it is a sequential recurrence, the textbook argument for
  * row-at-a-time UDFs). The reflection identity makes it windowable:
  *
  *   b_i = cum_i − min(0, min_{j≤i} cum_j)
  *
  * (each time the raw cumulative sum crosses a new low, the clamp has
  * absorbed exactly that much deficit — subtracting the running low
  * water mark replays every clamp at once). Proof shape: both sides
  * satisfy the same recurrence and base case; pinned against a
  * sequential reference in the spec.
  *
  * Scale design: one shuffle on the key; the cumulative-sum and
  * running-min windows are KEYED and share the partitioning; the
  * summary is one hash agg. No recurrence ever executes row-at-a-time.
  */
object RunningOps {

  /** Per-key balance summary over integer deltas: rows where the clamp
    * fired (the raw sum went below the low-water mark), final and peak
    * clamped balances. Output: (key, n_moves, n_clamped, final_balance,
    * peak_balance). */
  def clampedBalance(df: DataFrame, keyCol: String, order: Column,
                     tieCol: String, delta: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_o"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wPrev = Window.partitionBy(col(keyCol))
      .orderBy(col("_o"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rows = df
      .withColumn("_o", order)
      .withColumn("_d", delta.cast("long"))
      .withColumn("_cum", sum(col("_d")).over(w))
      .withColumn("_low", least(lit(0L), min(col("_cum")).over(w)))
      // previous low water mark (0 at the first row: least ignores null)
      .withColumn("_lowprev", least(lit(0L), min(col("_cum")).over(wPrev)))
      .withColumn("_bal", col("_cum") - col("_low"))
    rows.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_moves"),
        // the clamp fired at i iff b_{i-1} + δ_i < 0, i.e. the raw cum
        // strictly undercut the previous low water mark
        sum((col("_cum") < col("_lowprev")).cast("long"))
          .cast("long").as("n_clamped"),
        max_by(col("_bal"), struct(col("_o"), col(tieCol))).cast("long")
          .as("final_balance"),
        max(col("_bal")).cast("long").as("peak_balance"))
  }
}
