package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust order-statistic diagnostics — the outlier-resistant siblings
  * of the moment-based q29/q175 family: a handful of extreme rows move
  * a mean/σ gate arbitrarily, while median/MAD gates stay put (the
  * monitoring choice when the data itself is suspect, which for a
  * 100 TB crawl is always).
  *
  * Both operators ride the q42 `exactPercentiles` scheme: per group,
  * rank DISTINCT values with their multiplicities (or weight sums) —
  * the per-group window is VALUE-CARDINALITY-bounded, never
  * row-count-bounded, so a billion-row group with a bounded value
  * domain costs one hash agg plus a small window. */
object RobustStats {

  /** Per-group median, MAD (median absolute deviation, unscaled) and
    * |x − med| > 3·MAD outlier counts. Two percentile passes (values,
    * then deviations) + one counting agg; the group medians travel by
    * key join (broadcast when the group count is small). Output:
    * (key, n, med, mad, n_out, out_milli). */
  def madOutliers(df: DataFrame, keyCol: String, value: Column): DataFrame = {
    val src = df.select(col(keyCol), value.cast("long").as("_x"))
    val med = Relational.exactPercentiles(src, keyCol, col("_x"), Seq(50))
      .select(col(keyCol), col("p50_c").as("med"))
    val dev = src.join(med, keyCol)
    val mad = Relational.exactPercentiles(
        dev.select(col(keyCol), abs(col("_x") - col("med")).as("_d")),
        keyCol, col("_d"), Seq(50))
      .select(col(keyCol), col("p50_c").as("mad"))
    dev.join(mad, keyCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        first(col("med")).as("med"), first(col("mad")).as("mad"),
        sum((abs(col("_x") - col("med")) > lit(3L) * col("mad"))
          .cast("long")).cast("long").as("n_out"))
      .withColumn("out_milli", expr("n_out * 1000 DIV n"))
  }

  /** Per-group trimmed and winsorized means next to the raw mean — the
    * standard robust-location pair: trimming DROPS the tails outside
    * [p_lo, p_hi], winsorizing CLAMPS them to the fences (keeps the
    * count, caps the influence). Fences are the exact discrete
    * percentiles (the q42 scheme); one join-back + one counting agg;
    * all integer floor divisions. Output: (key, n, p_lo_c, p_hi_c,
    * mean_c, trimmed_c, winsor_c). */
  def trimmedMeans(df: DataFrame, keyCol: String, value: Column,
                   loPct: Int = 10, hiPct: Int = 90): DataFrame = {
    require(0 < loPct && loPct < hiPct && hiPct < 100,
      s"trimmedMeans: ($loPct, $hiPct)")
    val src = df.select(col(keyCol), value.cast("long").as("_x"))
    val fences = Relational
      .exactPercentiles(src, keyCol, col("_x"), Seq(loPct, hiPct))
      .select(col(keyCol), col(s"p${loPct}_c").as("_lo"),
        col(s"p${hiPct}_c").as("_hi"))
    src.join(broadcast(fences), keyCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        max(col("_lo")).cast("long").as("p_lo_c"),
        max(col("_hi")).cast("long").as("p_hi_c"),
        sum(col("_x")).cast("long").as("_sum"),
        sum(when(col("_x").between(col("_lo"), col("_hi")), col("_x")))
          .cast("long").as("_tsum"),
        sum(col("_x").between(col("_lo"), col("_hi")).cast("long"))
          .cast("long").as("_tn"),
        sum(greatest(least(col("_x"), col("_hi")), col("_lo")))
          .cast("long").as("_wsum"))
      .select(col(keyCol), col("n"), col("p_lo_c"), col("p_hi_c"),
        // sums can be negative (balances): sign-factored division —
        // truncating DIV (Spark) and flooring // (DuckDB) disagree
        // below zero, |x| DIV n with the sign reapplied doesn't
        expr("CAST(sign(_sum) AS BIGINT) * (abs(_sum) DIV n)")
          .cast("long").as("mean_c"),
        expr("CASE WHEN _tn > 0 THEN CAST(sign(_tsum) AS BIGINT)" +
          " * (abs(_tsum) DIV _tn) ELSE 0 END")
          .cast("long").as("trimmed_c"),
        expr("CAST(sign(_wsum) AS BIGINT) * (abs(_wsum) DIV n)")
          .cast("long").as("winsor_c"))
  }

  /** Per-group WEIGHTED median: the smallest value whose cumulative
    * weight reaches ceil(W/2) — quantity-weighted price medians, token-
    * weighted quality medians. One (key, value) weight aggregation +
    * the value-bounded cumulative window. Output: (key, w_total, wmed). */
  def weightedMedian(df: DataFrame, keyCol: String, value: Column,
                     weight: Column): DataFrame = {
    val sums = df.select(col(keyCol), value.cast("long").as("_v"),
        weight.cast("long").as("_w"))
      .groupBy(col(keyCol), col("_v"))
      .agg(sum(col("_w")).cast("long").as("_ws"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("_v"))
    val wAll = Window.partitionBy(col(keyCol))
    sums
      .withColumn("_cum", sum(col("_ws")).over(wCum))
      .withColumn("_tot", sum(col("_ws")).over(wAll))
      .groupBy(col(keyCol))
      .agg(max(col("_tot")).cast("long").as("w_total"),
        min(when(expr("_cum >= (_tot + 1) DIV 2"), col("_v")))
          .cast("long").as("wmed"))
  }
}
