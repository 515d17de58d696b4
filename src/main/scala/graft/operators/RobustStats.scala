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

  /** Per-group Hodges–Lehmann pseudo-median (1963) — the location
    * estimator between the mean (efficient, fragile) and the median
    * (robust, inefficient): the median of all WALSH AVERAGES
    * (x_i + x_j)/2 over pairs i ≤ j (singletons included). ~96%
    * Gaussian efficiency at the median's 29% breakdown — the
    * location sibling of [[graft.operators.Regression.theilSenByGroup]]
    * (both are medians over the pair lattice), completing the robust
    * family next to [[madOutliers]] and [[trimmedMeans]].
    *
    * Quadratic by definition, so the q232/q251 hash-cap contract
    * verbatim: groups subsample to ≈`cap` members through the
    * deterministic md5 gate (mirrored 1:1 in oracles), the pair join
    * is cap-bounded, the median windows keyed per group. Arithmetic
    * is DIVISION-FREE: the output `pm_half_unit` is the lower median
    * of the exact BIGINT Walsh SUMS x_i + x_j — i.e. the pseudo-median
    * in HALF-units of the input — with a deterministic (sum, ia, ib)
    * tie-break; `med_unit` is the group's plain lower median for
    * side-by-side reading. Bit-exact on any engine. Output:
    * (key, n_used, n_pairs, pm_half_unit, med_unit). */
  def hodgesLehmann(df: DataFrame, keyCol: String, idCol: String,
                    value: Column, cap: Long = 200L): DataFrame = {
    require(cap >= 1, s"hodgesLehmann: cap=$cap")
    val src = df.select(col(keyCol), col(idCol).as("_id"),
      value.cast("long").as("_x"))
    val sizes = src.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("_gn"))
    val kept = src.join(broadcast(sizes), keyCol)
      .where(graft.functions.HashFns.md5Hash60(
          concat_ws(":", lit("hl"), col(keyCol), col("_id")))
          % 1000000L * col("_gn") < lit(cap) * 1000000L)
      .drop("_gn")
    val l = kept.select(col(keyCol), col("_id").as("_ia"), col("_x").as("_xa"))
    val r = kept.select(col(keyCol), col("_id").as("_ib"), col("_x").as("_xb"))
    val pairs = l.join(r, Seq(keyCol)).where(col("_ia") <= col("_ib"))
      .withColumn("_w", (col("_xa") + col("_xb")).cast("long"))
    val wW = Window.partitionBy(col(keyCol))
      .orderBy(col("_w"), col("_ia"), col("_ib"))
    val wN = Window.partitionBy(col(keyCol))
    val pm = pairs
      .withColumn("_rn", row_number().over(wW))
      .withColumn("_np", count(lit(1)).over(wN))
      .where(col("_rn") === expr("(_np + 1) DIV 2"))
      .select(col(keyCol), col("_np").cast("long").as("n_pairs"),
        col("_w").as("pm_half_unit"))
    val wX = Window.partitionBy(col(keyCol))
      .orderBy(col("_x"), col("_id"))
    val med = kept
      .withColumn("_rn", row_number().over(wX))
      .withColumn("_nu", count(lit(1)).over(wN))
      .where(col("_rn") === expr("(_nu + 1) DIV 2"))
      .select(col(keyCol), col("_nu").cast("long").as("n_used"),
        col("_x").as("med_unit"))
    med.join(pm, keyCol)
      .select(col(keyCol), col("n_used"), col("n_pairs"),
        col("pm_half_unit"), col("med_unit"))
  }
}
