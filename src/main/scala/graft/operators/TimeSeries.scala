package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series monitoring over per-(key, period) aggregates — the ops
  * statistics a 100 TB ingest watches per source/type: CUSUM drift
  * alarms (Page 1954 — the sequential change-point detector: a small
  * persistent shift accumulates where per-period z-checks stay blind),
  * lag-k autocorrelation (is the series trending/weekly-periodic or
  * noise), and day-of-week seasonality indices (the ratio-to-overall
  * profile that deseasonalizes alert baselines).
  *
  * Everything here runs on the PERIOD grain: the corpus collapses to
  * (key, period, value) in one hash aggregation first, so the
  * per-key windows and self-joins are period-cardinality-bounded
  * (365 rows/key/year), never row-count-bounded.
  *
  * CUSUM is the q213 clamp recurrence c_i = max(0, c_{i-1} + (x_i − k))
  * — made windowable by the reflection identity
  * c_i = cum_i − min(0, running-min cum_i) (see [[RunningOps]]). */
object TimeSeries {

  /** One-sided upper CUSUM per key over per-period sums of `value`
    * (integral): slack k = the key's own mean period value + `slackPct`%
    * of it (self-calibrating — a drift beyond the historical mean by
    * more than the slack accumulates), alarm when the CUSUM exceeds
    * `hFactor` × mean. Output one row per (key, period): the period
    * value, cusum, and alarm flag. All integer: means and the slack are
    * SIGN-FACTORED floor divisions (sign(s)·(|s| DIV n) — the portable
    * truncate-vs-floor parity form, so balance-like NEGATIVE period
    * values stay engine-identical), the recurrence over exact deltas. */
  def cusumDaily(df: DataFrame, keyCol: String, periodMs: Column,
                 value: Column, slackPct: Long = 10L,
                 hFactor: Long = 3L): DataFrame = {
    val daily = df.select(col(keyCol), periodMs.cast("long").as("_p"),
        value.cast("long").as("_x"))
      .groupBy(col(keyCol), col("_p"))
      .agg(sum(col("_x")).cast("long").as("x"))
    val means = daily.groupBy(col(keyCol))
      .agg(sum(col("x")).cast("long").as("_sm"),
        count(lit(1)).cast("long").as("_nm"))
      .select(col(keyCol),
        expr("CAST(sign(_sm) AS BIGINT) * (abs(_sm) DIV _nm)").as("_mean"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_p"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.join(broadcast(means), keyCol)
      .withColumn("_k", expr("_mean + CAST(sign(_mean) AS BIGINT)" +
        s" * (abs(_mean) * $slackPct DIV 100)"))
      .withColumn("_d", col("x") - col("_k"))
      .withColumn("_cum", sum(col("_d")).over(w))
      .withColumn("cusum",
        col("_cum") - least(lit(0L), min(col("_cum")).over(w)))
      .withColumn("alarm",
        (col("cusum") > col("_mean") * hFactor).cast("long"))
      .select(col(keyCol), col("_p").as("period_ms"), col("x"),
        col("cusum"), col("alarm"))
  }

  /** Lag-k autocorrelation of the per-(key, period) series: Pearson
    * between (x_t, x_{t+lag·step}) pairs over the key's periods — one
    * period-grain self-join per lag (equi-join on key and shifted
    * period, no window). Gaps in the period grid drop pairs (the
    * standard treatment for sparse series).
    *
    * Scale-proof exactness: period sums are first rescaled per key to
    * MILLI-UNITS OF THE KEY'S MAX period value (integer floor — the ACF
    * of the rescaled series, 1/1000-of-range resolution, ample for a
    * drift diagnostic). Rescaled values ≤ 1000 make every sufficient
    * statistic an exact BIGINT at ANY corpus magnitude (Σxy ≤ n·10⁶,
    * n·Σxy ≤ n²·10⁶ < 2⁶³ to n ≈ 3·10⁶ periods per key — periods, not
    * rows); the final ratio is ONE double expression (q181/q203
    * association). Output per (key, lag): n_pairs, acf_micro. */
  def autocorr(df: DataFrame, keyCol: String, periodMs: Column,
               value: Column, stepMs: Long, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"autocorr: lags=$lags")
    val sums = df.select(col(keyCol), periodMs.cast("long").as("_p"),
        value.cast("long").as("_x"))
      .groupBy(col(keyCol), col("_p"))
      .agg(sum(col("_x")).cast("long").as("_raw"))
    val maxes = sums.groupBy(col(keyCol))
      .agg(max(col("_raw")).cast("long").as("_mx"))
    val daily = sums.join(broadcast(maxes), keyCol)
      .select(col(keyCol), col("_p"),
        expr("CASE WHEN _mx > 0 THEN _raw * 1000 DIV _mx ELSE 0 END")
          .cast("long").as("_x"))
    val frames = lags.map { lag =>
      val l = daily.select(col(keyCol), col("_p"), col("_x").as("_xa"))
      val r = daily.select(col(keyCol),
        (col("_p") - lit(lag.toLong * stepMs)).as("_p"), col("_x").as("_xb"))
      l.join(r, Seq(keyCol.toString, "_p"))
        .groupBy(col(keyCol))
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          sum(col("_xa")).cast("long").as("sx"),
          sum(col("_xb")).cast("long").as("sy"),
          sum(col("_xa") * col("_xb")).cast("long").as("sxy"),
          sum(col("_xa") * col("_xa")).cast("long").as("sxx"),
          sum(col("_xb") * col("_xb")).cast("long").as("syy"))
        .withColumn("lag", lit(lag.toLong))
    }
    frames.reduce(_ unionByName _)
      .select(col(keyCol), col("lag"), col("n_pairs"),
        expr("""CAST(CASE WHEN n_pairs * sxx - sx * sx > 0
               | AND n_pairs * syy - sy * sy > 0
               |THEN floor(1000000.0
               |     * CAST(n_pairs * sxy - sx * sy AS DOUBLE)
               |     / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
               |            * CAST(n_pairs * syy - sy * sy AS DOUBLE)))
               |ELSE 0 END AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("acf_micro"))
  }

  /** Day-of-week seasonality index per key: mean per-dow period value
    * over mean overall period value, in milli-units (1000 = flat).
    * `dow`: 0 = Thursday epoch anchor convention — the caller passes
    * the period's epoch-day so the index is a pure mod (engine-portable;
    * no locale-dependent date function). mean_c is a sign-factored
    * floor division (negative-value-safe, engine-portable). Output per
    * (key, dow): n_periods, mean_c, index_milli. */
  def dowSeasonality(df: DataFrame, keyCol: String, epochDay: Column,
                     value: Column): DataFrame = {
    val daily = df.select(col(keyCol), epochDay.cast("long").as("_d"),
        value.cast("long").as("_x"))
      .groupBy(col(keyCol), col("_d"))
      .agg(sum(col("_x")).cast("long").as("_x"))
    val overall = daily.groupBy(col(keyCol))
      .agg(sum(col("_x")).cast("long").as("_sall"),
        count(lit(1)).cast("long").as("_nall"))
    daily.withColumn("dow", expr("_d % 7"))
      .groupBy(col(keyCol), col("dow"))
      .agg(count(lit(1)).cast("long").as("n_periods"),
        sum(col("_x")).cast("long").as("_s"))
      .join(broadcast(overall), keyCol)
      .select(col(keyCol), col("dow"), col("n_periods"),
        expr("CAST(sign(_s) AS BIGINT) * (abs(_s) DIV n_periods)")
          .as("mean_c"),
        // index = (per-dow mean) / (overall mean) = s·nall / (n·sall);
        // the integer cross-product s·1000·nall overflows BIGINT at
        // corpus scale, so the ratio goes through DOUBLE in ONE fixed
        // association (q181 discipline — each BIGINT→double conversion
        // and IEEE op correctly rounded, hence engine-identical)
        expr("CAST(floor(1000.0 * CAST(_s AS DOUBLE)" +
          " * CAST(_nall AS DOUBLE) / (CAST(n_periods AS DOUBLE)" +
          " * CAST(_sall AS DOUBLE))) AS BIGINT)").as("index_milli"))
  }
}
