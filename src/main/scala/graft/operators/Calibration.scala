package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-audit operators over (score, label) pairs — what closes
  * the loop around a quality/toxicity/lang-ID classifier before its
  * scores gate a 100 TB corpus: reliability (is a predicted 0.8 right
  * 80% of the time?) and the precision/recall frontier (what does the
  * keep-gate actually trade at each threshold?).
  *
  * Both are ONE hash aggregation over bounded-cardinality groups
  * (probability buckets / thresholds); integer-exact throughout — the
  * only divisions are cross-multiplied floor divisions on exact BIGINT
  * counts. */
object Calibration {

  /** Expected-calibration-error audit: bucket `probMilli` (a predicted
    * probability in milli-units, 0..1000) into `bins` equal-width bins;
    * per bin report count, mean confidence, empirical accuracy, and the
    * |confidence − accuracy| gap, all in milli-units. The per-bin rows
    * ARE the reliability diagram; ECE = Σ n_b·gap_b / N is one more agg
    * the caller runs (kept out so the diagram stays the output).
    * Output: (bin, n, conf_milli, acc_milli, gap_milli). */
  def reliabilityBins(df: DataFrame, probMilli: Column, label: Column,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"reliabilityBins: bins=$bins")
    // bin = ⌊p·bins/1000⌋ clamped to the top bin — exact equal-width
    // binning for ANY bin count (the ⌊p/⌊1000/bins⌋⌋ form misbins
    // boundary values whenever bins ∤ 1000, e.g. bins=3 puts 666 in
    // bin 2 instead of 1)
    df.select(probMilli.cast("long").as("_p"), label.cast("long").as("_y"))
      .withColumn("_bin",
        expr(s"least(_p * ${bins}L DIV 1000L, ${bins - 1}L)").cast("long"))
      .groupBy(col("_bin").as("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("_p")).cast("long").as("_sp"),
        sum(col("_y")).cast("long").as("_np"))
      .select(col("bin"), col("n"),
        expr("_sp DIV n").as("conf_milli"),
        expr("_np * 1000 DIV n").as("acc_milli"),
        expr("abs(_sp DIV n - _np * 1000 DIV n)").as("gap_milli"))
  }

  /** Precision/recall/F1 sweep over `thresholds` (ascending integral
    * score cut points; predict positive when score ≥ t). The gate-tuning
    * table: each row is one operating point. Computed from ONE
    * (score, label) histogram re-keyed by threshold — the histogram is
    * score-cardinality-bounded and each histogram row lands in every
    * threshold bucket at or below it via a range condition against the
    * broadcast threshold list (|thresholds| × |distinct scores| fanout,
    * both bounded). EVERY requested threshold appears in the output —
    * one with no qualifying score reads tp=0, fp=0, fn=all positives
    * (re-attached from the tiny threshold list after the range-join
    * aggregation, so the scalable core is untouched). F1 in its
    * integer-pure form 2TP/(2TP+FP+FN). Output: (threshold, tp, fp,
    * fn_, precision_milli, recall_milli, f1_milli). */
  def prSweep(df: DataFrame, score: Column, label: Column,
              thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "prSweep: thresholds empty")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.select(score.cast("long").as("_v"),
        label.cast("long").as("_y"))
      .groupBy(col("_v"))
      .agg(count(lit(1)).cast("long").as("_c"),
        sum(col("_y")).cast("long").as("_cp"))
    val tot = hist.agg(sum(col("_cp")).cast("long").as("_allp"))
    val th = thresholds.sorted.toDF("threshold")
    val counts = hist.join(broadcast(th), col("_v") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(sum(col("_cp")).cast("long").as("tp"),
        sum(col("_c") - col("_cp")).cast("long").as("fp"))
    th.join(counts, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("tp"), lit(0L)).cast("long").as("tp"),
        coalesce(col("fp"), lit(0L)).cast("long").as("fp"))
      .crossJoin(broadcast(tot))
      .select(col("threshold"), col("tp"), col("fp"),
        (col("_allp") - col("tp")).cast("long").as("fn_"),
        expr("CASE WHEN tp + fp > 0 THEN tp * 1000 DIV (tp + fp)" +
          " ELSE 0 END").cast("long").as("precision_milli"),
        expr("CASE WHEN _allp > 0 THEN tp * 1000 DIV _allp" +
          " ELSE 0 END").cast("long").as("recall_milli"),
        expr("CASE WHEN 2 * tp + fp + (_allp - tp) > 0" +
          " THEN 2 * tp * 1000 DIV (2 * tp + fp + (_allp - tp))" +
          " ELSE 0 END").cast("long").as("f1_milli"))
  }

  /** Isotonic calibration of the reliability diagram — the PAVA fit
    * (pool-adjacent-violators) computed by its closed minimax form
    * (Barlow et al. 1972): iso(i) = max_{j ≤ i} min_{k ≥ i} of the
    * positive-rate over bins j..k. That form needs no sequential loop,
    * so it distributes: the histogram is one hash aggregation, prefix
    * sums ride a window over ≤`bins` rows, and the interval grid /
    * minimax joins are BINS-CUBED-bounded (10³ rows at the default) —
    * dimension-bounded like q197's EMD grid, never data-bounded. The
    * result is the monotone non-decreasing calibration map a score
    * gate applies before thresholding (q223's sweep assumes scores
    * are comparable; this is what makes a miscalibrated classifier's
    * scores comparable).
    *
    * Arithmetic: interval rates go through ONE double division in the
    * same association on both engines (exact BIGINT prefix sums in,
    * IEEE min/max/floor out — the q181 discipline); `iso_micro` is the
    * floored micro-unit fit. `raw_inversion` marks bins whose RAW
    * accuracy dips below the previous bin's — the violations PAVA
    * pools away (the fit is non-decreasing by construction). Output:
    * (bin, n, conf_milli, acc_milli, iso_micro, raw_inversion). */
  def isotonicBins(df: DataFrame, probMilli: Column, label: Column,
                   bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2, s"isotonicBins: bins=$bins")
    val hist = df
      .select(probMilli.cast("long").as("_p"), label.cast("long").as("_y"))
      .withColumn("_bin",
        expr(s"least(_p * ${bins}L DIV 1000L, ${bins - 1}L)").cast("long"))
      .groupBy(col("_bin").as("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("_p")).cast("long").as("_sp"),
        sum(col("_y")).cast("long").as("_np"))
    // every window/join below runs over ≤ bins rows — bounded
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("_cn", sum(col("n")).over(wCum).cast("long"))
      .withColumn("_cp", sum(col("_np")).over(wCum).cast("long"))
    val lo = cum.select(col("bin").as("_j"),
      (col("_cn") - col("n")).as("_cnex"), (col("_cp") - col("_np")).as("_cpex"))
    val hi = cum.select(col("bin").as("_k"),
      col("_cn").as("_cnk"), col("_cp").as("_cpk"))
    val iv = lo.join(hi, col("_j") <= col("_k"))
      .select(col("_j"), col("_k"),
        expr("CAST(_cpk - _cpex AS DOUBLE) / CAST(_cnk - _cnex AS DOUBLE)")
          .as("_v"))
    val mins = hist.select(col("bin").as("_i"))
      .join(iv, col("_j") <= col("_i") && col("_k") >= col("_i"))
      .groupBy(col("_i"), col("_j")).agg(min(col("_v")).as("_mn"))
    val iso = mins.groupBy(col("_i").as("bin"))
      .agg(max(col("_mn")).as("_iso"))
    val wLag = Window.orderBy(col("bin"))
    hist.join(iso, Seq("bin"))
      .withColumn("_acc", expr("_np * 1000 DIV n").cast("long"))
      .withColumn("raw_inversion",
        when(col("_acc") < lag(col("_acc"), 1).over(wLag), 1L)
          .otherwise(0L).cast("long"))
      .select(col("bin"), col("n"),
        expr("_sp DIV n").cast("long").as("conf_milli"),
        col("_acc").as("acc_milli"),
        expr("CAST(floor(1000000.0 * _iso) AS BIGINT)").as("iso_micro"),
        col("raw_inversion"))
  }
}
