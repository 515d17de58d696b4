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
}
