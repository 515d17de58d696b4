package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group ordinary least squares (y = a·x + b) from the five
  * classical sufficient statistics — the in-database trend-diagnostic
  * primitive (per-segment price drift, per-source quality decay over
  * time): each group reduces to (n, Σx, Σy, Σxy, Σx², Σy²) in ONE
  * map-side-combined hash aggregation, then slope / intercept / R² are
  * row-local arithmetic on the group row. No window, no join, no
  * second pass — the same shape at 10 groups or 10 million.
  *
  * Arithmetic discipline: the sufficient statistics are EXACT BIGINTs
  * (callers pass integer-unit x/y; Σxy bounds documented per call
  * site), and the final slope/intercept/R² route the n·Σxy-class
  * products through DOUBLE in the SAME association on both engines
  * (they overflow BIGINT at corpus scale — the q181/q197 discipline;
  * IEEE multiply/divide/floor is bit-deterministic). Groups with a
  * degenerate x variance (n < 2 or all x equal) report NULL-free
  * zeros with ok = 0.
  */
object Regression {

  /** OLS per group. `x`/`y` must be integer-valued expressions
    * (pre-scaled by the caller). Output: group cols, n, slope_micro
    * (µ-units of y per unit x), intercept_centi (y-units/100), r2_milli. */
  def olsByGroup(df: DataFrame, groupCols: Seq[String],
                 x: Column, y: Column): DataFrame = {
    val g = groupCols.map(col)
    val stats = df
      .select((g :+ x.cast("long").as("_x")) :+ y.cast("long").as("_y"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("_x")).cast("long").as("sx"),
        sum(col("_y")).cast("long").as("sy"),
        sum(col("_x") * col("_y")).cast("long").as("sxy"),
        sum(col("_x") * col("_x")).cast("long").as("sxx"),
        sum(col("_y") * col("_y")).cast("long").as("syy"))
    finish(stats).select(g ++ Seq(col("n"), col("ok"), col("slope_micro"),
      col("intercept_centi"), col("r2_milli")): _*)
  }

  /** Estimates from a frame already carrying the sufficient-statistic
    * columns (n, sx, sy, sxy, sxx, syy) — the streaming path aggregates
    * the sums itself (they are mergeable, so a watermarked windowed agg
    * IS the state) and finishes here row-locally. Adds ok, slope_micro,
    * intercept_centi, r2_milli. */
  def finish(stats: DataFrame): DataFrame = {
    stats
      .withColumn("dx", expr(
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"))
      .withColumn("dy", expr(
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"))
      .withColumn("nm", expr(
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"))
      .withColumn("ok", (col("dx") > 0d).cast("long"))
      .withColumn("slope_micro", expr(
        "CAST(CASE WHEN dx > 0 THEN floor(1000000.0 * nm / dx) ELSE 0 END AS BIGINT)"))
      .withColumn("intercept_centi", expr(
        // b = (Σy − slope·Σx)/n with slope re-derived in the same
        // association: (Σy·dx − nm·Σx) / (n·dx)
        "CAST(CASE WHEN dx > 0 THEN floor(100.0 * " +
          "(CAST(sy AS DOUBLE) * dx - nm * CAST(sx AS DOUBLE)) " +
          "/ (CAST(n AS DOUBLE) * dx)) ELSE 0 END AS BIGINT)"))
      .withColumn("r2_milli", expr(
        "CAST(CASE WHEN dx > 0 AND dy > 0 " +
          "THEN floor(1000.0 * nm * nm / (dx * dy)) ELSE 0 END AS BIGINT)"))
      .drop("dx", "dy", "nm")
  }

  /** Per-group Theil–Sen trend (Theil 1950, Sen 1968) — the ROBUST
    * counterpart to [[olsByGroup]]: slope = median over all point
    * pairs of (Δy/Δx), intercept = median of (y − slope·x). A single
    * wild segment of outliers (29.3% breakdown) barely moves it where
    * OLS follows the outliers — the pairing for drift diagnostics over
    * contaminated telemetry.
    *
    * Quadratic in group size BY DEFINITION (every pair contributes a
    * slope), so groups are first hash-capped to ≈`cap` members — the
    * [[RankStats.kendallByGroup]] contract verbatim: deterministic md5
    * gate, keep-rate cap/n, the estimator on a uniform subsample is
    * the same estimator; the in-group pair join is then cap-bounded
    * (Σ cap² work, never corpus²) and the median windows are keyed per
    * group over ≤ cap(cap−1)/2 rows.
    *
    * Arithmetic: slope_micro = sign-factored (10⁶·|Δy|) DIV |Δx| —
    * exact BIGINT, identical truncation on both engines (the repo's
    * sign-factoring rule; Δx = 0 pairs are skipped as is standard).
    * intercept_micro = median of (10⁶·y − slope_micro·x), exact
    * BIGINT. Overflow bounds: 10⁶·|Δy| and slope_micro·x must fit
    * BIGINT — |y| ≲ 9·10¹², |slope·x| ≲ 9·10¹⁸ (documented, ample for
    * integer-unit telemetry). Medians are the LOWER median with a
    * deterministic (value, pair/point id) tie-break, bit-reproducible
    * across engines. Output: (key, n_used, n_pairs, slope_micro,
    * intercept_micro). `idCol` must be unique within the group. */
  def theilSenByGroup(df: DataFrame, keyCol: String, idCol: String,
                      x: Column, y: Column, cap: Long = 200L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap >= 2, s"theilSenByGroup: cap=$cap")
    val src = df.select(col(keyCol), col(idCol).as("_id"),
      x.cast("long").as("_x"), y.cast("long").as("_y"))
    val sizes = src.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("_gn"))
    val kept = src.join(broadcast(sizes), keyCol)
      .where(graft.functions.HashFns.md5Hash60(
          concat_ws(":", lit("tsen"), col(keyCol), col("_id")))
          % 1000000L * col("_gn") < lit(cap) * 1000000L)
      .drop("_gn")
    val l = kept.select(col(keyCol), col("_id").as("_ia"),
      col("_x").as("_xa"), col("_y").as("_ya"))
    val r = kept.select(col(keyCol), col("_id").as("_ib"),
      col("_x").as("_xb"), col("_y").as("_yb"))
    val pairs = l.join(r, Seq(keyCol))
      .where(col("_ia") < col("_ib") && col("_xa") =!= col("_xb"))
      .withColumn("_sl", expr(
        """CAST(sign(_yb - _ya) AS BIGINT) * CAST(sign(_xb - _xa) AS BIGINT)
          | * ((1000000 * abs(_yb - _ya)) DIV abs(_xb - _xa))"""
          .stripMargin.replace("\n", " ")).cast("long"))
    val wSl = Window.partitionBy(col(keyCol))
      .orderBy(col("_sl"), col("_ia"), col("_ib"))
    val wCnt = Window.partitionBy(col(keyCol))
    val slope = pairs
      .withColumn("_rn", row_number().over(wSl))
      .withColumn("_np", count(lit(1)).over(wCnt))
      .where(col("_rn") === expr("(_np + 1) DIV 2"))
      .select(col(keyCol), col("_np").cast("long").as("n_pairs"),
        col("_sl").as("slope_micro"))
    val resid = kept.join(slope, keyCol)
      .withColumn("_ic",
        (lit(1000000L) * col("_y") - col("slope_micro") * col("_x"))
          .cast("long"))
    val wIc = Window.partitionBy(col(keyCol))
      .orderBy(col("_ic"), col("_id"))
    resid
      .withColumn("_rn", row_number().over(wIc))
      .withColumn("_nu", count(lit(1)).over(wCnt))
      .where(col("_rn") === expr("(_nu + 1) DIV 2"))
      .select(col(keyCol), col("_nu").cast("long").as("n_used"),
        col("n_pairs"), col("slope_micro"), col("_ic").as("intercept_micro"))
  }
}
