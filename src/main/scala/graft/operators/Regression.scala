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
}
