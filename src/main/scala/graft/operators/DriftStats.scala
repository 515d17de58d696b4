package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift statistics — the tests a corpus pipeline runs
  * when comparing sources, crawl snapshots, or train/eval splits:
  * two-sample Kolmogorov–Smirnov (largest ECDF gap — shape-free, the
  * canonical "did this source drift" test), chi-squared independence
  * (are two categorical dimensions coupled), and the population
  * stability index (the score-bucket drift metric model-monitoring
  * dashboards alarm on).
  *
  * Arithmetic: KS is INTEGER-EXACT end-to-end — the ECDF gap at value v
  * cross-multiplies to |cum_a·n_b − cum_b·n_a| (≤ n_a·n_b, documented
  * bound n_a·n_b < 2⁶³ — holds to ~3·10⁹ rows per side), and only the
  * final milli-scaling divides through DOUBLE in one fixed association
  * (q181 discipline). Chi-squared and PSI carry per-cell/per-bucket
  * terms individually floored to micro-units over exact BIGINT counts —
  * no cross-row float accumulation (the q209 per-term discipline).
  *
  * Scale design: everything aggregates to (side, value) / (row, col) /
  * (side, bucket) histograms first — one corpus shuffle each — and all
  * windows are value- or category-cardinality-bounded. The pairwise
  * stages fan out over SIDE pairs (a dimension property, not corpus
  * size). */
object DriftStats {

  /** Pass-through that RAISES on a NULL bucket value — shared by
    * [[psiBySide]] and the pinned-reference PSI monitors
    * (StreamPsiDrift/StreamPsiUpdate), whose grid/anti-join pair would
    * otherwise count NULL mass twice (pseudo-count AND novel). Applied
    * after grouping, so the check costs one expression per bucket row. */
  def nullBucketGuard(b: Column, where: String): Column =
    when(b.isNull, raise_error(lit(
      s"$where: NULL bucket — a bucketer emitted NULL, which the " +
        "grid/novel join pair would double-count; filter or map NULLs " +
        "to a sentinel bucket upstream"))).otherwise(b)

  /** Two-sample KS for EVERY unordered pair of `sideCol` values over
    * integral `value`: D = max_v |ECDF_a(v) − ECDF_b(v)|. Output per
    * pair: (side_a, side_b, n_a, n_b, ks_num = max|cum_a·n_b −
    * cum_b·n_a|, ks_milli = floor(1000·D)). The per-pair cumulative
    * window runs over the union of the two sides' DISTINCT values. */
  def ksPairs(df: DataFrame, sideCol: String, value: Column): DataFrame = {
    // persisted: both per-pair branches join the SAME histogram —
    // without the persist the corpus aggregates twice
    val hist = graft.Caches.persist(
      df.select(col(sideCol).as("_s"), value.cast("long").as("_v"))
        .groupBy(col("_s"), col("_v"))
        .agg(count(lit(1)).cast("long").as("_c")))
    val sides = hist.select(col("_s")).distinct()
    val pairTbl = sides.select(col("_s").as("side_a"))
      .join(sides.select(col("_s").as("side_b")),
        col("side_a") < col("side_b"))
    val ga = pairTbl.join(hist, col("_s") === col("side_a"))
      .select(col("side_a"), col("side_b"), col("_v"), col("_c").as("_ca"))
    val gb = pairTbl.join(hist, col("_s") === col("side_b"))
      .select(col("side_a"), col("side_b"), col("_v"), col("_c").as("_cb"))
    val grid = ga.join(gb, Seq("side_a", "side_b", "_v"), "full_outer")
      .na.fill(0L, Seq("_ca", "_cb"))
    val wCum = Window.partitionBy(col("side_a"), col("side_b"))
      .orderBy(col("_v")).rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("side_a"), col("side_b"))
    grid
      .withColumn("_cuma", sum(col("_ca")).over(wCum))
      .withColumn("_cumb", sum(col("_cb")).over(wCum))
      .withColumn("_na", sum(col("_ca")).over(wAll))
      .withColumn("_nb", sum(col("_cb")).over(wAll))
      .groupBy(col("side_a"), col("side_b"))
      .agg(max(col("_na")).cast("long").as("n_a"),
        max(col("_nb")).cast("long").as("n_b"),
        max(abs(col("_cuma") * col("_nb") - col("_cumb") * col("_na")))
          .cast("long").as("ks_num"))
      .withColumn("ks_milli",
        expr("CAST(floor(1000.0 * CAST(ks_num AS DOUBLE)" +
          " / CAST(n_a * n_b AS DOUBLE)) AS BIGINT)"))
  }

  /** Chi-squared test of independence between two categorical columns:
    * X² = Σ_cells (O·N − R·C)² / (R·C·N). Per-cell terms floored to
    * micro-units individually; (O·N − R·C) stays exact BIGINT
    * (documented bound O·N < 2⁶³, i.e. N ≲ 3·10⁹ at cell counts ≤ N),
    * the square and the R·C·N denominator go through DOUBLE in one
    * fixed association. Output: one row per cell (rowv, colv, o, e_micro
    * = floor(10⁶·R·C/N), term_micro) — the residual table an analyst
    * reads — plus the global statistic via [[chiSqTotal]]. */
  def chiSqCells(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("rowv"), col(colCol).as("colv"))
      .agg(count(lit(1)).cast("long").as("o"))
    val rows = cells.groupBy(col("rowv"))
      .agg(sum(col("o")).cast("long").as("_r"))
    val cols = cells.groupBy(col("colv"))
      .agg(sum(col("o")).cast("long").as("_c"))
    val n = cells.agg(sum(col("o")).cast("long").as("_n"))
    cells.join(broadcast(rows), "rowv").join(broadcast(cols), "colv")
      .crossJoin(broadcast(n))
      .select(col("rowv"), col("colv"), col("o"),
        expr("CAST(floor(1000000.0 * CAST(_r * _c AS DOUBLE)" +
          " / CAST(_n AS DOUBLE)) AS BIGINT)").as("e_micro"),
        expr("CAST(floor(1000000.0 * CAST(o * _n - _r * _c AS DOUBLE)" +
          " * CAST(o * _n - _r * _c AS DOUBLE)" +
          " / (CAST(_r * _c AS DOUBLE) * CAST(_n AS DOUBLE))) AS BIGINT)")
          .as("term_micro"))
  }

  /** The X² statistic (micro-units) + degrees of freedom from
    * [[chiSqCells]]' output — one tiny agg over the cell table. Note
    * empty cells (O = 0 for an observed (row, col) combination that
    * never co-occurs) contribute no row here; their exact term
    * R·C/N IS counted by adding the total-E identity: Σ_all E = N, so
    * X² = Σ_observed (O−E)²/E + Σ_empty E — the caller passes the
    * margins' full cross count to account for df; this helper reports
    * the observed-cell sum and df = (n_rows−1)(n_cols−1). */
  def chiSqTotal(cells: DataFrame): DataFrame =
    cells.agg(
      sum(col("term_micro")).cast("long").as("chi2_obs_micro"),
      countDistinct(col("rowv")).cast("long").as("_nr"),
      countDistinct(col("colv")).cast("long").as("_nc"),
      count(lit(1)).cast("long").as("n_cells"))
      .select(col("chi2_obs_micro"), col("n_cells"),
        ((col("_nr") - 1L) * (col("_nc") - 1L)).cast("long").as("df"))

  /** Quantile–quantile drift table: each side's exact percentiles of
    * integral `value` against the GLOBAL percentiles — WHERE in the
    * distribution a source drifted (KS says how much; the QQ table says
    * the p90 grew 18% while the median held). Rides
    * [[Relational.exactPercentiles]] twice (value-cardinality-bounded
    * windows, never row sorts); the wide percentile rows unpivot via
    * stack. Output per (side, p): value_side, value_all, shift
    * (value_side − value_all) and shift_milli relative to the global
    * percentile. */
  def qqVsGlobal(df: DataFrame, sideCol: String, value: Column,
                 percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty, "qqVsGlobal: percents empty")
    val src = df.select(col(sideCol).as("_s"), value.cast("long").as("_v"))
    def unpivot(vCol: String) = s"stack(${percents.size}, " +
      percents.map(p => s"${p}L, p${p}_c").mkString(", ") +
      s") AS (p, $vCol)"
    val side = Relational.exactPercentiles(src, "_s", col("_v"), percents)
      .selectExpr("_s AS side", unpivot("value_side"))
    val glob = Relational.exactPercentiles(
        src.withColumn("_g", lit(1L)), "_g", col("_v"), percents)
      .selectExpr(unpivot("value_all"))
    side.join(broadcast(glob), Seq("p"))
      .select(col("side"), col("p").cast("long").as("p"),
        col("value_side"), col("value_all"),
        (col("value_side") - col("value_all")).cast("long").as("shift"),
        // sign-factored: the shift can be negative, and truncating DIV
        // (Spark) vs flooring // (DuckDB) disagree below zero — divide
        // magnitudes, reapply the sign (the cross-engine parity rule)
        expr("CAST(sign(value_side - value_all) AS BIGINT)" +
          " * (abs(value_side - value_all) * 1000" +
          " DIV GREATEST(abs(value_all), 1))").cast("long")
          .as("shift_milli"))
  }

  /** Population stability index of integral `value` bucketed by
    * `bucketOf`, for every `sideCol` against the GLOBAL distribution:
    * PSI = Σ_b (p_side(b) − p_all(b)) · ln(p_side(b)/p_all(b)). The
    * model-monitoring drift score (<0.1 stable, >0.25 action). Buckets
    * missing on one side use the standard ε = one pseudo-count. Each
    * term: exact BIGINT counts, ONE fixed-shape double expression per
    * (side, bucket), individually floored to micro-units (q209
    * discipline — no float accumulation across buckets; ln is IEEE
    * correctly-rounded libm on both engines for these argument
    * magnitudes, and the fixture pins it). One extra CATCH-ALL bucket
    * holds side mass outside the reference support (reference share =
    * one pseudo-count out of n) — structurally empty for this
    * self-referential form, real for pinned-reference monitors sharing
    * the finisher shape. Output: (side, n_side, n_novel, psi_micro). */
  def psiBySide(df: DataFrame, sideCol: String, bucketOf: Column): DataFrame = {
    // A NULL bucket would be double-mishandled downstream: it fails the
    // grid equi-join (its side cell silently takes the pseudo-count) AND
    // the left_anti novel-support join (the same mass also lands in
    // n_novel). No bucketer in the repo emits NULL, so fail loudly at
    // the one row that would corrupt the score rather than guess which
    // of the two wrong treatments the caller wanted. Checked on the
    // GROUPED frame (≤ sides × buckets rows, not per input row).
    val bh = df.select(col(sideCol).as("_s"), bucketOf.cast("long").as("_b"))
      .groupBy(col("_s"), col("_b"))
      .agg(count(lit(1)).cast("long").as("_c"))
      .withColumn("_b", nullBucketGuard(col("_b"), "psiBySide"))
    val sides = bh.groupBy(col("_s"))
      .agg(sum(col("_c")).cast("long").as("_ns"))
    val buckets = bh.groupBy(col("_b"))
      .agg(sum(col("_c")).cast("long").as("_cb"))
    val n = bh.agg(sum(col("_c")).cast("long").as("_n"))
    // full (side × bucket) grid so zero-count side-buckets get the
    // pseudo-count instead of silently dropping
    val grid = sides.crossJoin(broadcast(buckets))
      .join(bh, Seq("_s", "_b"), "left").na.fill(0L, Seq("_c"))
      .crossJoin(broadcast(n))
    val inSupport = grid
      .withColumn("term_micro", expr(
        """CAST(floor(1000000.0 *
          | (CAST(GREATEST(_c, 1) AS DOUBLE) / CAST(_ns AS DOUBLE)
          |  - CAST(_cb AS DOUBLE) / CAST(_n AS DOUBLE))
          | * ln((CAST(GREATEST(_c, 1) AS DOUBLE) / CAST(_ns AS DOUBLE))
          |      / (CAST(_cb AS DOUBLE) / CAST(_n AS DOUBLE)))) AS BIGINT)"""
          .stripMargin.replace("\n", " ")))
      .groupBy(col("_s"))
      .agg(max(col("_ns")).cast("long").as("n_side"),
        sum(col("term_micro")).cast("long").as("_psis"))
    // NOVEL-VALUE CATCH-ALL: side mass in buckets outside the reference
    // support collapses into one extra bucket whose reference share is
    // the standard one pseudo-count out of n. With this operator's
    // self-referential reference (the global mix) the anti-join is
    // structurally empty, but the catch-all row is part of the PSI
    // contract — the finisher is shared with monitors whose reference
    // is PINNED (StreamPsiUpdate), where novel mass is real — so the
    // term (and its n_novel witness) appears in every mirror.
    val novel = sides.join(
      bh.join(buckets, Seq("_b"), "left_anti")
        .groupBy(col("_s")).agg(sum(col("_c")).cast("long").as("_nv")),
      Seq("_s"), "left").na.fill(0L, Seq("_nv"))
    val catchAll = novel.crossJoin(broadcast(n))
      .withColumn("_ct", expr(
        """CASE WHEN _nv = 0 THEN CAST(0 AS BIGINT)
          | ELSE CAST(floor(1000000.0 *
          | (CAST(_nv AS DOUBLE) / CAST(_ns AS DOUBLE)
          |  - 1.0 / CAST(_n AS DOUBLE))
          | * ln((CAST(_nv AS DOUBLE) / CAST(_ns AS DOUBLE))
          |      / (1.0 / CAST(_n AS DOUBLE)))) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")))
      .select(col("_s"), col("_nv"), col("_ct"))
    inSupport.join(catchAll, Seq("_s"))
      .select(col("_s").as("side"), col("n_side"),
        col("_nv").as("n_novel"),
        (col("_psis") + col("_ct")).cast("long").as("psi_micro"))
  }
}
