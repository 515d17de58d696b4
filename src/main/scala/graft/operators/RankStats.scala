package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based statistics — the distribution-free eval/monitoring
  * family: Spearman ρ (monotone association), Mann–Whitney U (two-sample
  * location shift), ROC AUC (ranking quality of a score against binary
  * labels), and Kendall τ-b (pairwise concordance). These are the tests
  * a data pipeline runs when the underlying distributions are unknown or
  * heavy-tailed — exactly the situation with crawl-scale corpora, where
  * moment-based tests (t, Pearson) are dominated by outliers.
  *
  * Arithmetic discipline: every rank is carried DOUBLED ("rank2" =
  * twice the midrank, an exact integer even under ties: a run of c equal
  * values after b smaller ones has midrank b + (c+1)/2, so
  * rank2 = 2b + c + 1). Sufficient statistics over rank2 products are
  * exact BIGINT sums with DOCUMENTED bounds (the q203/q217 discipline;
  * ANSI mode makes a violation raise, never silently wrap): U and AUC
  * rank sums are ≤ 2N² — exact to N ≈ 2·10⁹ rows per compared
  * side/group; Spearman's Σ(rank2·rank2) ≤ 4n³ — exact to n ≈ 10⁶ rows
  * per GROUP (groups are per-segment entities by the operator's grain;
  * a corpus-wide variant would first coarsen values like
  * [[TimeSeries.autocorr]]). Only the FINAL ratio goes through DOUBLE
  * in the same association on both engines (the q181 discipline;
  * BIGINT→double is one correctly-rounded conversion, and IEEE
  * multiply/divide/sqrt are correctly rounded, hence deterministic).
  *
  * Scale design: U and AUC never rank rows — they rank the DISTINCT
  * values of a (group, value) histogram, so the windows are
  * value-cardinality-bounded (the exactPercentiles scheme). Spearman's
  * per-group rank windows are keyed by the group column; τ-b's pair
  * join is guarded by an explicit per-group sample cap (quadratic in
  * group size by definition — the cap, not luck, is the contract). */
object RankStats {

  /** Per-group Spearman rank correlation between paired observations
    * `x` and `y` (one row per entity). Midranks (×2) under ties, then
    * Pearson over the doubled ranks with exact BIGINT sufficient
    * statistics (bound: 4n³ < 2⁶³ ⇒ n ≈ 10⁶ rows per group; ANSI mode
    * raises beyond it). Output: (key, n, rho_micro) — floor(10⁶·ρ),
    * ρ ∈ [−1,1].
    *
    * The rank windows are PER GROUP: group sizes are bounded by the
    * grouping key's semantics (entities per nation/segment), not corpus
    * size — a single-group corpus-wide variant would ride
    * [[Relational.scalableRowNumber]] instead. */
  def spearmanByGroup(df: DataFrame, keyCol: String,
                      x: Column, y: Column): DataFrame = {
    val src = df.select(col(keyCol), x.cast("long").as("_x"),
      y.cast("long").as("_y"))
    def rank2(v: String, out: String)(d: DataFrame): DataFrame = {
      val wRank = Window.partitionBy(col(keyCol)).orderBy(col(v))
      val wTies = Window.partitionBy(col(keyCol), col(v))
      // midrank×2 = 2·(minRank−1) + c + 1 where c = tie-run length
      d.withColumn(out,
        lit(2L) * (rank().over(wRank).cast("long") - 1L) +
          count(lit(1)).over(wTies).cast("long") + 1L)
    }
    val ranked = rank2("_y", "_ry")(rank2("_x", "_rx")(src))
    val stats = ranked.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("_rx")).cast("long").as("sx"),
      sum(col("_ry")).cast("long").as("sy"),
      sum(col("_rx") * col("_ry")).cast("long").as("sxy"),
      sum(col("_rx") * col("_rx")).cast("long").as("sxx"),
      sum(col("_ry") * col("_ry")).cast("long").as("syy"))
    // ρ = (nΣxy − ΣxΣy) / sqrt((nΣxx − Σx²)(nΣyy − Σy²)); numerator and
    // variance terms stay exact BIGINT, ONE double sqrt+divide ends
    // it — identical association both engines
    stats.select(col(keyCol), col("n"),
      expr("""CAST(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
             |THEN floor(1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
             |     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             |            * CAST(n * syy - sy * sy AS DOUBLE)))
             |ELSE 0 END AS BIGINT)""".stripMargin.replace("\n", " "))
        .as("rho_micro"))
  }

  /** Mann–Whitney U for EVERY unordered pair of `sideCol` values over
    * integral `value` — which side's distribution is stochastically
    * larger, without normality assumptions. Midrank (×2) tie handling.
    *
    * Never ranks rows: one (side, value) histogram, per-PAIR cumulative
    * windows over the union of the two sides' DISTINCT values
    * (value-cardinality-bounded), and U from the rank-sum identity
    * U_a = R_a − n_a(n_a+1)/2. Output per pair: (side_a, side_b, n_a,
    * n_b, u2_a = 2·U_a, u2_b = 2·U_b, cle_micro = floor(10⁶·U_a/(n_a·n_b))
    * — the common-language effect size P(X_a > X_b) + ½P(=)).
    *
    * Overflow: rank sums ≤ n(2n+1) ≈ 2N² stay exact BIGINT to
    * N ≈ 2·10⁹ rows per side (documented bound, ANSI-guarded); the one
    * double division is the q181 association. The pair fanout is
    * side-cardinality-bounded (a dimension property, not corpus size). */
  def mannWhitneyPairs(df: DataFrame, sideCol: String,
                       value: Column): DataFrame = {
    // persisted: both per-pair branches (a-side and b-side) join the
    // SAME histogram — without the persist the corpus aggregates twice
    val hist = graft.Caches.persist(
      df.select(col(sideCol).as("_s"), value.cast("long").as("_v"))
        .groupBy(col("_s"), col("_v"))
        .agg(count(lit(1)).cast("long").as("_c")))
    // explicit side-pair table (side-cardinality-bounded, broadcast);
    // each pair's value grid is the UNION of the two sides' distinct
    // values — a value held by only one side still shifts the ranking,
    // so the per-pair histograms meet in a full outer join
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
      .orderBy(col("_v")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grid
      .withColumn("_before",
        coalesce(sum(col("_ca") + col("_cb")).over(wCum), lit(0L)))
      // rank2 of every row holding value v (both sides share it)
      .withColumn("_r2",
        lit(2L) * col("_before") + col("_ca") + col("_cb") + 1L)
    ranked.groupBy(col("side_a"), col("side_b")).agg(
        sum(col("_ca")).cast("long").as("n_a"),
        sum(col("_cb")).cast("long").as("n_b"),
        sum(col("_ca") * col("_r2")).cast("long").as("_r2a"),
        sum(col("_cb") * col("_r2")).cast("long").as("_r2b"))
      .withColumn("u2_a", (col("_r2a") - col("n_a") * (col("n_a") + 1L))
        .cast("long"))
      .withColumn("u2_b", (col("_r2b") - col("n_b") * (col("n_b") + 1L))
        .cast("long"))
      .select(col("side_a"), col("side_b"), col("n_a"), col("n_b"),
        col("u2_a"), col("u2_b"),
        expr("CAST(floor(1000000.0 * CAST(u2_a AS DOUBLE)" +
          " / (2.0 * CAST(n_a * n_b AS DOUBLE))) AS BIGINT)")
          .as("cle_micro"))
  }

  /** ROC AUC of an integral `score` against a 0/1 `label`, per group —
    * the threshold-free ranking-quality metric every quality-classifier
    * audit reports. Rank-sum identity:
    * AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg), midranks making
    * ties count ½ (the standard tie convention). One (group, score)
    * histogram with per-class counts, a value-cardinality-bounded
    * cumulative window per group, one hash agg. Output: (key, n_pos,
    * n_neg, auc_micro). Degenerate groups (a single class) read −1. */
  def aucByGroup(df: DataFrame, keyCol: String,
                 score: Column, label: Column): DataFrame = {
    val hist = df.select(col(keyCol), score.cast("long").as("_v"),
        label.cast("long").as("_y"))
      .groupBy(col(keyCol), col("_v"))
      .agg(count(lit(1)).cast("long").as("_c"),
        sum(col("_y")).cast("long").as("_cp"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("_before", coalesce(sum(col("_c")).over(wCum), lit(0L)))
      .withColumn("_r2", lit(2L) * col("_before") + col("_c") + 1L)
      .groupBy(col(keyCol)).agg(
        sum(col("_cp")).cast("long").as("n_pos"),
        sum(col("_c") - col("_cp")).cast("long").as("n_neg"),
        sum(col("_cp") * col("_r2")).cast("long").as("_r2p"))
      .withColumn("_u2",
        (col("_r2p") - col("n_pos") * (col("n_pos") + 1L)).cast("long"))
      .select(col(keyCol), col("n_pos"), col("n_neg"),
        expr("""CAST(CASE WHEN n_pos > 0 AND n_neg > 0
               |THEN floor(1000000.0 * CAST(_u2 AS DOUBLE)
               |     / (2.0 * CAST(n_pos * n_neg AS DOUBLE)))
               |ELSE -1 END AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("auc_micro"))
  }

  /** Per-group Kendall τ-b between paired observations — concordance
    * with tie corrections: τ_b = (n_c − n_d) / sqrt((n0 − t_x)(n0 − t_y)),
    * n0 = n(n−1)/2, t_x/t_y = Σ t(t−1)/2 over tie runs. Quadratic in
    * group size BY DEFINITION (every pair is compared), so groups are
    * first hash-capped to ≈`cap` members (deterministic md5 gate,
    * keep-rate = cap/n — the q168 rebalancing scheme; τ estimated on a
    * uniform subsample is unbiased). The in-group pair join is then
    * cap-bounded: Σ n_g'² work, never corpus². Output: (key, n_used,
    * conc_minus_disc, tau_b_micro). `idCol` must be unique. */
  def kendallByGroup(df: DataFrame, keyCol: String, idCol: String,
                     x: Column, y: Column, cap: Long = 2000L): DataFrame = {
    require(cap >= 2, s"kendallByGroup: cap=$cap")
    val src = df.select(col(keyCol), col(idCol).as("_id"),
      x.cast("long").as("_x"), y.cast("long").as("_y"))
    val sizes = src.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("_gn"))
    val kept = src.join(broadcast(sizes), keyCol)
      .where(graft.functions.HashFns.md5Hash60(
          concat_ws(":", lit("ktau"), col(keyCol), col("_id")))
          % 1000000L * col("_gn") < lit(cap) * 1000000L)
      .drop("_gn")
    val l = kept.select(col(keyCol), col("_id").as("_ia"),
      col("_x").as("_xa"), col("_y").as("_ya"))
    val r = kept.select(col(keyCol), col("_id").as("_ib"),
      col("_x").as("_xb"), col("_y").as("_yb"))
    val pairs = l.join(r, Seq(keyCol)).where(col("_ia") < col("_ib"))
      .withColumn("_sgn",
        signum((col("_xa") - col("_xb")).cast("double")).cast("long") *
          signum((col("_ya") - col("_yb")).cast("double")).cast("long"))
      .withColumn("_tiex", (col("_xa") === col("_xb")).cast("long"))
      .withColumn("_tiey", (col("_ya") === col("_yb")).cast("long"))
    pairs.groupBy(col(keyCol)).agg(
        count(lit(1)).cast("long").as("_n0"),
        sum(col("_sgn")).cast("long").as("conc_minus_disc"),
        sum(col("_tiex")).cast("long").as("_tx"),
        sum(col("_tiey")).cast("long").as("_ty"))
      .join(kept.groupBy(col(keyCol))
        .agg(count(lit(1)).cast("long").as("n_used")), keyCol)
      .select(col(keyCol), col("n_used"), col("conc_minus_disc"),
        expr("""CAST(CASE WHEN _n0 > _tx AND _n0 > _ty
               |THEN floor(1000000.0 * CAST(conc_minus_disc AS DOUBLE)
               |     / sqrt(CAST(_n0 - _tx AS DOUBLE)
               |            * CAST(_n0 - _ty AS DOUBLE)))
               |ELSE 0 END AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("tau_b_micro"))
  }
}
