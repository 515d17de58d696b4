package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation analysis — the A/B readout a data-pipeline change
  * ships behind (new dedup threshold, new quality gate, new ranking):
  * unit-level conversion by variant, absolute and relative lift, and
  * the two-proportion z statistic. Analysis is UNIT-grain (a user
  * converts once no matter how many rows they emit — the dedup step is
  * the part naive row-rate comparisons get wrong).
  *
  * Scale: one hash agg to units, one 2-row agg to variants, one row
  * out. Rates and lift are exact integer cross-multiplied divisions
  * (documented bound n_a·conv_b < 2⁶³); only z goes through DOUBLE in
  * ONE fixed association (q181 discipline). */
object Experiment {

  /** Two-proportion experiment readout. `variantOf` must be a pure
    * function of the unit (0/1 — e.g. a deterministic hash bucket);
    * `converted` marks converting ROWS (the unit converts if any of
    * its rows do). Output (one row): n_a, n_b, conv_a, conv_b,
    * rate_a_milli, rate_b_milli, lift_abs_milli, lift_rel_milli,
    * z_milli. */
  def twoProportion(df: DataFrame, unitCol: String, variantOf: Column,
                    converted: Column): DataFrame = {
    val units = df
      .select(col(unitCol).as("_u"), variantOf.cast("long").as("_g"),
        converted.cast("long").as("_c"))
      .groupBy(col("_u"), col("_g"))
      .agg(max(col("_c")).as("_conv"))
    units.groupBy()
      .agg(
        sum(when(col("_g") === 0L, 1L).otherwise(0L)).cast("long").as("n_a"),
        sum(when(col("_g") === 1L, 1L).otherwise(0L)).cast("long").as("n_b"),
        sum(when(col("_g") === 0L, col("_conv")).otherwise(0L))
          .cast("long").as("conv_a"),
        sum(when(col("_g") === 1L, col("_conv")).otherwise(0L))
          .cast("long").as("conv_b"))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        // every division guarded against an empty variant (all units in
        // one hash bucket) — ANSI mode raises on x DIV 0, so the rate
        // and lift columns must degrade to 0 like lift_rel/z do
        expr("CASE WHEN n_a > 0 THEN conv_a * 1000 DIV n_a ELSE 0 END")
          .cast("long").as("rate_a_milli"),
        expr("CASE WHEN n_b > 0 THEN conv_b * 1000 DIV n_b ELSE 0 END")
          .cast("long").as("rate_b_milli"),
        expr("CASE WHEN n_a > 0 AND n_b > 0 THEN" +
          " conv_a * 1000 DIV n_a - conv_b * 1000 DIV n_b ELSE 0 END")
          .cast("long").as("lift_abs_milli"),
        // relative lift (p_a - p_b)/p_b, cross-multiplied exactly;
        // sign-factored because the numerator can be negative and
        // truncating DIV (Spark) vs flooring // (DuckDB) disagree there
        expr("CASE WHEN conv_b > 0 THEN" +
          " CAST(sign(conv_a * n_b - conv_b * n_a) AS BIGINT)" +
          " * (abs(conv_a * n_b - conv_b * n_a) * 1000" +
          " DIV (conv_b * n_a)) ELSE 0 END")
          .cast("long").as("lift_rel_milli"),
        // z = (p_a - p_b) / sqrt(phat (1-phat) (1/n_a + 1/n_b)) — one
        // fixed-shape double tree, engine-identical
        expr("""CAST(CASE WHEN conv_a + conv_b > 0
               | AND conv_a + conv_b < n_a + n_b THEN
               |floor(1000.0 * (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               |  - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               | / sqrt((CAST(conv_a + conv_b AS DOUBLE)
               |          / CAST(n_a + n_b AS DOUBLE))
               |   * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
               |          / CAST(n_a + n_b AS DOUBLE))
               |   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
               |ELSE 0 END AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("z_milli"))
  }

  /** Difference-in-differences readout — the experiment form for a
    * change that lands at a point in TIME (a new ingest gate, a ranking
    * swap): compare each variant's mean metric before vs after the
    * split and difference the deltas, cancelling both the variants'
    * baseline gap and the shared time trend. The split is the midpoint
    * of the observed period range (data-derived, so the analysis scales
    * with the corpus's own span). One period-tagged hash aggregation;
    * means are sign-factored floor divisions (exact, engine-portable).
    * Output (one row): split, per-cell n and mean, did (the DiD
    * estimate in the metric's own integer units). */
  def diffInDiff(df: DataFrame, variantOf: Column, period: Column,
                 value: Column): DataFrame = {
    val src = df.select(variantOf.cast("long").as("_g"),
      period.cast("long").as("_p"), value.cast("long").as("_x"))
    // integer DIV, not Column `/` (double division) — a caller passing
    // nanosecond periods would silently round past 2^53 otherwise
    val split = src.agg(min(col("_p")).as("_mn"), max(col("_p")).as("_mx"))
      .select(expr("(_mn + _mx + 1) DIV 2").cast("long").as("_split"))
    def cell(g: Int, post: Int, out: String) = Seq(
      sum(when(col("_g") === g.toLong && col("_post") === post.toLong, 1L)
        .otherwise(0L)).cast("long").as(s"n_$out"),
      sum(when(col("_g") === g.toLong && col("_post") === post.toLong,
        col("_x")).otherwise(0L)).cast("long").as(s"_s_$out"))
    val aggs = cell(0, 0, "pre_a") ++ cell(0, 1, "post_a") ++
      cell(1, 0, "pre_b") ++ cell(1, 1, "post_b")
    def mean(c: String) =
      s"CAST(sign(_s_$c) AS BIGINT) * (abs(_s_$c) DIV GREATEST(n_$c, 1))"
    src.crossJoin(broadcast(split))
      .withColumn("_post", (col("_p") >= col("_split")).cast("long"))
      .groupBy(col("_split").as("split"))
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(Seq("split") ++
        Seq("pre_a", "post_a", "pre_b", "post_b").flatMap(c =>
          Seq(s"n_$c", s"CAST(${mean(c)} AS BIGINT) AS mean_$c")) ++
        Seq(s"CAST((${mean("post_a")} - ${mean("pre_a")})" +
          s" - (${mean("post_b")} - ${mean("pre_b")}) AS BIGINT)" +
          " AS did"): _*)
  }
}
