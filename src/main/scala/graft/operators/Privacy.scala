package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity audit and suppression over quasi-identifier columns —
  * the privacy gate a curated training corpus runs before release
  * (companion to the PII redaction operator, q116): any combination of
  * quasi-identifiers shared by fewer than k records re-identifies those
  * records, so the release either generalizes the QI or suppresses the
  * group.
  *
  * Scale design: both operations are a single hash aggregation on the
  * QI tuple (map-side partial combine, one shuffle); the suppression
  * variant joins the group verdicts back by the same key, so the
  * shuffle partitioning is reused. No window over the corpus, no
  * driver-side state.
  */
object Privacy {

  /** One row per QI group: the QI values, the group size, and an
    * integer risk flag (1 when size < k). */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("grp_n"))
      .withColumn("risky", (col("grp_n") < k).cast("long"))

  /** l-diversity audit (Machanavajjhala et al. 2007, distinct-l form):
    * k-anonymity alone leaks when a small QI group is homogeneous in
    * its SENSITIVE attribute — every member shares the secret even
    * without re-identification. One row per QI group: group size,
    * distinct sensitive values, and a risk flag (1 when the group has
    * fewer than l distinct sensitive values). Same single-shuffle
    * hash-agg shape as [[kAnonymityAudit]]; the distinct count is
    * bounded by the sensitive attribute's own cardinality. */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("grp_n"),
        countDistinct(col(sensitiveCol)).cast("long").as("n_sens"))
      .withColumn("risky", (col("n_sens") < l).cast("long"))

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007, ordered
    * numeric sensitive attribute) — the third member of the privacy
    * triad after k-anonymity (q161) and l-diversity (q188): a QI group
    * can be large AND diverse yet still leak when its sensitive-value
    * DISTRIBUTION deviates from the table's (e.g. one segment skews
    * overwhelmingly to the lowest income bucket). Per QI group, the
    * Earth-Mover's Distance between the group's and the global
    * distribution over the ordered sensitive values:
    * EMD = Σᵢ |cumP_g(i) − cumP_all(i)| / (m−1), reported in
    * micro-units with a risk flag when it exceeds `tMilli/1000`.
    *
    * Arithmetic: each cumulative-difference term is exact BIGINT
    * cross-multiplication with |cum_g·N − cum_all·n_g| ≤ n_g·N, and the
    * per-group SUM over the m−1 interior sensitive values is bounded by
    * (m−1)·n_g·N ≤ (m−1)·N² — so the joint limit is (m−1)·N² < 2⁶³,
    * e.g. N ≈ 3·10⁹ rows at m ≤ 1000 or N ≈ 10⁸ at m ≤ 10⁶ (m = the
    * sensitive attribute's cardinality, an attribute property, not
    * corpus size); only the final micro-scaling goes through
    * DOUBLE in the same association on both engines (1e6·Σ would
    * overflow BIGINT first — the q181 discipline; IEEE
    * multiply/divide/floor is bit-deterministic). Groups of a single
    * sensitive value table (m ≤ 1) read EMD 0 by definition.
    *
    * Scale design: two hash aggregations ((QI, sens) and QI), one
    * m-row global histogram with an m-bounded cumulative window (m =
    * the sensitive attribute's cardinality, an attribute property, not
    * corpus size), a broadcast of that histogram against the groups
    * (fanout m per group), and per-group cumulative windows KEYED by
    * the QI tuple. No corpus-wide window, no self-join. */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, tMilli: Long): DataFrame = {
    val qi = qiCols.map(col)
    val src = df.select((qi :+ col(sensitiveCol).as("_sv")): _*)
    val gAll = src.groupBy(col("_sv"))
      .agg(count(lit(1)).cast("long").as("_call"))
    val tot = gAll.agg(sum(col("_call")).cast("long").as("_n_all"),
      count(lit(1)).cast("long").as("_m"))
    // m-bounded window: one partition holding the m sensitive values
    val wAll = Window.orderBy(col("_sv"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cumAll = gAll.select(col("_sv"),
      sum(col("_call")).over(wAll).cast("long").as("_cum_all"))
    val gcnt = src.groupBy((qi :+ col("_sv")): _*)
      .agg(count(lit(1)).cast("long").as("_cg"))
    val grps = src.groupBy(qi: _*)
      .agg(count(lit(1)).cast("long").as("grp_n"))
    val grid = grps
      .crossJoin(broadcast(cumAll))
      .crossJoin(broadcast(tot))
      .join(gcnt, qiCols :+ "_sv", "left")
      .na.fill(0L, Seq("_cg"))
    val wG = Window.partitionBy(qi: _*).orderBy(col("_sv"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = grid.withColumn("_cum_g",
      sum(col("_cg")).over(wG).cast("long"))
    cum
      .groupBy((qi ++ Seq(col("grp_n"), col("_n_all"), col("_m"))): _*)
      .agg(sum(abs(col("_cum_g") * col("_n_all") - col("_cum_all") * col("grp_n")))
        .cast("long").as("_num"))
      .withColumn("emd_micro",
        when(col("_m") <= 1, lit(0L))
          .otherwise(floor((lit(1000000.0) * col("_num").cast("double"))
            / (col("grp_n").cast("double") * col("_n_all").cast("double")
              * (col("_m") - 1).cast("double"))).cast("long")))
      .withColumn("risky", (col("emd_micro") > tMilli * 1000L).cast("long"))
      .select((qi ++ Seq(col("grp_n"), col("emd_micro"), col("risky"))): _*)
  }

  /** The releasable table: rows whose QI group has ≥ k members pass
    * through; rows in smaller groups have every QI column nulled
    * (suppressed) so the release stays k-anonymous without dropping
    * record counts. */
  def suppressBelowK(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    val risky = kAnonymityAudit(df, qiCols, k).where(col("risky") === 1)
      .select(qiCols.map(col): _*)
    val marked = df.join(risky.withColumn("_suppress", lit(1L)), qiCols, "left")
    qiCols.foldLeft(marked) { (d, c) =>
      d.withColumn(c, when(col("_suppress").isNotNull, lit(null)).otherwise(col(c)))
    }.drop("_suppress")
  }
}
