package graft.operators

import org.apache.spark.sql.DataFrame
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
