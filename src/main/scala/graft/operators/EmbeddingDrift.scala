package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space drift between two corpus slices (model versions,
  * crawl snapshots, re-embedding runs) — the retrain/reindex trigger:
  * per label, how far did the class centroid MOVE (cosine between the
  * two sides' mean vectors) and how did its magnitude change. An ANN
  * index serving yesterday's centroids degrades silently as the
  * embedding distribution walks; this is the audit that catches it.
  *
  * Exactness discipline: components are floored to micro-int BEFORE any
  * aggregation, so the per-(label, side, dim) sums are exact BIGINTs at
  * any row count and partition order (cross-row FLOAT sums would be
  * accumulation-order-dependent — unusable against an oracle). The
  * centroid cosine is scale-invariant, so the raw component SUMS stand
  * in for the means; the final cosine/norm math runs over the 64-dim
  * arrays as ONE sequential double fold per label (the q139 bit-exact
  * discipline).
  *
  * Scale: one explode to (label, side, dim) — fanout = dim, a schema
  * constant — one hash aggregation, then label-cardinality-bounded
  * row-local array math. */
object EmbeddingDrift {

  /** Per-label centroid comparison between side 0 and side 1 of
    * `sideOf`. Output: (label, n_a, n_b, cos_micro — floor(10⁶·cos)
    * between the two centroids, −2000000 when a side is empty,
    * norm_ratio_milli — floor(1000·‖μ_b‖/‖μ_a‖), −1 when degenerate). */
  def centroidShift(df: DataFrame, labelCol: String, sideOf: Column,
                    vecCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(labelCol).as("label"),
      sideOf.cast("long").as("_g"), col(vecCol).as("_v"))
    val exploded = base
      .select(col("label"), col("_g"),
        posexplode(graft.functions.VectorFns.toDoubles(col("_v"))))
      .select(col("label"), col("_g"), col("pos").as("_d"),
        expr("CAST(FLOOR(col * 1000000) AS BIGINT)").as("_q"))
    val dimSums = exploded.groupBy(col("label"), col("_d"))
      .agg(sum(when(col("_g") === 0L, col("_q")).otherwise(0L))
        .cast("long").as("_sa"),
        sum(when(col("_g") === 1L, col("_q")).otherwise(0L))
          .cast("long").as("_sb"))
    val counts = base.groupBy(col("label"))
      .agg(sum((col("_g") === 0L).cast("long")).cast("long").as("n_a"),
        sum((col("_g") === 1L).cast("long")).cast("long").as("n_b"))
    def fold(a: Column) = aggregate(a, lit(0.0), (acc, x) => acc + x)
    val arrs = dimSums
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("_d"), col("_sa"), col("_sb"))))
        .as("_l"))
      .select(col("label"),
        transform(col("_l"), s => s.getField("_sa").cast("double"))
          .as("_va"),
        transform(col("_l"), s => s.getField("_sb").cast("double"))
          .as("_vb"))
      .select(col("label"),
        fold(zip_with(col("_va"), col("_vb"), (a, b) => a * b)).as("_dot"),
        sqrt(fold(transform(col("_va"), x => x * x))).as("_na"),
        sqrt(fold(transform(col("_vb"), x => x * x))).as("_nb"))
    val _ = spark
    counts.join(arrs, Seq("label"))
      .select(col("label"), col("n_a"), col("n_b"),
        expr("""CAST(CASE WHEN n_a > 0 AND n_b > 0 AND _na > 0 AND _nb > 0
               |THEN floor(1000000.0 * (_dot / (_na * _nb)))
               |ELSE -2000000 END AS BIGINT)""".stripMargin
          .replace("\n", " ")).as("cos_micro"),
        // ‖μ_b‖/‖μ_a‖ = (‖s_b‖/n_b)/(‖s_a‖/n_a) — the counts re-enter
        // only here, one fixed-shape double expression
        expr("""CAST(CASE WHEN n_a > 0 AND n_b > 0 AND _na > 0
               |THEN floor(1000.0 * ((_nb / CAST(n_b AS DOUBLE))
               |     / (_na / CAST(n_a AS DOUBLE))))
               |ELSE -1 END AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("norm_ratio_milli"))
  }
}
