package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Human-annotation task exports (SURVEY.md §2.10 X17; reference
  * `ihop/annotation_task_export.py`). The reference does this in pandas
  * on collected frames; here each export is a Spark plan (groupBy +
  * window top-k + seeded sampling), so it scales with the cluster count
  * and never collects the membership table.
  */
object Annotation {

  /** (a) Label task: one row per cluster with its space-joined member
    * list (sorted for determinism) plus blank annotation columns
    * (reference `ihop/annotation_task_export.py:26-61`). */
  def labelTask(assignments: DataFrame, keyCol: String, clusterCol: String): DataFrame =
    assignments.groupBy(col(clusterCol))
      .agg(array_join(array_sort(collect_list(col(keyCol))), " ").as("members"))
      .withColumn("label", lit(""))
      .withColumn("notes", lit(""))
      .orderBy(col(clusterCol))

  /** (b) Intruder task: per cluster, the top-n members by popularity
    * plus one "intruder" sampled (seeded) from other clusters whose
    * popularity lies within ±1 stddev of the cluster's mean popularity;
    * clusters smaller than `topN` or without any eligible intruder are
    * skipped (reference `ihop/annotation_task_export.py:106-190`).
    * Output: (cluster, member, count, is_intruder), members shuffled
    * deterministically by a seeded hash. */
  def intruderTask(assignments: DataFrame, keyCol: String, clusterCol: String,
                   countCol: String, topN: Int = 5, seed: Long = 8675309L): DataFrame = {
    val byPop = Window.partitionBy(col(clusterCol))
      .orderBy(col(countCol).desc, col(keyCol).asc)
    val top = assignments
      .withColumn("_rk", row_number().over(byPop)).where(col("_rk") <= topN)

    val eligible = top.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("_n"), avg(col(countCol)).as("_mu"),
        coalesce(stddev_pop(col(countCol)), lit(0.0)).as("_sd"))
      .where(col("_n") === topN)

    // candidate intruders: members of OTHER clusters within ±1σ of the
    // target cluster's mean count; pick one per cluster by seeded hash
    val cand = eligible.select(col(clusterCol).as("_target"), col("_mu"), col("_sd"))
      .join(assignments,
        col(clusterCol) =!= col("_target") &&
          col(countCol) >= col("_mu") - col("_sd") &&
          col(countCol) <= col("_mu") + col("_sd"))
      .withColumn("_h", xxhash64(lit(seed), col("_target"), col(keyCol)))
    val pick = Window.partitionBy(col("_target")).orderBy(col("_h"), col(keyCol))
    val intruders = cand.withColumn("_rk", row_number().over(pick))
      .where(col("_rk") === 1)
      .select(col("_target").as(clusterCol), col(keyCol), col(countCol),
        lit(true).as("is_intruder"))

    val members = top.join(intruders.select(col(clusterCol)), Seq(clusterCol), "left_semi")
      .select(col(clusterCol), col(keyCol), col(countCol), lit(false).as("is_intruder"))

    members.union(intruders)
      .withColumn("_shuffle", xxhash64(lit(seed + 1), col(clusterCol), col(keyCol)))
      .orderBy(col(clusterCol), col("_shuffle"))
      .drop("_shuffle")
  }
}
