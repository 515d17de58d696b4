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
    * Output: (cluster, member, count, is_intruder, pos) — `pos` is the
    * member's 1-based presentation slot under the seeded shuffle, so
    * the export carries its own total order.
    *
    * `countCol` must be integral (it is a popularity COUNT): the ±1σ
    * band is evaluated as `(c*n − Σx)² ≤ n*Σx² − (Σx)²` — the same
    * predicate with both sides multiplied by n², so it stays in exact
    * long arithmetic (no stddev/sqrt float boundary flips) and an SQL
    * oracle reproduces it bit-for-bit.
    *
    * `sqlMirroredHashes = true` swaps the xxhash64 pick/shuffle hashes
    * for the engine-portable 60-bit md5-prefix family (q39's
    * convention), making the whole export DuckDB-mirrorable (q90).
    *
    * Scale note: the candidate-intruder join below is a non-equi band
    * predicate, which Spark plans as a BROADCAST NESTED LOOP with the
    * eligible-cluster aggregate (k rows, one per cluster) broadcast.
    * That is O(k·n) work — fine while k is domain-bounded (annotation
    * exports run over ≤~10³ clusters; the reference's is ≤250). If k
    * ever grows unbounded, bucketize the band first (the q44
    * `rangeJoinBucketed` shape: bin counts into σ-wide buckets and
    * equi-join on bucket ± 1) before reusing this operator. */
  def intruderTask(assignments: DataFrame, keyCol: String, clusterCol: String,
                   countCol: String, topN: Int = 5, seed: Long = 8675309L,
                   sqlMirroredHashes: Boolean = false): DataFrame = {
    def h(tag: Long, cluster: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (sqlMirroredHashes)
        graft.functions.HashFns.md5Hash60(concat_ws("|",
          lit(tag.toString), cluster.cast("string"), col(keyCol).cast("string")))
      else xxhash64(lit(tag), cluster, col(keyCol))

    val byPop = Window.partitionBy(col(clusterCol))
      .orderBy(col(countCol).desc, col(keyCol).asc)
    val top = assignments
      .withColumn("_rk", row_number().over(byPop)).where(col("_rk") <= topN)

    val cLong = col(countCol).cast("long")
    val eligible = top.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("_n"), sum(cLong).as("_sx"),
        sum(cLong * cLong).as("_sxx"))
      .where(col("_n") === topN)

    // candidate intruders: members of OTHER clusters within ±1σ of the
    // target cluster's mean count; pick one per cluster by seeded hash
    val dev = cLong * col("_n") - col("_sx")
    val cand = eligible.select(col(clusterCol).as("_target"),
        col("_n"), col("_sx"), col("_sxx"))
      .join(assignments,
        col(clusterCol) =!= col("_target") &&
          dev * dev <= col("_n") * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("_h", h(seed, col("_target")))
    val pick = Window.partitionBy(col("_target")).orderBy(col("_h"), col(keyCol))
    val intruders = cand.withColumn("_rk", row_number().over(pick))
      .where(col("_rk") === 1)
      .select(col("_target").as(clusterCol), col(keyCol), col(countCol),
        lit(true).as("is_intruder"))

    val members = top.join(intruders.select(col(clusterCol)), Seq(clusterCol), "left_semi")
      .select(col(clusterCol), col(keyCol), col(countCol), lit(false).as("is_intruder"))

    val slot = Window.partitionBy(col(clusterCol))
      .orderBy(col("_shuffle"), col(keyCol))
    members.union(intruders)
      .withColumn("_shuffle", h(seed + 1, col(clusterCol)))
      .withColumn("pos", row_number().over(slot).cast("long"))
      .orderBy(col(clusterCol), col("pos"))
      .drop("_shuffle")
  }

  /** (c) Inter-annotator agreement: Cohen's κ between two label columns
    * over the same items — the audit a labeling campaign runs before
    * trusting its annotations (closes the export→collect→audit loop
    * around (a)/(b)). Output: the full contingency table (one row per
    * (a, b) label pair with its count) with the global summary repeated
    * on every row — n_items, n_agree, sum_rowcol (Σ rowᵢ·colᵢ, the
    * chance-agreement numerator) and kappa_milli.
    *
    * Exactness: the contingency and both κ operands are pure long
    * arithmetic; κ = (n·d − Σrc) / (n² − Σrc) is evaluated as ONE
    * double division of two exactly-representable longs (< 2⁵³ for any
    * n ≤ 3·10⁷ items) then floored to milli-units, so an SQL oracle
    * reproduces it bit-for-bit.
    *
    * Scale: one hash aggregation on (a, b); everything after runs on
    * the k×k contingency (label-vocabulary-bounded), broadcast back
    * onto it. */
  def cohensKappaMilli(labels: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ct = labels.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).cast("long").as("n"))
    val totals = ct.agg(sum(col("n")).as("n_items"),
      sum(when(col("a") === col("b"), col("n")).otherwise(lit(0L))).as("n_agree"))
    val rowcol = ct.groupBy(col("a")).agg(sum(col("n")).as("_rn"))
      .join(ct.groupBy(col("b")).agg(sum(col("n")).as("_cn")),
        col("a") === col("b"))
      .agg(sum(col("_rn") * col("_cn")).as("sum_rowcol"))
    val summary = totals.crossJoin(rowcol)
      .withColumn("kappa_milli",
        floor((lit(1000L) * (col("n_items") * col("n_agree") - col("sum_rowcol")))
          .cast("double")
          / (col("n_items") * col("n_items") - col("sum_rowcol")).cast("double"))
          .cast("long"))
    ct.crossJoin(broadcast(summary)).orderBy(col("a"), col("b"))
  }
}
