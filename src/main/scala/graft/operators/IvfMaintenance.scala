package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF index-maintenance audit — the capacity report an ANN serving
  * stack runs BEFORE folding a new ingest batch into an existing index:
  * route the new vectors onto the EXISTING coarse cells (no refit) and
  * compare per-cell occupancy against the base build. A cell whose
  * share of the new batch far exceeds its base share is where the
  * incoming distribution drifted — the cell that will blow past its
  * target size, degrade probe latency, and eventually demand a re-fit
  * (the q241 centroid-drift signal, localized to routing cells).
  *
  * Engine-portable by construction (the q144 regime): the coarse
  * quantizer is DETERMINISTIC — seed centroids are the `nCells` BASE
  * vectors first in md5 order, no KMeans float fit — and distances are
  * float→double casts folded left-to-right (q139 parity family), ties
  * (d2, cell) ascending. Scale: seed pick is a TakeOrdered top-k; the
  * assignment is a row-local broadcast argmin over nCells centroids;
  * ONE hash aggregation finishes. The production path stays
  * [[IvfIndex]]'s partition-pruned probes — this is its planning twin. */
object IvfMaintenance {

  /** Route base (`isNew` = false) and incoming (`isNew` = true) vectors
    * onto md5-seeded base cells; per cell report occupancy and drift.
    * Output: (cell, n_base, n_new, share_base_milli, share_new_milli,
    * growth_milli = floor(1000·n_new/max(n_base,1)), drift_milli =
    * share_new − share_base). */
  def routingAudit(df: DataFrame, idCol: String, vecCol: String,
                   isNew: Column, nCells: Int = 8): DataFrame = {
    require(nCells >= 2 && nCells <= 256, s"routingAudit: nCells=$nCells")
    val H = graft.functions.HashFns
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, e) => acc + e)
    val v = df.select(col(idCol).as("_id"),
      transform(col(vecCol), x => x.cast("double")).as("_ve"),
      isNew.cast("long").as("_new"))
    val vP = graft.Caches.persist(v)
    // seeds from the BASE side only — the index being maintained
    val sd0 = vP.where(col("_new") === 0L)
      .withColumn("_h", H.md5Hash60(
        concat(lit("ivfm:"), col("_id").cast("string"))))
      .orderBy(col("_h"), col("_id")).limit(nCells)
    val seeds = sd0.withColumn("cell",
        (row_number().over(Window.orderBy(col("_h"), col("_id"))) - 1)
          .cast("long"))
      .select(col("cell"), col("_ve").as("_se"))
    val asg = vP.crossJoin(broadcast(seeds))
      .select(col("_id"), col("_new"), col("cell"),
        d2(col("_ve"), col("_se")).as("_d2"))
      .withColumn("_rn", row_number().over(Window.partitionBy(col("_id"))
        .orderBy(col("_d2").asc, col("cell").asc)))
      .where(col("_rn") === 1)
    val cells = asg.groupBy(col("cell"))
      .agg(sum(lit(1L) - col("_new")).cast("long").as("n_base"),
        sum(col("_new")).cast("long").as("n_new"))
    val tot = cells.agg(sum(col("n_base")).cast("long").as("_tb"),
      sum(col("n_new")).cast("long").as("_tn"))
    cells.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_base"), col("n_new"),
        expr("n_base * 1000 DIV GREATEST(_tb, 1)").as("share_base_milli"),
        expr("n_new * 1000 DIV GREATEST(_tn, 1)").as("share_new_milli"),
        expr("n_new * 1000 DIV GREATEST(n_base, 1)").as("growth_milli"),
        expr("n_new * 1000 DIV GREATEST(_tn, 1)" +
          " - n_base * 1000 DIV GREATEST(_tb, 1)").cast("long")
          .as("drift_milli"))
  }
}
