package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-run evaluation and fusion — the audit/serving pair that
  * closes the loop around the retrieval family (q84 BM25, q93 hybrid
  * cascade, q139 MRL, brute-force/IVF/PQ ANN): given ranked runs of
  * (query, rank, doc), score them against relevance labels (MRR,
  * hit@k, precision@k — the table a retrieval regression gate reads)
  * and fuse multiple runs with reciprocal-rank fusion (Cormack et al.
  * SIGIR'09 — rank-only fusion, immune to incomparable score scales,
  * the standard lexical+dense ensembling).
  *
  * Integer-exact: reciprocal ranks and precisions are floor-scaled
  * BIGINT divisions; no floats anywhere. Scale: runs are top-k-bounded
  * per query (|queries|·k rows), so every join/window here is
  * candidate-sized — corpus-scale cost lives in the upstream run
  * producers, not in eval/fusion. */
object RetrievalEval {

  /** Score a ranked run against binary relevance. `run`: (qidCol,
    * rank 1-based, idCol); `truth`: (qidCol, idCol) — the relevant
    * pairs (any run row absent from truth is irrelevant). Output per
    * query: n_ret, n_rel_ret, first_rel_rank (0 = none),
    * rr_micro = floor(10⁶/first_rel_rank), hit1, hit5,
    * p_at_k_milli = floor(1000·n_rel_ret∩rank≤k / k). */
  def evalRun(run: DataFrame, truth: DataFrame, qidCol: String,
              idCol: String, rankCol: String, k: Int): DataFrame = {
    val t = truth.select(col(qidCol), col(idCol), lit(1L).as("_rel"))
    run.select(col(qidCol), col(idCol), col(rankCol).cast("long").as("_rk"))
      .join(t, Seq(qidCol, idCol), "left")
      .na.fill(0L, Seq("_rel"))
      .groupBy(col(qidCol))
      .agg(count(lit(1)).cast("long").as("n_ret"),
        sum(col("_rel")).cast("long").as("n_rel_ret"),
        coalesce(min(when(col("_rel") === 1L, col("_rk"))), lit(0L))
          .cast("long").as("first_rel_rank"),
        sum(when(col("_rel") === 1L && col("_rk") <= k, 1L)
          .otherwise(0L)).cast("long").as("_rel_at_k"))
      .select(col(qidCol), col("n_ret"), col("n_rel_ret"),
        col("first_rel_rank"),
        expr("CASE WHEN first_rel_rank > 0" +
          " THEN 1000000 DIV first_rel_rank ELSE 0 END")
          .cast("long").as("rr_micro"),
        expr("CAST(first_rel_rank = 1 AS BIGINT)").as("hit1"),
        expr("CAST(first_rel_rank BETWEEN 1 AND 5 AS BIGINT)").as("hit5"),
        expr(s"_rel_at_k * 1000 DIV $k").cast("long").as("p_at_k_milli"))
  }

  /** Reciprocal-rank fusion of ranked runs (each (qidCol, idCol,
    * rankCol)): rrf(d) = Σ_runs 10⁹ DIV (k0 + rank_run(d)), a doc
    * missing from a run contributing 0 (truncated-run RRF, the
    * production form — runs arrive top-k'd). Output: top `k` fused
    * docs per query with 1-based `rank` and `rrf_scaled`. The fusion
    * is one union + one hash agg + a per-query top-k window over
    * ≤ Σ|runs|·k candidate rows. */
  def rrfFuse(runs: Seq[DataFrame], qidCol: String, idCol: String,
              rankCol: String, k: Int, k0: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse: no runs")
    val contrib = runs.map(r =>
      r.select(col(qidCol), col(idCol),
        expr(s"1000000000 DIV ($k0 + CAST($rankCol AS BIGINT))")
          .as("_pt")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("_rrf").desc, col(idCol))
    contrib.groupBy(col(qidCol), col(idCol))
      .agg(sum(col("_pt")).cast("long").as("_rrf"),
        count(lit(1)).cast("long").as("n_runs"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol),
        col("_rrf").as("rrf_scaled"), col("n_runs"))
  }
}
