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

  /** Per-rank nDCG gain in micro-units — floor(10⁶ / log2(r+1)), ONE
    * compile-time definition interpolated into both engines (the
    * Benford-constants discipline: no runtime logs to disagree on). */
  def gainMicro(rank: Int): Long =
    math.floor(1e6 / (math.log(rank + 1.0) / math.log(2.0))).toLong

  /** nDCG@k of a ranked run against binary relevance — the
    * position-discounted companion of [[evalRun]]: a hit at rank 1 is
    * worth 10⁶ micro-gain, rank 10 ≈ 289k. DCG sums the gains at the
    * run's relevant ranks; the ideal DCG fills ranks 1..min(k, n_rel)
    * (n_rel = the query's TOTAL relevant count, so a query with plenty
    * of relevant material is graded against a full ideal page).
    * Integer end-to-end: gains are compile-time constants, the final
    * ratio is one floor division. Output per query: (qid, n_rel,
    * dcg_micro, idcg_micro, ndcg_milli). */
  def ndcgAtK(run: DataFrame, truth: DataFrame, qidCol: String,
              idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"ndcgAtK: k=$k")
    val spark = run.sparkSession
    import spark.implicits._
    val gains = (1 to k).map(r => (r.toLong, gainMicro(r)))
      .toDF("_r", "_g")
    val t = truth.select(col(qidCol), col(idCol), lit(1L).as("_rel"))
    val nRel = t.groupBy(col(qidCol))
      .agg(count(lit(1)).cast("long").as("n_rel"))
    val dcg = run
      .select(col(qidCol), col(idCol), col(rankCol).cast("long").as("_r"))
      .where(col("_r") <= k)
      .join(t, Seq(qidCol, idCol), "left").na.fill(0L, Seq("_rel"))
      .join(broadcast(gains), Seq("_r"))
      .groupBy(col(qidCol))
      .agg(sum(col("_rel") * col("_g")).cast("long").as("dcg_micro"))
    // ideal DCG: gains at ranks 1..min(k, n_rel) — a broadcast range
    // join against the k-row gain table
    val idcg = nRel.join(broadcast(gains),
        col("_r") <= least(lit(k.toLong), col("n_rel")))
      .groupBy(col(qidCol))
      .agg(max(col("n_rel")).cast("long").as("n_rel"),
        sum(col("_g")).cast("long").as("idcg_micro"))
    idcg.join(dcg, Seq(qidCol), "left").na.fill(0L, Seq("dcg_micro"))
      .select(col(qidCol), col("n_rel"), col("dcg_micro"),
        col("idcg_micro"),
        expr("CASE WHEN idcg_micro > 0" +
          " THEN dcg_micro * 1000 DIV idcg_micro ELSE 0 END")
          .cast("long").as("ndcg_milli"))
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
