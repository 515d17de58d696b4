package graft.operators

import graft.functions.{HashFns, NativeFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV sketch SET ALGEBRA (Beyer et al., SIGMOD'07 §3): distinct-count
  * estimates for the UNION and INTERSECTION of every pair of keyed id
  * sets, from one bottom-k sketch per key — the set-operation member of
  * the sketch-audit family (q40 single-set KMV, q129/q194 HLL, q126/x38
  * CMS, q147/x39 bottom-k quantiles). An overlap/contamination monitor
  * asks exactly this: how many users do segments A and B share, without
  * a pairwise COUNT(DISTINCT) over every segment pair.
  *
  * Estimators (k-th smallest hash h_(k), all integer arithmetic):
  * |A∪B| ≈ (k−1)·p DIV u_(k) over U = the k smallest of the MERGED
  * distinct hash sets; ρ = |{x ∈ U : x ∈ S_A ∧ x ∈ S_B}| / |U| is an
  * unbiased Jaccard estimate, so |A∩B| ≈ ρ·|A∪B| — computed as
  * rho_num·est_union DIV |U|. Sketches smaller than k are exact and the
  * estimator falls back to the set size.
  *
  * Scale design: ONE pass builds every sketch (the graft_bottomk typed
  * aggregate — mergeable, map-side combined, k·|keys| total state); the
  * pairwise stage operates on |keys| rows of k-length arrays — a
  * key-cardinality-bounded broadcast self-cross, row-local array math,
  * NEVER touching the corpus again. The exact audit columns are the
  * AUDIT, not the production path: one distinct (key,id) projection,
  * one id-equi self-join bounded by per-id key fanout (≤ |keys|²).
  */
object KmvSetOps {

  /** All unordered key pairs (t_a < t_b) of `keyCol` with KMV estimates
    * of per-set / union / intersection distinct `idCol` counts plus the
    * exact audit counts and the union-estimate error in milli-units. */
  def pairwiseDistinct(df: DataFrame, keyCol: String, idCol: String,
                       k: Int): DataFrame = {
    require(k >= 2, "pairwiseDistinct: k must be >= 2")
    val spark = df.sparkSession
    NativeFns.register(spark)
    val p = HashFns.MersennePrime
    val numerator = (k - 1).toLong * p
    val kv = df.select(col(keyCol).as("t"), col(idCol).as("id"))

    val hvOf: Column => Column = u => HashFns.md5Hash(u.cast("string"))
    val sk = kv
      .groupBy(col("t"))
      .agg(NativeFns.bottomKDistinct(col("id"), hvOf(col("id")), k).as("smp"),
        countDistinct(col("id")).cast("long").as("n_exact"))
      // bottomKDistinct returns ids ascending by (hash, id): the mapped
      // hash array is already sorted
      .select(col("t"), transform(col("smp"), hvOf).as("hs"),
        size(col("smp")).cast("long").as("m"), col("n_exact"))

    // integer-exact estimator: CASE guards the (ANSI) array index and
    // the lazy ELSE keeps sub-k sketches exact; DIV, never double /.
    // GREATEST(·,1) guards the divisor: md5Hash mod MersennePrime is 0
    // with probability ~2⁻³¹ per key, where Spark's non-ANSI DIV would
    // yield NULL but DuckDB's // raises — the guard (mirrored 1:1 in
    // the oracle) keeps both engines total and identical.
    def estSql(hs: String, m: String): String =
      s"CAST(CASE WHEN $m < $k THEN $m " +
        s"ELSE $numerator DIV GREATEST($hs[${k - 1}], 1) END AS BIGINT)"

    // |keys| rows: the self-cross is key-cardinality-bounded, broadcast
    val a = sk.select(col("t").as("t_a"), col("hs").as("hs_a"),
      col("m").as("m_a"), col("n_exact").as("n_a"))
    val b = sk.select(col("t").as("t_b"), col("hs").as("hs_b"),
      col("m").as("m_b"), col("n_exact").as("n_b"))
    val pairsSk = a.join(broadcast(b), col("t_a") < col("t_b"))
      .withColumn("u_sk",
        slice(array_sort(array_distinct(concat(col("hs_a"), col("hs_b")))),
          1, k))
      .withColumn("u_len", size(col("u_sk")).cast("long"))
      .withColumn("est_a", expr(estSql("hs_a", "m_a")))
      .withColumn("est_b", expr(estSql("hs_b", "m_b")))
      .withColumn("est_union", expr(
        s"CAST(CASE WHEN u_len < $k THEN u_len " +
          s"ELSE $numerator DIV GREATEST(u_sk[${k - 1}], 1) END AS BIGINT)"))
      .withColumn("rho_num",
        size(array_intersect(col("u_sk"),
          array_intersect(col("hs_a"), col("hs_b")))).cast("long"))
      .withColumn("est_inter",
        expr("CAST(rho_num * est_union DIV u_len AS BIGINT)"))

    // exact audit: distinct (key,id) self-joined on the id — fanout per
    // id bounded by the key cardinality, never id×id
    val kvd = kv.distinct()
    val inter = kvd.select(col("t").as("t_a"), col("id"))
      .join(kvd.select(col("t").as("t_b"), col("id")), Seq("id"))
      .where(col("t_a") < col("t_b"))
      .groupBy(col("t_a"), col("t_b"))
      .agg(count(lit(1)).cast("long").as("exact_inter"))

    pairsSk.join(inter, Seq("t_a", "t_b"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .withColumn("exact_union", col("n_a") + col("n_b") - col("exact_inter"))
      .withColumn("err_union_milli",
        expr("CAST(abs(est_union - exact_union) * 1000 DIV exact_union AS BIGINT)"))
      .select(col("t_a"), col("t_b"), col("m_a"), col("m_b"),
        col("est_a"), col("est_b"), col("est_union"), col("rho_num"),
        col("est_inter"), col("exact_inter"), col("exact_union"),
        col("err_union_milli"))
  }
}
