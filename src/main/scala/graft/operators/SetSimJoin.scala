package graft.operators

import graft.functions.{HashFns, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join with LOSSLESS prefix filtering (the
  * All-Pairs/PPJoin family — Bayardo, Ma & Srikant, WWW'07): every
  * document pair whose word-shingle Jaccard meets the threshold, with
  * NO candidate caps and NO probabilistic misses. The exact complement
  * of the capped/sketched near-dup family: minhash-LSH (x01) trades
  * recall for speed, the capped inverted index (q27) drops hot-shingle
  * evidence by contract — this operator is what a dedup audit runs when
  * the answer must be COMPLETE (e.g. certifying a benchmark split has
  * no leaked near-duplicates above τ).
  *
  * Why it still scales: order each document's shingles by ascending
  * GLOBAL frequency (rarest first, ties on the shingle string) and keep
  * only the first |x| − ceil(τ·|x|) + 1 as its "prefix". Two sets with
  * Jaccard ≥ τ MUST share a prefix shingle (if all shared shingles sat
  * in either suffix, the overlap would be < ceil(τ·|x|) ≤ |x∩y| — the
  * All-Pairs guarantee), so joining on prefix shingles alone loses
  * nothing, and prefixes hold each document's RAREST shingles — the
  * posting lists with the smallest fanout. The frequent-shingle
  * explosion that forces q27's cap never enters the join.
  *
  * Scale design: shingle frequencies are one vocab-bounded hash agg
  * joined back on the shingle key (no global window — the rank order
  * (freq, shingle) is used directly, so ordering is per-document:
  * a KEYED row_number window). Candidate generation is one
  * posting-list self-join on prefix shingles; verification joins the
  * candidate pairs back to the full shingle postings (two hash joins +
  * one count agg) and applies the threshold by integer
  * cross-multiplication. Everything shuffles on document or shingle
  * keys; AQE splits whatever skew survives the rarest-first prefixes.
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with shingle-set Jaccard ≥ tauMilli/1000.
    * Returns (id_a, id_b, inter, un, jac_milli) — sizes of the
    * intersection and union, and the floor-milli Jaccard. */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
                  shingleK: Int = 4, tauMilli: Long = 600): DataFrame = {
    require(tauMilli >= 1 && tauMilli <= 1000,
      "jaccardJoin: tauMilli must be in [1, 1000]")
    val docs = graft.Caches.persist(df.select(col(idCol), col(textCol))
      .repartition(col(idCol))
      .select(col(idCol).as("_id"),
        HashFns.wordShingles(TextFns.wordTokens(col(textCol)), shingleK).as("_sh"))
      .withColumn("_n", size(col("_sh")))
      .where(col("_n") >= 1))
    val toks = docs.select(col("_id"), col("_n"), explode(col("_sh")).as("_g"))
    val freq = toks.groupBy(col("_g")).agg(count(lit(1)).as("_f"))
    // per-document rarity rank (KEYED window); prefix length
    // L = n − ceil(τ·n) + 1 with ceil via integer arithmetic
    val wDoc = Window.partitionBy(col("_id")).orderBy(col("_f"), col("_g"))
    val prefix = toks.join(freq, "_g")
      .withColumn("_rn", row_number().over(wDoc))
      .where(col("_rn") <=
        col("_n") - expr(s"(($tauMilli * _n + 999) DIV 1000)") + 1L)
      .select(col("_g"), col("_id"))
    val cand = prefix.select(col("_g"), col("_id").as("id_a"))
      .join(prefix.select(col("_g"), col("_id").as("id_b")), Seq("_g"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val posting = toks.select(col("_id"), col("_g"))
    val inter = cand
      .join(posting.select(col("_id").as("id_a"), col("_g")), Seq("id_a"))
      .join(posting.select(col("_id").as("id_b"), col("_g")), Seq("id_b", "_g"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("long").as("inter"))
    val sizes = docs.select(col("_id"), col("_n"))
    inter
      .join(sizes.select(col("_id").as("id_a"), col("_n").as("_na")), "id_a")
      .join(sizes.select(col("_id").as("id_b"), col("_n").as("_nb")), "id_b")
      .withColumn("un", (col("_na") + col("_nb") - col("inter")).cast("long"))
      .where(col("inter") * 1000L >= lit(tauMilli) * col("un"))
      .select(col("id_a"), col("id_b"), col("inter"), col("un"),
        expr("inter * 1000 DIV un").cast("long").as("jac_milli"))
  }
}
