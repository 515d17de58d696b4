package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-ranked vocabulary fitting + token-id encoding — the
  * "convert documents to id sequences for the trainer" stage. Ids are
  * assigned by corpus frequency (1 = most frequent; ties broken by
  * token text so the mapping is deterministic); tokens below
  * `minCount` fall out of the vocabulary and encode to the reserved
  * OOV id 0 — vocabulary truncation is the point of an unk token.
  *
  * Reference scope note: IHOP-Reddit's analogous step is gensim's
  * internal vocab build (community2vec); here it is a first-class
  * relational op so the id mapping is queryable and oracle-checkable.
  *
  * Scale design: counting is one hash aggregation over the token
  * stream. Rank assignment is a global-order `row_number` window over
  * the VOCAB table — vocab-bounded (Zipf ≪ corpus), the same driver
  * size class as the ML fits, not a corpus-sized single partition.
  * Encoding joins the (doc, pos, token) stream against the vocab
  * (shuffle hash join; AQE skew-split for Zipf-hot tokens, broadcast
  * when the vocab fits) and reassembles per-doc sequences with one
  * position-sorted aggregation — never a driver-side map.
  */
object VocabEncoder {

  /** Fit the vocabulary: (w, id) with id 1..|V| by (count desc, w). */
  def fit(docs: DataFrame, tokensCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"fit: minCount must be >= 1, got $minCount")
    docs.select(explode(col(tokensCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
      .withColumn("id",
        row_number().over(Window.orderBy(col("c").desc, col("w").asc))
          .cast("long"))
      .select(col("w"), col("id"))
  }

  /** Encode a tokenized corpus against a fitted vocab: one row per doc
    * with `n_tokens`, `n_oov`, and `ids` (comma-joined, OOV = 0,
    * original token order). Token-less docs encode to (0, 0, ""). */
  def encode(vocab: DataFrame, docs: DataFrame, idCol: String,
             tokensCol: String): DataFrame = {
    val pos = docs.select(col(idCol),
      posexplode(col(tokensCol)).as(Seq("pos", "w")))
    val agg = pos.join(vocab, Seq("w"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("id"), lit(0L)).as("tid"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === 0L, 1L).otherwise(0L)).as("n_oov"),
        concat_ws(",",
          transform(array_sort(collect_list(struct(col("pos"), col("tid")))),
            s => s.getField("tid").cast("string"))).as("ids"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("ids"), lit("")).as("ids"))
  }
}
