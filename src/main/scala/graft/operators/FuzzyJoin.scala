package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance record linkage (entity resolution over noisy
  * string keys — the training-data-pipeline step that reconciles
  * product/author/source names before joins or dedup; the reference's
  * dedup family — SURVEY.md §2.12 — stops at exact/hashed keys, so this
  * extends it with the classic blocking + in-block Levenshtein shape).
  *
  * Scale design: the quadratic never touches the corpus. Matching runs
  * over the DISTINCT-VALUE DICTIONARY (one row per unique string, with
  * its min-id representative and member count), which is vocabulary-
  * bounded — it grows with the domain of the column, not the row count.
  * Within the dictionary, a blocking key (default: the first token)
  * limits comparisons to same-block pairs: one hash shuffle on the
  * block key, then an in-block self-join that Spark's AQE will
  * broadcast when the dictionary is small. The `a < b` ordering on the
  * string itself halves the pair space and fixes pair orientation.
  */
object FuzzyJoin {

  /** Default blocking key: the value's first whitespace token. */
  def firstTokenBlock(c: Column): Column = split(c, " ").getItem(0)

  /** The distinct-value dictionary: one row per unique value of
    * `valueCol` with its smallest `idCol` as representative and the
    * member count (for mapping matches back to row volume). */
  def dictionary(df: DataFrame, idCol: String, valueCol: String): DataFrame =
    df.groupBy(col(valueCol))
      .agg(min(col(idCol)).as("rep_id"),
        count(lit(1)).cast("long").as("members"))

  /** Same-block dictionary pairs within `maxDist` edit distance.
    * Output: (name_a, name_b, id_a, id_b, members_a, members_b, dist),
    * one row per unordered pair (name_a < name_b). */
  def dictionaryFuzzyPairs(df: DataFrame, idCol: String, valueCol: String,
                           maxDist: Int,
                           blockKey: Column => Column = firstTokenBlock)
      : DataFrame = {
    val dict = dictionary(df, idCol, valueCol)
      .withColumn("_blk", blockKey(col(valueCol)))
    val a = dict.select(col(valueCol).as("name_a"), col("rep_id").as("id_a"),
      col("members").as("members_a"), col("_blk").as("_blk_a"))
    val b = dict.select(col(valueCol).as("name_b"), col("rep_id").as("id_b"),
      col("members").as("members_b"), col("_blk").as("_blk_b"))
    a.join(b, col("_blk_a") === col("_blk_b") && col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select("name_a", "name_b", "id_a", "id_b", "members_a", "members_b", "dist")
  }
}
