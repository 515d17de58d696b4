package graft.pipelines

import graft.operators.Relational
import graft.sources.Readers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's two top-level data-prep lifecycles (SURVEY.md §3.1,
  * §3.2 stage 1) as composable pipelines over the reference-shaped
  * comment/submission tables.
  */
object Community2Vec {

  /** §3.1 `community2vec` prep (reference `ihop/import_data.py:422-467`):
    * drop user-profile subreddits (`^u_.*`) → top-N subreddits →
    * semi-join → drop deleted authors → per-author context sentences →
    * drop the top pct most-active authors → minimum context length.
    * Returns (contexts, topN).
    */
  def userContexts(comments: DataFrame,
                   topN: Int = 10000,
                   excludeTopUserPct: Double = 0.05,
                   minSentenceLength: Int = 2): (DataFrame, DataFrame) = {
    val noProfiles = Relational.filterRegex(comments, "subreddit", "^u_.*", keep = false)
    val top = Relational.topNByCount(noProfiles, "subreddit", topN, "count")
    val kept = Relational.semiJoin(noProfiles, top, "subreddit")
    val named = Relational.filterNotEqual(kept, "author", "[deleted]")
    val contexts = Relational.groupConcat(named, "author", "subreddit",
      "subreddit_concat", "context_length")
    val cut = Relational.excludeTopPercentByCount(contexts
      .withColumnRenamed("context_length", "cnt"), "cnt", excludeTopUserPct)
      .withColumnRenamed("cnt", "context_length")
    val result = cut.where(col("context_length") >= minSentenceLength)
      .select(col("subreddit_concat"), col("context_length"))
    (result, top)
  }

  /** §3.2 stage 1 `bag_of_words` prep (reference
    * `ihop/import_data.py:470-540`): filter both sides (profiles,
    * deleted authors/text), top-N on comments, top-user exclusion on
    * comments, prefix submission ids, rename overlapping comment
    * columns, inner join on `fullname_id == link_id` with time delta,
    * optional exclusive time window in seconds.
    */
  def joinedSubmissionsComments(submissions: DataFrame, comments: DataFrame,
                                topN: Int = 10000,
                                excludeTopUserPct: Double = 0.05,
                                maxTimeDeltaSeconds: Option[Long] = Some(259200L),
                                minTimeDeltaSeconds: Option[Long] = Some(3L)): DataFrame = {
    val c0 = Relational.filterRegex(comments, "subreddit", "^u_.*", keep = false)
    val s0 = Relational.filterRegex(submissions, "subreddit", "^u_.*", keep = false)
    val top = Relational.topNByCount(c0, "subreddit", topN, "count")
    val c1 = Relational.filterNotIn(
      Relational.filterNotEqual(Relational.semiJoin(c0, top, "subreddit"),
        "author", "[deleted]"),
      "body", Seq("[removed]", "[deleted]"))
    val s1 = Relational.filterNotIn(
      Relational.filterNotEqual(Relational.semiJoin(s0, top, "subreddit"),
        "author", "[deleted]"),
      "selftext", Seq("[removed]", "[deleted]"))

    // exclude hyperactive commenters (J2 + W1)
    val authorCounts = c1.groupBy(col("author")).agg(count(lit(1)).as("cnt"))
    val keepAuthors = Relational.excludeTopPercentByCount(authorCounts, "cnt",
      excludeTopUserPct)
    val c2 = Relational.semiJoin(c1, keepAuthors, "author", broadcastDim = false)

    val s2 = Relational.withPrefixedId(s1, "id", "t3_", "fullname_id")
    val renamed = Relational.renameWithPrefix(c2,
      Seq("id", "author", "subreddit", "created_utc", "score"), "comments_")
    val joined = Relational.joinWithTimeDelta(s2, renamed, "fullname_id", "link_id",
      col("created_utc").cast("long"), col("comments_created_utc").cast("long"),
      "time_to_comment_in_seconds")
    Relational.filterRangeExclusive(joined, "time_to_comment_in_seconds",
      minTimeDeltaSeconds, maxTimeDeltaSeconds)
  }

  /** Convenience: run §3.1 directly from newline-JSON dumps. */
  def userContextsFromJson(spark: SparkSession, paths: Seq[String],
                           topN: Int = 10000): (DataFrame, DataFrame) =
    userContexts(Readers.json(spark, Readers.CommentsDdl, paths), topN)
}
