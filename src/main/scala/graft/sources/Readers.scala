package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingestion operators (SURVEY.md §2.1, S1–S4).
  *
  * The reference reads newline-JSON Reddit dumps with an explicit DDL
  * schema in PERMISSIVE mode (malformed rows become nulls, extra JSON
  * fields are dropped by schema projection) — see
  * reference `ihop/import_data.py:181-194`. Fixed schemas matter at
  * scale: they skip the inference scan entirely and prune unused JSON
  * fields at the source.
  */
object Readers {

  /** Comment-table DDL (reference `ihop/import_data.py:34`). */
  val CommentsDdl: String =
    "id STRING, parent_id STRING, score INTEGER, link_id STRING, " +
      "author STRING, subreddit STRING, body STRING, created_utc INTEGER"

  /** Submission-table DDL — `created_utc` is deliberately STRING here:
    * the raw dumps are inconsistent (reference `ihop/import_data.py:35`). */
  val SubmissionsDdl: String =
    "author STRING, created_utc STRING, id STRING, score INTEGER, " +
      "selftext STRING, title STRING, url STRING, subreddit STRING"

  /** S1: newline-JSON scan with fixed schema, permissive, UTF-8. */
  def json(spark: SparkSession, ddl: String, paths: Seq[String]): DataFrame =
    spark.read
      .schema(ddl)
      .option("mode", "PERMISSIVE")
      .option("encoding", "UTF-8")
      .json(paths: _*)

  def comments(spark: SparkSession, paths: String*): DataFrame =
    json(spark, CommentsDdl, paths)

  def submissions(spark: SparkSession, paths: String*): DataFrame =
    json(spark, SubmissionsDdl, paths)

  /** S2: headerless CSV scan with fixed schema
    * (reference `ihop/community2vec.py:32,64-82`). */
  def csv(spark: SparkSession, ddl: String, paths: Seq[String]): DataFrame =
    spark.read.schema(ddl).option("header", "false").csv(paths: _*)

  /** S3/S4: parquet / generic-format scan. */
  def parquet(spark: SparkSession, paths: String*): DataFrame =
    spark.read.parquet(paths: _*)

  def orc(spark: SparkSession, paths: String*): DataFrame =
    spark.read.orc(paths: _*)

  def load(spark: SparkSession, format: String, options: Map[String, String],
           path: String): DataFrame =
    spark.read.format(format).options(options).load(path)
}
