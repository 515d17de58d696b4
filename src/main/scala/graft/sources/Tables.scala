package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Accessors for the driver-generated benchmark tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All reads go through
  * [[table]] so scan options stay in one place; Catalyst handles column
  * pruning / predicate pushdown into the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Canonical surface of the event-time column `ts`: BIGINT epoch
    * NANOSECONDS. The generated data has stored it two ways across
    * rounds — INT64 TIMESTAMP(NANOS), which Spark surfaces as BIGINT
    * under `spark.sql.legacy.parquet.nanosAsLong`, and plain
    * `timestamp[us]`, which Spark surfaces as TIMESTAMP_NTZ — so the
    * reader normalizes either encoding to the one BIGINT-nanos column
    * every downstream consumer (batch and streaming) is written
    * against. The `us → ns` widening is exact; the NTZ epoch
    * interpretation is exact because every entry point pins the
    * session timezone to UTC. Works on streaming DataFrames too (pure
    * projection). Other timestamp-typed columns (o_orderdate,
    * l_shipdate) are NOT rewritten: their consumers cast explicitly
    * (`msTs`), and silently replacing a column a query might project
    * as-is would change result schemas. */
  def tsNanosNormalized(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
      case _ => df
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    tsNanosNormalized(spark.read.parquet(s"$sfDir/$name.parquet"))

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
