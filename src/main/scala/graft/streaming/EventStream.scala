package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming form of the event-time aggregation (the
  * reference is batch-only — SURVEY.md §2.11 — but a training-data
  * pipeline wants the same aggregation runnable over a stream; the
  * batch query q28 and this operator share semantics).
  *
  * Watermarked tumbling-window counts per event type. For local
  * verification the parquet directory is replayed as a stream with an
  * `availableNow` trigger into a memory sink — the plan is identical to
  * what a Kafka-sourced deployment would run.
  */
object EventStream {

  /** Windowed aggregation over a streaming events DataFrame whose `ts`
    * column is BIGINT nanoseconds (the parquet surface of events). */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 1000000)).as("sum_value_micro"))
      .select(unix_millis(col("window.start")).as("bucket_ms"),
        col("event_type"), col("cnt"), col("sum_value_micro"))

  /** Stream-static enrichment: the streaming event feed joins a STATIC
    * dimension (no watermark needed on the static side — Structured
    * Streaming re-plans the static relation per micro-batch) and
    * aggregates per dimension attribute. The static side is broadcast:
    * each micro-batch pays a hash-join probe, never a shuffle of the
    * stream. This is the third canonical streaming shape next to the
    * windowed aggregation ([[hourlyByType]]) and stateful sessions
    * ([[StatefulSessions]]). */
  def enrichedTotalsByNation(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(broadcast(customers.select(col("c_custkey"), col("c_nationkey"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 1000000)).as("sum_value_micro"))

  /** Replay parquet events against the static customer table through
    * the stream-static plan; returns the completed result. */
  def replayEnriched(spark: SparkSession, dir: String,
                     queryName: String = "stream_enrich",
                     statePartitions: Option[Int] = Some(8)): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val customers = spark.read.parquet(s"$dir/customer.parquet")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    try {
      val q = enrichedTotalsByNation(stream, customers).writeStream
        .outputMode("complete")
        .format("memory").queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
    spark.table(queryName)
  }

  /** Replay parquet events through the streaming plan into an
    * in-memory table; returns the completed result. The file-stream
    * source requires a directory, so the table is selected with a glob
    * filter over `dir`. */
  def replayParquet(spark: SparkSession, dir: String,
                    glob: String = "events.parquet",
                    queryName: String = "stream_hourly",
                    statePartitions: Option[Int] = Some(8)): DataFrame = {
    val schema = spark.read.parquet(s"$dir/$glob").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
    // state partitions = shuffle partitions at first start; a bounded
    // replay with small keyed state (type × window) runs fastest on a
    // few state stores — scoped to this start, restored after (a real
    // deployment passes None and sizes the session conf to the cluster)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    try {
      val q = hourlyByType(graft.sources.Tables.tsNanosNormalized(stream)).writeStream
        .outputMode("complete")
        .format("memory").queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
    spark.table(queryName)
  }
}
