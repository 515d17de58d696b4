package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-STREAM interval join — the one canonical Structured-Streaming
  * shape the suite had not yet exercised (the others: windowed agg
  * x15, sessions x19, stream-static enrich x20, as-of x21/x30,
  * near-dup x24, dedup x25, gates x23/x31/x33, sketches x37/x38,
  * quantiles x39, weighted sample x40). Attribution is the textbook
  * instance: join each purchase to the clicks by the same user in the
  * preceding hour, both sides unbounded streams.
  *
  * State posture at scale: BOTH sides carry watermarks and the join
  * condition bounds each side's event time relative to the other
  * (purchase ∈ [click, click + horizon]), so Spark derives state
  * eviction for both buffers — state is (events within watermark +
  * horizon) per side, partitioned by the equi-key (user), and the join
  * itself is the streaming symmetric hash join on that key. An inner
  * join's emitted pair set equals the batch join over the full data
  * regardless of micro-batch boundaries — that equality IS the oracle
  * contract.
  */
object StreamJoin {

  /** Inner interval join: (click, purchase) pairs for the same user
    * with purchase_time ∈ [click_time, click_time + horizon]. Inputs
    * must already carry watermarks on their time columns. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       horizon: String = "1 hour"): DataFrame =
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_time") >= col("click_time") &&
        col("purchase_time") <= col("click_time") + expr(s"INTERVAL $horizon"))

  /** Replay the events parquet as TWO streams (click side, purchase
    * side) through the interval join; returns the matched pairs with
    * the click→purchase delay in whole seconds. */
  def replayParquet(spark: SparkSession, dir: String,
                    queryName: String = "stream_join",
                    statePartitions: Option[Int] = Some(8)): DataFrame = {
    val glob = "events.parquet"
    val schema = spark.read.parquet(s"$dir/$glob").schema
    def side(tpe: String): DataFrame =
      graft.sources.Tables.tsNanosNormalized(
          spark.readStream.schema(schema)
            .option("pathGlobFilter", glob).parquet(dir))
        .where(col("event_type") === tpe)
        .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
    val clicks = side("click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", "2 hours")
    val purchases = side("purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", "2 hours")
    // bounded replay, keyed state per user → few state stores (see
    // EventStream.replayParquet for the rationale)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    try {
      val q = clickAttribution(clicks, purchases).writeStream
        .outputMode("append")
        .format("memory").queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
    spark.table(queryName)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        expr("(unix_micros(purchase_time) - unix_micros(click_time)) DIV 1000000")
          .cast("long").as("delta_s"))
  }
}
