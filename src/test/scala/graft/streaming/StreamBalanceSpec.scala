package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The streaming clamp recurrence must agree with the batch reflection
  * identity (one contract, two execution models). */
class StreamBalanceSpec extends SparkSpec {
  import spark.implicits._

  test("streaming balances equal the batch reflection identity") {
    val b = 86400000L
    // user 1: +9, −20 (clamp), +3; user 2: −5 (clamp at first move), +8
    val rows = Seq(
      (1L, 1L, b + 1000L, "purchase", 9.0),
      (1L, 2L, b + 2000L, "error", 20.0),
      (1L, 3L, b + 3000L, "purchase", 3.0),
      (2L, 4L, b + 1000L, "error", 5.0),
      (2L, 5L, b + 9000L, "purchase", 8.0),
      // a 'view' row must not enter anyone's balance
      (1L, 6L, b + 1500L, "view", 100.0))
    val df = rows.toDF("user_id", "event_id", "ts_ms", "event_type", "value")
      .withColumn("ts", expr("timestamp_millis(ts_ms)")).drop("ts_ms")
    val dir = java.nio.file.Files.createTempDirectory("balspec")
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(dir.resolve("events.parquet").toString)

    val streamed = StreamBalance.replayParquet(spark, dir.toString,
        queryName = "bal_spec")
      .collect().map(x =>
        (x.user_id, x.n_moves, x.n_clamped, x.final_balance, x.peak_balance))
      .toSet
    val batch = graft.operators.RunningOps.clampedBalance(
        graft.sources.Tables.events(spark, dir.toString)
          .where(col("event_type").isin("purchase", "error")),
        "user_id", order = expr("ts DIV 1000"), tieCol = "event_id",
        delta = when(col("event_type") === "purchase",
            expr("CAST(FLOOR(value) AS BIGINT)"))
          .otherwise(-expr("CAST(FLOOR(value) AS BIGINT)")))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.contains((1L, 3L, 1L, 3L, 9L)))
    assert(streamed.contains((2L, 2L, 1L, 8L, 8L)))
  }
}
