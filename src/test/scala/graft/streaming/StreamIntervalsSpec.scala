package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The stateful interval coalescing replay must reproduce the batch
  * operator exactly — including the swallowing case where a long span
  * keeps its island open past several short successors, and island
  * numbering across a key's islands. */
class StreamIntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming islands equal the batch coalesce (swallow + renumber)") {
    // durations are 1 + event_id % 30 minutes (the q202 derivation):
    // user 1: id 29 at t=0 spans 30 min (covers id 30's 1-min span at
    // t=1 min entirely); id 1 at t=40 min starts island 2.
    // user 2: one span, then a far-away second island.
    val mi = 60000L
    // base is one day past epoch 0: the stream's INITIAL watermark is 0,
    // and rows at exactly the watermark are treated as late
    val b = 86400000L
    val rows = Seq(
      (1L, 29L, b + 0L, "view"), (1L, 30L, b + 1L * mi, "view"),
      (1L, 1L, b + 40L * mi, "view"),
      (2L, 5L, b + 0L, "view"), (2L, 6L, b + 500L * mi, "view"))
    val df = rows.toDF("user_id", "event_id", "ts_ms", "event_type")
      .withColumn("ts", expr("timestamp_millis(ts_ms)")).drop("ts_ms")
    val dir = java.nio.file.Files.createTempDirectory("ivspec")
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(dir.resolve("events.parquet").toString)

    val streamed = StreamIntervals.replayParquet(spark, dir.toString,
        queryName = "iv_spec")
      .collect().map(i => (i.user_id, i.island, i.start, i.end, i.n_rows)).toSet
    val batch = graft.operators.Intervals.coalesce(
        graft.sources.Tables.events(spark, dir.toString), "user_id",
        start = expr("ts DIV 1000000"),
        end = expr("ts DIV 1000000 + 60000 * (1 + event_id % 30)"),
        tieCol = "event_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    // the swallow: user 1's first island spans the full 30 minutes and
    // holds 2 rows; the 40-minute event is island 2
    assert(streamed.contains((1L, 1L, b, b + 30L * mi, 2L)))
    assert(streamed.contains((1L, 2L, b + 40L * mi, b + 42L * mi, 1L)))
    assert(streamed.contains((2L, 2L, b + 500L * mi, b + 507L * mi, 1L)))
  }
}
