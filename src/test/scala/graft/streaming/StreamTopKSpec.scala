package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The chained agg→agg streaming top-k must reproduce the batch
  * hourly rank exactly, and the rank encoding must decode losslessly. */
class StreamTopKSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly top-k equals the batch rank (chained aggs)") {
    val hourNs = 3600L * 1000000000L
    // 3 hours; hour 0: user 1 ×3, user 2 ×2, users 3..5 ×1 (tie on
    // cnt=1 breaks toward smaller id and k=2 cuts inside the tie);
    // hour 1: single user; hour 2: 2-way tie at the top
    val rows =
      Seq.fill(3)((1L, "view")).zipWithIndex.map { case ((u, t), i) => (u, 100L + i, 10000L + i * 1000L, t) } ++
        Seq((2L, 200L, 20000L, "view"), (2L, 201L, 21000L, "view"),
          (3L, 300L, 30000L, "view"), (4L, 400L, 31000L, "view"),
          (5L, 500L, 32000L, "view"),
          (7L, 700L, hourNs / 1000000L + 1L, "view"),
          (8L, 800L, 2L * hourNs / 1000000L + 1L, "view"),
          (9L, 900L, 2L * hourNs / 1000000L + 2L, "view"))
    val df = rows.toDF("user_id", "event_id", "ts_ms", "event_type")
      .withColumn("ts", expr("timestamp_millis(ts_ms)")).drop("ts_ms")
    val dir = java.nio.file.Files.createTempDirectory("topk_spec")
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(dir.resolve("events.parquet").toString)

    val out = StreamTopK.replayParquet(spark, dir.toString, k = 2,
        queryName = "topk_spec")
      .orderBy("bucket_ms", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 1L, 1L, 3L), (0L, 2L, 2L, 2L),
      (3600000L, 1L, 7L, 1L),
      (7200000L, 1L, 8L, 1L), (7200000L, 2L, 9L, 1L)))
  }

  test("rank encoding decodes count and user losslessly") {
    val enc = (StreamTopK.CntCap - 42L) * StreamTopK.UserSpan + 123456789L
    val out = StreamTopK.ranked(
        Seq((0L, Seq(enc))).toDF("bucket_ms", "top")).head()
    assert(out.getLong(1) == 1L && out.getLong(2) == 123456789L &&
      out.getLong(3) == 42L)
  }
}
