package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The streaming sufficient-statistics fit must recover a planted
  * linear signal exactly and agree with the batch finish. */
class StreamOlsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming daily OLS recovers a planted slope per window") {
    // day 1 (base b): value = 2·x seconds / 1000 → y_milli = 2·x,
    // slope_micro must be exactly 2_000_000, intercept 0, R² = 1.
    // day 2: constant value → dx > 0 (x varies) but slope 0.
    val b = 86400000L
    val day1 = (1 to 5).map { i =>
      val xSec = i * 100L
      (1L, 100L + i, b + xSec * 1000L, "view", 2.0 * xSec / 1000.0)
    }
    val day2 = (1 to 4).map { i =>
      (2L, 200L + i, b + 86400000L + i * 60000L, "view", 7.0)
    }
    val df = (day1 ++ day2)
      .toDF("user_id", "event_id", "ts_ms", "event_type", "value")
      .withColumn("ts", expr("timestamp_millis(ts_ms)")).drop("ts_ms")
    val dir = java.nio.file.Files.createTempDirectory("olsspec")
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(dir.resolve("events.parquet").toString)

    val out = StreamOls.replayParquet(spark, dir.toString,
        queryName = "ols_spec")
      .orderBy("day_ms").collect()
    assert(out.length == 2)
    val d1 = out(0)
    assert(d1.getAs[Long]("ok") == 1L &&
      d1.getAs[Long]("slope_micro") == 2000000L &&
      d1.getAs[Long]("intercept_centi") == 0L &&
      d1.getAs[Long]("r2_milli") == 1000L)
    val d2 = out(1)
    assert(d2.getAs[Long]("ok") == 1L &&
      d2.getAs[Long]("slope_micro") == 0L && d2.getAs[Long]("r2_milli") == 0L)
  }
}
