package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StreamJoin: the stream-stream interval join's emitted pair set must
  * equal the batch join over the same data (the x41 oracle contract),
  * and the pairs must respect the interval bounds. */
class StreamJoinSpec extends SparkSpec {

  test("replay equals the batch interval join on sf0.001") {
    val dir = sf("sf0.001")
    val got = StreamJoin.replayParquet(spark, dir, queryName = "ssj_spec")
      .orderBy(col("click_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    val ev = graft.sources.Tables.table(spark, dir, "events")
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("event_time").as("ct"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        col("event_time").as("pt"))
    val want = c.join(p, col("user_id") === col("pu") &&
        col("pt") >= col("ct") && col("pt") <= col("ct") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        expr("(unix_micros(pt) - unix_micros(ct)) DIV 1000000").cast("long").as("delta_s"))
      .orderBy(col("click_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    assert(got.nonEmpty, "sf0.001 must produce at least one attribution pair")
    assert(got == want, "stream-stream inner join ≡ batch join")
    assert(got.forall { case (_, _, _, d) => d >= 0 && d <= 3600 })
  }
}
