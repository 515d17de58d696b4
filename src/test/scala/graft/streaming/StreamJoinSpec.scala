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

  test("left-outer replay: matched set ≡ inner join; unmatched set obeys the watermark cutoff") {
    val dir = sf("sf0.001")
    val out = StreamJoin.replayParquetOuter(spark, dir, queryName = "ssjo_spec").collect()
    val (matched, unmatched) = out.partition(_.getAs[Long]("matched") == 1L)

    val ev = graft.sources.Tables.table(spark, dir, "events")
      .withColumn("t_us", expr("ts DIV 1000"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("t_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // matched rows = the batch inner interval join
    val wantPairs = clicks.flatMap { case (cid, u, ct) =>
      purchases.collect { case (pu, pt)
        if pu == u && pt >= ct && pt <= ct + 3600000000L => (cid, pt) }
    }
    assert(matched.length == wantPairs.length)

    // unmatched rows: exactly the matchless clicks older than the
    // final watermark (min of the two sides' max event time − 2 h),
    // with −1 sentinels; younger matchless clicks must be absent
    val w = math.min(clicks.map(_._3).max, purchases.map(_._2).max) - 7200000000L
    val matchlessOld = clicks.filter { case (cid, _, ct) =>
      !wantPairs.exists(_._1 == cid) && ct + 3600000000L < w
    }.map(_._1).toSet
    assert(unmatched.map(_.getAs[Long]("click_id")).toSet == matchlessOld)
    assert(unmatched.forall(r => r.getAs[Long]("purchase_id") == -1L &&
      r.getAs[Long]("delta_s") == -1L))
    val emitted = out.map(_.getAs[Long]("click_id")).toSet
    val young = clicks.filter { case (cid, _, ct) =>
      !wantPairs.exists(_._1 == cid) && ct + 3600000000L >= w }.map(_._1)
    assert(young.forall(!emitted.contains(_)),
      "clicks still inside the watermark horizon must not be emitted")
  }
}
