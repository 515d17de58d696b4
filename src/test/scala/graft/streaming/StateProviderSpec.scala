package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import scala.jdk.CollectionConverters._

/** Provider-independence of the streaming suite (the 100-TB state
  * posture): the state-store provider decides WHERE state lives —
  * in-heap HDFSBackedStateStoreProvider (Spark's default) vs RocksDB
  * (off-heap, the choice when per-key state outgrows the executor
  * heap) — and must never change what a query emits. The toggle is
  * [[ReplayStage.withStatePartitions]]'s `providerClass` argument /
  * the `graft.stateStoreProvider` system property, applied at query
  * start for every module in the suite.
  *
  * Two pins: (1) the toggle actually REACHES the state store — a
  * replay under the RocksDB provider reports rocksdb custom metrics in
  * its state-operator progress (a spec that only compared outputs
  * could pass with the toggle silently ignored); (2) the x44
  * chained-stateful query (dropDuplicates → windowed agg, two state
  * stores in one plan) emits IDENTICAL rows under both providers. */
class StateProviderSpec extends SparkSpec {

  test("the provider toggle reaches the state store (rocksdb metrics)") {
    // conf.get returns the registered DEFAULT when unset — capture it
    // to assert restoration (getOption never returns None here)
    val before = spark.conf.get(ReplayStage.ProviderConfKey)
    val stream = ReplayStage.completeModeStream(spark, sf("sf0.001"))
    ReplayStage.withStatePartitions(spark, Some(2),
        Some(ReplayStage.RocksDbProvider)) {
      val q = graft.sources.Tables.tsNanosNormalized(stream)
        .groupBy(col("user_id")).agg(count(lit(1)).cast("long").as("n"))
        .writeStream.outputMode("complete")
        .format("memory").queryName("rocks_probe")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val metrics = q.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"expected rocksdb state metrics, got: ${metrics.keySet.asScala}")
    }
    assert(spark.conf.get(ReplayStage.ProviderConfKey) == before,
      "withStatePartitions must restore the provider conf on exit")
  }

  test("x44 chained-stateful replay: identical output under both providers") {
    def run(provider: Option[String], name: String): Seq[(Long, Long)] =
      ReplayStage.withStatePartitions(spark, None, provider) {
        // the provider conf is read at query START inside replayParquet's
        // own withStatePartitions(None) — which leaves it untouched, so
        // this outer scope's setting is the one the store sees
        StreamRollingDistinct.replayParquet(spark, sf("sf0.001"),
            queryName = name)
          .orderBy(col("day_ms")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
      }
    val heap = run(None, "x44_heap")
    val rocks = run(Some(ReplayStage.RocksDbProvider), "x44_rocks")
    assert(heap.nonEmpty && heap == rocks,
      s"provider changed the answer: heap=${heap.take(3)}… rocks=${rocks.take(3)}…")
  }
}
