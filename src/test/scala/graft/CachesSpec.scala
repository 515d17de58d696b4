package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The library's persisted intermediates are registered in
  * [[Caches]] and actually dropped by `release()` — a long-lived
  * session making repeated operator calls must not accumulate
  * cached partitions (round-5 advice). */
class CachesSpec extends SparkSpec {

  test("release() unpersists a tracked dataset") {
    import spark.implicits._
    Caches.release() // isolate from any suite that ran before us
    val probe = Caches.persist(Seq(1, 2, 3).toDF("v"))
    assert(probe.count() == 3)
    assert(probe.storageLevel != StorageLevel.NONE)
    Caches.release()
    assert(probe.storageLevel == StorageLevel.NONE,
      "release() must drop the cache")
    assert(Caches.trackedCount == 0)
    assert(probe.count() == 3, "unpersisted plans recompute on demand")
  }

  test("dedup operators register their intermediates") {
    import spark.implicits._
    Caches.release()
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "x y z w v u"), (4L, "p q r s t u"))
      .toDF("id", "text")
    val kept = operators.Dedup.minhashLsh(docs, "id", "text")
    assert(kept.count() == 4)
    assert(Caches.trackedCount > 0,
      "minhashLsh must route its persists through Caches")
    Caches.release()
    assert(Caches.trackedCount == 0)
    // result remains correct after release (recompute path)
    assert(kept.where(col("keep_id") === col("id")).count() == 3)
  }

  test("transitive keeper tracks its final labels") {
    import spark.implicits._
    Caches.release()
    val ids = Seq(1L, 2L, 3L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val keeper = operators.Dedup.keeperTransitiveFromPairs(ids, "id", pairs)
    assert(Caches.trackedCount > 0)
    assert(keeper.where(col("keep_id") === 1L).count() == 3)
    Caches.release()
    assert(Caches.trackedCount == 0)
  }
}
