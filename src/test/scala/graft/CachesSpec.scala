package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The library's persisted intermediates are registered in
  * [[Caches]] and actually dropped by `release()` — a long-lived
  * session making repeated operator calls must not accumulate
  * cached partitions (round-5 advice).
  *
  * Assertions are DELTAS around the operator call (not absolute
  * trackedCount==0) so the suite stays valid even if another suite's
  * tracked handles are in flight; build.sbt additionally pins suites
  * serial (round-6 advice). */
class CachesSpec extends SparkSpec {

  test("release() unpersists a tracked dataset") {
    import spark.implicits._
    val before = Caches.trackedCount
    val probe = Caches.persist(Seq(1, 2, 3).toDF("v"))
    assert(probe.count() == 3)
    assert(Caches.trackedCount >= before + 1)
    assert(probe.storageLevel != StorageLevel.NONE)
    Caches.release()
    assert(probe.storageLevel == StorageLevel.NONE,
      "release() must drop the cache")
    assert(probe.count() == 3, "unpersisted plans recompute on demand")
  }

  test("dedup operators register their intermediates") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "x y z w v u"), (4L, "p q r s t u"))
      .toDF("id", "text")
    val before = Caches.trackedCount
    val kept = operators.Dedup.minhashLsh(docs, "id", "text")
    assert(kept.count() == 4)
    assert(Caches.trackedCount > before,
      "minhashLsh must route its persists through Caches")
    Caches.release()
    // result remains correct after release (recompute path)
    assert(kept.where(col("keep_id") === col("id")).count() == 3)
  }

  test("transitive keeper tracks its final labels") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val before = Caches.trackedCount
    val keeper = operators.Dedup.keeperTransitiveFromPairs(ids, "id", pairs)
    assert(Caches.trackedCount > before)
    assert(keeper.where(col("keep_id") === 1L).count() == 3)
    Caches.release()
  }

  test("untracked IvfIndex.build survives a global release; close() frees it") {
    import spark.implicits._
    val corpus = (0L until 40L)
      .map(i => (i, Array.tabulate(4)(j => ((i * 7 + j) % 11).toFloat / 11f)))
      .toDF("vec_id", "embedding")
    val idx = operators.IvfIndex.build(corpus, "vec_id", "embedding",
      nlist = 2, track = false)
    assert(idx.corpus.storageLevel != StorageLevel.NONE)
    Caches.release() // a request loop's per-query hygiene...
    assert(idx.corpus.storageLevel != StorageLevel.NONE,
      "...must NOT drop a long-lived untracked index")
    idx.close()
    assert(idx.corpus.storageLevel == StorageLevel.NONE,
      "close() owns the index lifecycle")
  }
}
