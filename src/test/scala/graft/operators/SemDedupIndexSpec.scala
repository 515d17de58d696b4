package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The [[SemDedupIndex]] equivalence contract: a build→save→load→delta
  * probe must reproduce EXACTLY what the full-corpus
  * [[Dedup.semanticDedup]] run over (corpus ∪ delta) decides for the
  * delta's ids — same router cells, same τ, same COMBINED cell-size
  * cap — on BOTH routers (the SQL-mirrorable orthant and the
  * production KMeans), and the saved corpus must support static
  * partition pruning on `_cell`. */
class SemDedupIndexSpec extends SparkSpec {

  private val Tau = 0.30

  /** Full-corpus reference: [[Dedup.semanticDedup]] over the union with
    * the given precomputed cell column, restricted to delta ids. */
  private def fullRef(all: org.apache.spark.sql.DataFrame, m: Int,
                      maxCell: Int): Map[Long, Long] = {
    val res = Dedup.semanticDedup(all, "vec_id", "embedding", "bucket",
        tau = Tau, maxBucket = maxCell)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._1 % m == 0).toMap
    graft.Caches.release()
    res
  }

  test("orthant router: delta probe equals the full-corpus run") {
    val e = graft.sources.Tables.table(spark, sf("sf0.001"), "embeddings")
    val corpus = e.where(col("vec_id") % 5 =!= 0)
    val delta = e.where(col("vec_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("semdedup_o").toString

    SemDedupIndex.buildOrthant(corpus, "vec_id", "embedding", bits = 4)
      .save(dir)
    val loaded = SemDedupIndex.load(spark, dir, "vec_id")
    assert(loaded.meta.routerType == "orthant" && loaded.meta.orthantBits == 4,
      "meta must round-trip")
    val deltaRes = loaded.deltaDedup(delta, "embedding", tau = Tau)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()

    val all = e.withColumn("bucket",
      SemDedupIndex.orthantCell(col("embedding"), 4).cast("long"))
    val fullRes = fullRef(all, 5, Int.MaxValue)
    assert(deltaRes.keySet == fullRes.keySet, "one keeper row per delta doc")
    assert(deltaRes == fullRes, s"delta/full diverged: ${
      deltaRes.collect { case (k, v) if fullRes(k) != v =>
        (k, v, fullRes(k)) }.take(5)}")
    // the fixture must exercise both outcomes or the test proves nothing
    assert(deltaRes.exists { case (id, k) => k != id }, "need a duplicate")
    assert(deltaRes.exists { case (id, k) => k == id }, "need a unique doc")
  }

  test("kmeans router: delta probe equals the full-corpus run, post-reload") {
    val e = graft.sources.Tables.table(spark, sf("sf0.001"), "embeddings")
    val corpus = e.where(col("vec_id") % 3 =!= 0)
    val delta = e.where(col("vec_id") % 3 === 0)
    val dir = java.nio.file.Files.createTempDirectory("semdedup_k").toString

    SemDedupIndex.buildKMeans(corpus, "vec_id", "embedding",
      nlist = 8, seed = 7L, cellIter = 5).save(dir)
    val loaded = SemDedupIndex.load(spark, dir, "vec_id")
    assert(loaded.meta.routerType == "kmeans" && loaded.meta.nlist == 8)
    val deltaRes = loaded.deltaDedup(delta, "embedding", tau = Tau)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()

    // reference cells from the SAME persisted router (float-centroid
    // routing is model state, not SQL — determinism comes from the
    // save/load round-trip, which is exactly what this asserts)
    import org.apache.spark.ml.functions.array_to_vector
    val router = org.apache.spark.ml.clustering.KMeansModel
      .load(s"$dir/router").setPredictionCol("bucket")
    val all = router.transform(e.withColumn("_features",
        array_to_vector(graft.functions.VectorFns.toDoubles(col("embedding")))))
      .select(col("vec_id"), col("embedding"), col("bucket").cast("long")
        .as("bucket"))
    val fullRes = fullRef(all, 3, Int.MaxValue)
    assert(deltaRes == fullRes,
      "kmeans delta probe must equal the full-corpus run on router cells")
    assert(deltaRes.exists { case (id, k) => k != id }, "need a duplicate")
  }

  test("append folds a delta in; a biting combined cap matches the full run") {
    val e = graft.sources.Tables.table(spark, sf("sf0.001"), "embeddings")
    val corpus = e.where(col("vec_id") % 5 =!= 0 && col("vec_id") % 5 =!= 1)
    val d1 = e.where(col("vec_id") % 5 === 1) // day-1 delta, accepted whole
    val d2 = e.where(col("vec_id") % 5 === 0) // day-2 delta, the probe
    val dir = java.nio.file.Files.createTempDirectory("semdedup_a").toString
    val cap = 40 // 500 vecs over ≤16 orthants: several cells exceed this

    SemDedupIndex.buildOrthant(corpus, "vec_id", "embedding", bits = 4)
      .save(dir)
    SemDedupIndex.load(spark, dir, "vec_id").append(d1, "embedding", dir)
    val deltaRes = SemDedupIndex.load(spark, dir, "vec_id") // post-append
      .deltaDedup(d2, "embedding", tau = Tau, maxCell = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()

    val all = e.withColumn("bucket",
      SemDedupIndex.orthantCell(col("embedding"), 4).cast("long"))
    val fullRes = fullRef(all, 5, cap)
    assert(deltaRes == fullRes,
      "post-append capped probe must equal the full-corpus capped run")
    // the cap must actually bite somewhere or the guard is untested
    val uncapped = fullRef(all, 5, Int.MaxValue)
    assert(uncapped != fullRes, "fixture cap must bite")
  }

  test("compact rewrites only crowded cells and changes no probe result") {
    val e = graft.sources.Tables.table(spark, sf("sf0.001"), "embeddings")
    val corpus = e.where(col("vec_id") % 5 =!= 0 && col("vec_id") % 5 =!= 1)
    val d2 = e.where(col("vec_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("semdedup_c").toString

    SemDedupIndex.buildOrthant(corpus, "vec_id", "embedding", bits = 4)
      .save(dir)
    val idx = SemDedupIndex.load(spark, dir, "vec_id")
    idx.append(e.where(col("vec_id") % 10 === 1), "embedding", dir)
    idx.append(e.where(col("vec_id") % 10 === 6), "embedding", dir)

    val auditBefore = SemDedupIndex.audit(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(auditBefore.exists(_._2 > 1),
      "fixture must accumulate multi-file cells or the test is vacuous")
    val before = SemDedupIndex.load(spark, dir, "vec_id")
      .deltaDedup(d2, "embedding", tau = Tau)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()

    val stats = SemDedupIndex.compact(spark, dir, maxFilesPerPartition = 1)
    assert(stats.nonEmpty && stats.forall(s =>
      s.filesAfter == 1 && s.filesBefore > 1))
    val auditAfter = SemDedupIndex.audit(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(auditAfter.forall(_._2 == 1L), "single-file cells after compact")
    assert(auditAfter.map(_._1).toSet == auditBefore.map(_._1).toSet,
      "compact moves bytes, never cells")

    val after = SemDedupIndex.load(spark, dir, "vec_id")
      .deltaDedup(d2, "embedding", tau = Tau)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    assert(after == before, "probe-after-compact must equal probe-before")
  }

  test("the saved corpus prunes statically on _cell") {
    val e = graft.sources.Tables.table(spark, sf("sf0.001"), "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("semdedup_p").toString
    SemDedupIndex.buildOrthant(e.where(col("vec_id") % 5 =!= 0),
      "vec_id", "embedding", bits = 4).save(dir)
    val plan = SemDedupIndex.load(spark, dir, "vec_id")
      .corpus.where(col("_cell").isin(1, 5, 9))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_cell"),
      s"cell probe must be a partition-pruned scan, got:\n$plan")
  }
}
