package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The [[DedupIndex]] equivalence contract: a build→save→load→delta
  * probe must reproduce EXACTLY what the full-corpus [[Dedup.minhashLsh]]
  * run over (corpus ∪ delta) decides for the delta's ids — same hash
  * family, same COMBINED bucket cap — and the saved band table must
  * support static partition pruning (the property that makes the probe
  * I/O delta-proportional at scale). */
class DedupIndexSpec extends SparkSpec {

  private val Tau = (1, 2)
  private val Cap = 50 // small enough to bite at sf0.001

  test("delta dedup equals the full-corpus run restricted to delta ids") {
    val docs = graft.sources.Tables.table(spark, sf("sf0.001"), "documents")
    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val delta = docs.where(col("doc_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("dedup_idx").toString

    DedupIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numBands = 4, rowsPerBand = 2, seed = 42L,
      bandBuckets = 4, idBuckets = 4).save(dir)
    val loaded = DedupIndex.load(spark, dir, "doc_id")
    assert(loaded.meta.numBands == 4 && loaded.meta.rowsPerBand == 2 &&
      !loaded.meta.sqlMirroredHashes, "meta must round-trip")

    val deltaRes = loaded
      .deltaDedup(delta, "text", tauNum = Tau._1, tauDenom = Tau._2,
        maxBucket = Cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullRes = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleK = 3, numBands = 4, rowsPerBand = 2,
        tauNum = Tau._1, tauDenom = Tau._2, seed = 42L, maxBucket = Cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._1 % 5 == 0).toMap
    graft.Caches.release()

    assert(deltaRes.keySet == fullRes.keySet,
      "one keeper row per delta doc")
    val diffs = deltaRes.collect {
      case (id, k) if fullRes(id) != k => (id, k, fullRes(id))
    }
    assert(diffs.isEmpty, s"delta/full keeper mismatches: ${diffs.take(5)}")
    // the fixture must exercise both outcomes or the test proves nothing
    assert(deltaRes.exists { case (id, k) => k != id },
      "some delta doc must have a duplicate")
    assert(deltaRes.exists { case (id, k) => k == id },
      "some delta doc must be unique")
  }

  test("append folds a delta into the index: next probe sees corpus ∪ delta") {
    val docs = graft.sources.Tables.table(spark, sf("sf0.001"), "documents")
    val corpus = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1)
    val d1 = docs.where(col("doc_id") % 5 === 1) // day-1 delta, accepted whole
    val d2 = docs.where(col("doc_id") % 5 === 0) // day-2 delta, the probe
    val dir = java.nio.file.Files.createTempDirectory("dedup_idx_a").toString

    DedupIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numBands = 4, rowsPerBand = 2, seed = 42L,
      bandBuckets = 4, idBuckets = 4).save(dir)
    DedupIndex.load(spark, dir, "doc_id").append(d1, "text", dir)
    val deltaRes = DedupIndex.load(spark, dir, "doc_id") // reload post-append
      .deltaDedup(d2, "text", tauNum = Tau._1, tauDenom = Tau._2,
        maxBucket = Cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullRes = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleK = 3, numBands = 4, rowsPerBand = 2,
        tauNum = Tau._1, tauDenom = Tau._2, seed = 42L, maxBucket = Cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._1 % 5 == 0).toMap
    graft.Caches.release()
    assert(deltaRes == fullRes,
      "post-append probe must equal the full-corpus run on the union")
  }

  test("randomized corpora: delta ≡ full-corpus restricted, any split") {
    import spark.implicits._
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    for (seed <- Seq(11, 23, 37)) {
      val rnd = new scala.util.Random(seed)
      // 60 docs with planted duplicate pressure: half are copies of an
      // earlier doc with 0–2 word edits, so near-dups cross any split
      val texts = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 until 60).foreach { i =>
        if (i > 0 && rnd.nextBoolean()) {
          val base = texts(rnd.nextInt(i)).split(" ")
          (0 until rnd.nextInt(3)).foreach { _ =>
            base(rnd.nextInt(base.length)) = words(rnd.nextInt(words.length))
          }
          texts += base.mkString(" ")
        } else {
          texts += Seq.fill(8 + rnd.nextInt(6))(
            words(rnd.nextInt(words.length))).mkString(" ")
        }
      }
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
      val m = 2 + rnd.nextInt(3) // random split modulus 2..4
      val corpus = docs.where(col("doc_id") % m =!= 0)
      val delta = docs.where(col("doc_id") % m === 0)
      val dir = java.nio.file.Files.createTempDirectory(s"dedup_idx_r$seed")
        .toString
      DedupIndex.build(corpus, "doc_id", "text",
        shingleK = 2, numBands = 4, rowsPerBand = 2, seed = seed,
        bandBuckets = 4, idBuckets = 4).save(dir)
      val deltaRes = DedupIndex.load(spark, dir, "doc_id")
        .deltaDedup(delta, "text", tauNum = Tau._1, tauDenom = Tau._2,
          maxBucket = 20) // tight cap: the combined-size rule must bite
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fullRes = Dedup.minhashLsh(docs, "doc_id", "text",
          shingleK = 2, numBands = 4, rowsPerBand = 2,
          tauNum = Tau._1, tauDenom = Tau._2, seed = seed, maxBucket = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .filter(_._1 % m == 0).toMap
      graft.Caches.release()
      assert(deltaRes == fullRes, s"seed $seed mod $m: delta/full diverged")
    }
  }

  test("compact rewrites only crowded partitions and changes no probe result") {
    val docs = graft.sources.Tables.table(spark, sf("sf0.001"), "documents")
    val corpus = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1)
    val d2 = docs.where(col("doc_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("dedup_idx_c").toString

    DedupIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numBands = 4, rowsPerBand = 2, seed = 42L,
      bandBuckets = 4, idBuckets = 4).save(dir)
    val idx = DedupIndex.load(spark, dir, "doc_id")
    // two append generations — the daily cadence that crowds partitions
    idx.append(docs.where(col("doc_id") % 10 === 1), "text", dir)
    idx.append(docs.where(col("doc_id") % 10 === 6), "text", dir)

    val auditBefore = DedupIndex.audit(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(auditBefore.exists(_._3 > 1),
      "fixture must accumulate multi-file partitions or the test is vacuous")
    val before = DedupIndex.load(spark, dir, "doc_id")
      .deltaDedup(d2, "text", tauNum = Tau._1, tauDenom = Tau._2,
        maxBucket = Cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()

    val stats = DedupIndex.compact(spark, dir, maxFilesPerPartition = 1)
    assert(stats.nonEmpty && stats.forall(s =>
      s.filesAfter == 1 && s.filesBefore > 1),
      s"compact must rewrite exactly the crowded partitions: $stats")
    val auditAfter = DedupIndex.audit(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(auditAfter.forall(_._3 == 1L),
      s"every partition must be single-file after compact: " +
        s"${auditAfter.filter(_._3 > 1).toSeq}")
    // same partitions exist (compact moves bytes, never partitions)
    assert(auditAfter.map(a => (a._1, a._2)).toSet ==
      auditBefore.map(a => (a._1, a._2)).toSet)

    val after = DedupIndex.load(spark, dir, "doc_id")
      .deltaDedup(d2, "text", tauNum = Tau._1, tauDenom = Tau._2,
        maxBucket = Cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    assert(after == before, "probe-after-compact must equal probe-before")
  }

  test("the saved band table prunes statically on (_band, _bkt)") {
    val docs = graft.sources.Tables.table(spark, sf("sf0.001"), "documents")
    val dir = java.nio.file.Files.createTempDirectory("dedup_idx_p").toString
    DedupIndex.build(docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
      numBands = 4, rowsPerBand = 2, bandBuckets = 4, idBuckets = 4).save(dir)
    val loaded = DedupIndex.load(spark, dir, "doc_id")
    val plan = loaded.bands
      .where(col("_band") === 0 && col("_bkt") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_band"),
      s"band probe must be a partition-pruned scan, got:\n$plan")
    // docs side prunes on the id bucket the same way
    val dplan = loaded.docs.where(col("_ibkt").isin(0, 2))
      .queryExecution.executedPlan.toString
    assert(dplan.contains("PartitionFilters") && dplan.contains("_ibkt"),
      s"docs probe must be a partition-pruned scan, got:\n$dplan")
  }
}
