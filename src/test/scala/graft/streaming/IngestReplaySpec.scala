package graft.streaming

import graft.SparkSpec
import graft.operators.DedupIndex
import org.apache.spark.sql.functions._

/** The ingest-loop properties two micro-batches cannot witness, plus
  * the retry/maintenance hardening of the per-batch folds:
  *
  *  - N = 3 arrival-ordered batches with a PLANTED cross-batch
  *    duplicate chain (copies in batches 0 and 2, none in 1) where the
  *    earliest-SEEN keeper provably differs from the min-id keeper;
  *  - N = 3 id-ordered batches reproduce the one-shot delta dedup
  *    (the x57 contract, beyond its registered 2-batch form);
  *  - the seen-map is a bucketed, compactable table: multi-batch runs
  *    accrete file generations, audit reports them, compact flattens
  *    them without changing a row;
  *  - appendTagged is retry-idempotent: re-running a batch fold (the
  *    crash-before-marker window) converges to exactly one copy. */
class IngestReplaySpec extends SparkSpec {

  private val ChainText =
    "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew identical duplicated content for the planted chain"

  /** Arrival bucket of an id under the module's staging hash. */
  private def buckets(n: Int, ids: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    ids.toDF("doc_id")
      .withColumn("b", pmod(graft.functions.HashFns.md5Hash60(
        concat(lit("arr:"), col("doc_id").cast("string"))), lit(n.toLong)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("N=3 arrival replay: a chain seen in batches 0 and 2 (absent " +
    "in 1) keeps the batch-0 copy even though a batch-2 copy has the " +
    "smaller id") {
    import spark.implicits._
    val bk = buckets(3, 0L until 3000L)
    def pick(b: Long, pred: Long => Boolean) =
      bk.collect { case (id, bb) if bb == b && pred(id) => id }.min
    val c = pick(2, _ => true)            // batch 2, smallest available id
    val b = pick(2, _ > c)                // batch 2, larger id than c
    val a = pick(0, _ > b)                // batch 0, LARGEST id of the three
    assert(c < b && b < a, s"fixture ids must order c<b<a: $c $b $a")

    val fillers = (0L until 3000L).filterNot(Set(a, b, c))
      .filter(id => bk(id) == 1).take(5) // batch-1 docs, all unique text
    val delta = (Seq(a, b, c).map(id => (id, ChainText)) ++
      fillers.map(id => (id, s"unique filler number $id with words " +
        s"alpha$id beta$id gamma$id delta$id epsilon$id")))
      .toDF("doc_id", "text")
    val corpus = (10000L until 10008L)
      .map(id => (id, s"corpus background doc $id carrying tokens " +
        s"red$id green$id blue$id cyan$id magenta$id")).toDF("doc_id", "text")

    val stage = java.nio.file.Files.createTempDirectory("ingest_n3").toString
    val out = StreamDeltaDedupArrival.replayFrames(spark, corpus, delta,
        stage, shingleK = 3, numBands = 4, rowsPerBand = 2, seed = 42L,
        tauNum = 7, tauDenom = 10, queryName = "n3_arrival", numBatches = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()

    assert(out.keySet == delta.select("doc_id").collect()
      .map(_.getLong(0)).toSet, "one keeper row per delta doc")
    assert(out(a) == a, "the batch-0 copy is the earliest seen — keeper")
    assert(out(b) == a && out(c) == a,
      s"batch-2 copies must keep the batch-0 partner: ${out(b)}, ${out(c)}")
    // non-vacuous: the min-id contract would have kept c (< a) for b
    assert(c < a, "fixture must make earliest-seen ≠ min-id")
    fillers.foreach(id => assert(out(id) == id, "fillers are unique"))
  }

  test("N=3 id-ordered replay equals the one-shot delta dedup (x57 " +
    "contract beyond two batches)") {
    val d = sf("sf0.001")
    val stage = java.nio.file.Files.createTempDirectory("ingest_x57n3")
    val streamed = StreamDeltaDedup.replayParquet(spark, d,
        stageDir = stage.toString, deltaMod = 5, shingleK = 3,
        numBands = 4, rowsPerBand = 2, seed = 42L, tauNum = 7,
        tauDenom = 10, queryName = "n3_ordered", numBatches = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()

    val docs = graft.sources.Tables.table(spark, d, "documents")
      .select(col("doc_id"), col("text"))
    val idxDir = java.nio.file.Files.createTempDirectory("ingest_ref")
    DedupIndex.build(docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
        shingleK = 3, numBands = 4, rowsPerBand = 2, seed = 42L,
        sqlMirroredHashes = true)
      .save(idxDir.toString)
    val oneShot = DedupIndex.load(spark, idxDir.toString, "doc_id")
      .deltaDedup(docs.where(col("doc_id") % 5 === 0), "text",
        tauNum = 7, tauDenom = 10, maxBucket = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    assert(streamed == oneShot,
      "3-batch id-ordered keepers must equal the one-shot probe")
  }

  test("the seen-map accretes per-batch generations, audits, and " +
    "compacts without changing a row") {
    val d = sf("sf0.001")
    val stage = java.nio.file.Files.createTempDirectory("ingest_seen")
    StreamDeltaDedupArrival.replayParquet(spark, d,
      stageDir = stage.toString, deltaMod = 5, shingleK = 3,
      numBands = 4, rowsPerBand = 2, seed = 42L, tauNum = 7,
      tauDenom = 10, queryName = "seen_maint", numBatches = 3)
    graft.Caches.release()
    val seenDir = s"$stage/seen_seen_maint"

    val audit = StreamDeltaDedupArrival.auditSeen(spark, seenDir)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(audit.nonEmpty && audit.forall(_._1.startsWith("_ibkt=")),
      s"seen-map must be _ibkt-partitioned: ${audit.toSeq}")
    assert(audit.exists(_._2 > 1),
      "a 3-batch run must crowd some bucket or the test is vacuous")

    val before = spark.read
      .schema("doc_id BIGINT, seen BIGINT, _ibkt INT").parquet(seenDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stats = StreamDeltaDedupArrival.compactSeen(spark, seenDir,
      maxFilesPerPartition = 1)
    assert(stats.nonEmpty && stats.forall(_.filesBefore > 1))
    assert(StreamDeltaDedupArrival.auditSeen(spark, seenDir)
      .collect().forall(_.getLong(2) == 1L))
    val after = spark.read
      .schema("doc_id BIGINT, seen BIGINT, _ibkt INT").parquet(seenDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before,
      "compact is layout-only — the seen-map rows (and therefore every " +
        "downstream keeper probe) must be identical")
  }

  test("N=3 id-ordered SEMANTIC replay equals the one-shot delta dedup " +
    "(x67 contract beyond two batches, on the real tables)") {
    import graft.operators.SemDedupIndex
    val d = sf("sf0.001")
    val stage = java.nio.file.Files.createTempDirectory("sem_n3")
    val streamed = StreamSemDedup.replayParquet(spark, d,
        stageDir = stage.toString, deltaMod = 10, bits = 4, tau = 0.30,
        queryName = "sem_n3", numBatches = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()

    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val idxDir = java.nio.file.Files.createTempDirectory("sem_ref").toString
    SemDedupIndex.buildOrthant(emb.where(col("vec_id") % 10 =!= 0),
      "vec_id", "embedding", bits = 4).save(idxDir)
    val oneShot = SemDedupIndex.load(spark, idxDir, "vec_id")
      .deltaDedup(emb.where(col("vec_id") % 10 === 0), "embedding",
        tau = 0.30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release()
    assert(streamed.nonEmpty && streamed == oneShot,
      "3-batch semantic keepers must equal the one-shot probe")
  }

  test("N=3 IVF ingest replay equals the 2-batch registered form and " +
    "the batch lifecycle (x68 contract: batch count must not matter)") {
    import graft.operators.IvfIndex
    val d = sf("sf0.001")
    def run(n: Int) = {
      val stage = java.nio.file.Files.createTempDirectory(s"ivf_n$n")
      val rows = StreamIvfIngest.replayParquet(spark, d,
          stageDir = stage.toString, deltaMod = 10, nlist = 8, k = 5,
          nprobe = 2, queryIdBound = 200L, queryName = s"ivf_n$n",
          numBatches = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      graft.Caches.release()
      rows
    }
    val n3 = run(3)
    assert(n3.nonEmpty && n3 == run(2),
      "route-on-fixed-cells appends must make the batch count invisible")

    // and the streamed fold ≡ the batched lifecycle (q261's shape with
    // the day-1 delta folded in ONE append)
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_batch").toString
    IvfIndex.buildSeeded(emb.where(col("vec_id") % 10 =!= 0
        && col("vec_id") % 10 =!= 1), "vec_id", "embedding", nlist = 8)
      .save(dir)
    IvfIndex.load(spark, dir, "vec_id")
      .append(emb.where(col("vec_id") % 10 === 1), "embedding", dir)
    IvfIndex.compact(spark, dir, maxFilesPerPartition = 1)
    val batched = IvfIndex.load(spark, dir, "vec_id")
      .search(emb.where(col("vec_id") % 10 === 0 && col("vec_id") < 200)
          .select(col("vec_id").as("query_id"), col("embedding")),
        "query_id", "embedding", k = 5, nprobe = 2)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.Caches.release()
    assert(n3 == batched, "streamed fold ≡ batched fold at search time")
  }

  test("the PRODUCTION KMeans router runs the live ingest loop: " +
    "streamed appendTagged ×3 ≡ one batch fold under the same saved " +
    "router, and a rebuild with the other family round-trips") {
    import graft.operators.IvfIndex
    val d = sf("sf0.001")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val base = emb.where(col("vec_id") % 10 =!= 0
      && col("vec_id") % 10 =!= 1)
    val day1 = emb.where(col("vec_id") % 10 === 1)
    val qs = emb.where(col("vec_id") % 10 === 0 && col("vec_id") < 200)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val dirA = java.nio.file.Files.createTempDirectory("km_live").toString
    val dirB = java.nio.file.Files.createTempDirectory("km_batch").toString

    // ONE router fit, saved to both dirs — the comparison isolates the
    // fold path (streamed vs batched), not KMeans refit determinism
    val built = IvfIndex.build(base, "vec_id", "embedding", nlist = 8)
    built.save(dirA)
    built.save(dirB)
    built.close()
    ReplayStage.sweepAppendMarkers(dirA)

    // streamed: 3 arrival-hash micro-batches, each load()ing the index
    // (the family-detection path round-18's stale-router bug hid in),
    // folding via appendTagged, then in-loop compaction
    StreamIvfIngest.streamFold(spark, dirA, day1, numBatches = 3,
      queryName = "km_live_loop")
    IvfIndex.compact(spark, dirA, maxFilesPerPartition = 1)
    // batched: the same delta in ONE append
    IvfIndex.load(spark, dirB, "vec_id").append(day1, "embedding", dirB)
    IvfIndex.compact(spark, dirB, maxFilesPerPartition = 1)

    val loadedA = IvfIndex.load(spark, dirA, "vec_id")
    assert(loadedA.router.isInstanceOf[IvfIndex.KMeansRouter],
      "per-batch load must detect the KMeans family")
    def cells(dir: String) = spark.read.parquet(s"$dir/corpus")
      .select(col("vec_id"), col("_cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(dirA) == cells(dirB),
      "streamed ×3 and batched ×1 folds must land every vector in the " +
        "same cell — appends route on the FIXED saved centroids")
    def searched(dir: String) = IvfIndex.load(spark, dir, "vec_id")
      .search(qs, "query_id", "embedding", k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(searched(dirA) == searched(dirB),
      "search over the streamed index ≡ search over the batched index")
    graft.Caches.release()

    // rebuild-with-other-family round trip THROUGH the live loop: run
    // the KMeans replay into a stage dir, then the seeded replay into
    // the SAME dir — each rebuild must clear the other family's
    // artifact or load serves stale centroids (the round-18 bug)
    val reuse = java.nio.file.Files
      .createTempDirectory("km_roundtrip").toString
    val viaKm = StreamIvfIngest.replayParquet(spark, d,
        stageDir = reuse, deltaMod = 10, nlist = 8, k = 5, nprobe = 2,
        queryIdBound = 200L, queryName = "km_replay", numBatches = 2,
        kmeansRouter = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaKm.nonEmpty)
    assert(IvfIndex.load(spark, s"$reuse/idx", "vec_id").router
      .isInstanceOf[IvfIndex.KMeansRouter])
    graft.Caches.release()
    val viaSeeded = StreamIvfIngest.replayParquet(spark, d,
        stageDir = reuse, deltaMod = 10, nlist = 8, k = 5, nprobe = 2,
        queryIdBound = 200L, queryName = "seeded_after_km", numBatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fresh = IvfIndex.load(spark, s"$reuse/idx", "vec_id")
    assert(fresh.router.isInstanceOf[IvfIndex.SeededRouter],
      "rebuilding seeded over a KMeans index must not leave the stale " +
        "family for load to prefer")
    assert(viaSeeded.nonEmpty)
    graft.Caches.release()
  }

  test("keeperForBatch is correct under foreachBatch REDELIVERY: with " +
    "the batch already folded into the index, keepers equal the " +
    "first-delivery run") {
    val d = sf("sf0.001")
    val docs = graft.sources.Tables.table(spark, d, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("redeliver").toString
    DedupIndex.build(corpus, "doc_id", "text",
      shingleK = 3, numBands = 4, rowsPerBand = 2, seed = 42L).save(dir)

    import spark.implicits._
    val emptySeen = Seq.empty[(Long, Long)].toDF("a", "_rs")
    val inBatch = batch.select(col("doc_id").as("a"), lit(1).as("_inb"))
    def keepers(idx: DedupIndex) = StreamDeltaDedupArrival.keeperForBatch(
        idx.deltaPairs(batch, "text", tauNum = 7, tauDenom = 10,
          maxBucket = Int.MaxValue, anyIndexedPartner = true),
        emptySeen, inBatch, batchId = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val first = keepers(DedupIndex.load(spark, dir, "doc_id"))
    graft.Caches.release()
    assert(first.nonEmpty, "fixture must produce keeper rows")
    // the crash window: the fold completed, the marker did not — the
    // redelivered batch now probes an index CONTAINING ITSELF, so
    // deltaPairs emits the batch's own copies as indexed partners
    // (any id, self-pairs included); the qualification filter must
    // discard exactly those
    DedupIndex.load(spark, dir, "doc_id")
      .appendTagged(batch, "text", dir, tag = "b0")
    val redelivered = keepers(DedupIndex.load(spark, dir, "doc_id"))
    graft.Caches.release()
    assert(redelivered == first,
      "redelivery keepers must equal first-delivery keepers — a " +
        "larger-id same-batch copy must never become keep_id")
  }

  test("appendTagged retry converges: re-running a batch fold leaves " +
    "exactly one copy in the index") {
    val d = sf("sf0.001")
    val docs = graft.sources.Tables.table(spark, d, "documents")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("tag_retry").toString
    DedupIndex.build(docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
      shingleK = 3, numBands = 4, rowsPerBand = 2, seed = 42L).save(dir)
    val idx = DedupIndex.load(spark, dir, "doc_id")
    val batch = docs.where(col("doc_id") % 5 === 0)

    idx.appendTagged(batch, "text", dir, tag = "b0")
    def snapshot() = (
      spark.read.parquet(s"$dir/bands")
        .groupBy().count().head().getLong(0),
      spark.read.parquet(s"$dir/docs")
        .groupBy().count().head().getLong(0))
    val once = snapshot()
    // the crash-before-marker window: the unit re-runs in full
    idx.appendTagged(batch, "text", dir, tag = "b0")
    assert(snapshot() == once,
      "a retried fold must sweep its previous attempt, not double-append")
    // a DIFFERENT tag is a new batch and must add rows
    idx.appendTagged(batch.limit(3), "text", dir, tag = "b1")
    assert(snapshot() != once, "a new tag appends for real")
    graft.Caches.release()
  }
}
