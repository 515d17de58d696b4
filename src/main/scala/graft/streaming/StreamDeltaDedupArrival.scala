package graft.streaming

import java.nio.file.{Files, Paths}

import graft.operators.DedupIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The ingest-dedup loop under the EARLIEST-SEEN keeper contract —
  * [[StreamDeltaDedup]] (x57) without its id-ordered-staging caveat.
  *
  * x57's exactness leans on batches arriving in id order (so "keeper =
  * min id" distributes over batches). A production ingest arrives in
  * EVENT-TIME order, where a later batch can carry a smaller id; the
  * production semantics there is "keep the copy seen FIRST": keeper(d)
  * = the partner minimizing (batch, id) lexicographically among d's
  * confirmed duplicates seen no later than d (corpus docs rank batch
  * −1; within a batch, smaller id = earlier). This module implements
  * that contract and its oracle reproduces it as a plain batch
  * `min_by(partner, (rank, id))` — removing the caveat by changing the
  * CONTRACT to the arrival-robust one rather than constraining the
  * staging.
  *
  * Mechanics per micro-batch k: probe the persisted index for verified
  * PAIRS ([[DedupIndex.deltaPairs]] with `anyIndexedPartner = true` —
  * an indexed partner was seen strictly earlier whatever its id), rank
  * each partner (in-batch → k, in the seen-map → its recorded batch,
  * else −1 = corpus), take the struct-min partner per doc, then append
  * the batch to the index AND to the seen-map (both marker-guarded,
  * idempotent under foreachBatch retries; keeper rows land in
  * batchId-named subdirs with overwrite). The seen-map is a parquet
  * (doc_id, seen) table appended O(batch) per batch — the only state
  * beyond the index itself, and like the index it is durable and
  * executor-resident; nothing data-proportional touches the driver.
  *
  * The delta is staged as two ARRIVAL-ordered parts keyed by a portable
  * hash (`md5('arr:' || doc_id) % 2` — the documents table carries no
  * event time, and a hash decorrelates batch order from id order, which
  * is exactly what makes the contract non-vacuous: at sf0.01 seven of
  * the hundred delta keepers differ from the id-ordered contract's).
  * Runs UNCAPPED like x57 (a bucket cap is prefix-dependent across
  * batches). */
object StreamDeltaDedupArrival {

  /** Build+save the corpus index under `stageDir/idx`, stream the delta
    * through probe-then-append in two arrival-ordered micro-batches,
    * return one (doc_id, keep_id) row per delta doc under the
    * earliest-seen contract. */
  def replayParquet(spark: SparkSession, dir: String, stageDir: String,
                    deltaMod: Int, shingleK: Int, numBands: Int,
                    rowsPerBand: Int, seed: Long, tauNum: Int, tauDenom: Int,
                    queryName: String = "stream_delta_dedup_arrival")
      : DataFrame = {
    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(col("doc_id") % deltaMod =!= 0)
    val delta = docs.where(col("doc_id") % deltaMod === 0)
    val idxDir = s"$stageDir/idx"
    val outDir = s"$stageDir/out_$queryName"
    val seenDir = s"$stageDir/seen_$queryName"

    def deleteRec(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val s = Files.list(p)
        try { val it = s.iterator(); while (it.hasNext) deleteRec(it.next()) }
        finally s.close()
      }
      Files.deleteIfExists(p); ()
    }
    // fresh sinks per run (multi-pass bench discipline, see x57)
    deleteRec(Paths.get(outDir))
    deleteRec(Paths.get(seenDir))

    DedupIndex.build(corpus, "doc_id", "text",
      shingleK = shingleK, numBands = numBands, rowsPerBand = rowsPerBand,
      seed = seed, sqlMirroredHashes = true).save(idxDir)
    if (Files.isDirectory(Paths.get(idxDir))) {
      val s = Files.list(Paths.get(idxDir))
      try {
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.startsWith("_appended_"))
            Files.deleteIfExists(p)
        }
      } finally s.close()
    }
    // empty seen-map so batch 0's read has a table to miss against
    spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, seen BIGINT"))
      .write.mode("overwrite").parquet(seenDir)

    // arrival key: portable hash, deliberately DECORRELATED from ids
    val arrB = pmod(graft.functions.HashFns.md5Hash60(
      concat(lit("arr:"), col("doc_id").cast("string"))), lit(2L))
    val staged = Files.createTempDirectory("graft_ingest_arrival")
    try {
      ReplayStage.writePart(delta.where(arrB === 0), staged,
        "00_day1.parquet", 1000000L)
      ReplayStage.writePart(delta.where(arrB === 1), staged,
        "01_day2.parquet", 2000000L)

      val stream = spark.readStream.schema(delta.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged.toString)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val idx = DedupIndex.load(spark, idxDir, "doc_id")
          val pairs = idx.deltaPairs(batch, "text", tauNum = tauNum,
            tauDenom = tauDenom, maxBucket = Int.MaxValue,
            anyIndexedPartner = true)
          val seen = spark.read
            .schema("doc_id BIGINT, seen BIGINT").parquet(seenDir)
            .select(col("doc_id").as("a"), col("seen").as("_rs"))
          val inBatch = batch.select(col("doc_id").as("a"),
            lit(1).as("_inb"))
          // partner rank: this batch → k; an earlier batch → its seen
          // entry; the corpus → −1. All three are strictly ≤ k, and
          // within-batch pairs carry a < b, so every pair qualifies
          // under (rank, id) < (k, b) — the keeper is the struct-min.
          val keep = pairs
            .join(seen, Seq("a"), "left")
            .join(inBatch, Seq("a"), "left")
            .withColumn("_ra", when(col("_inb").isNotNull, lit(batchId))
              .otherwise(coalesce(col("_rs"), lit(-1L))))
            .groupBy(col("b"))
            .agg(min(struct(col("_ra"), col("a"))).as("_m"))
            .select(col("b").as("doc_id"), col("_m.a").as("keep_id"))
          batch.select(col("doc_id"))
            .join(keep, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("keep_id"), col("doc_id")).as("keep_id"))
            .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
          val marker = Paths.get(idxDir, s"_appended_$batchId")
          if (!Files.exists(marker)) {
            idx.append(batch, "text", idxDir)
            batch.select(col("doc_id"), lit(batchId).as("seen"))
              .write.mode("append").parquet(seenDir)
            Files.createFile(marker)
          }
          graft.Caches.release()
          ()
        }
        .trigger(Trigger.AvailableNow())
        .queryName(queryName)
        .start()
      q.awaitTermination()
    } finally {
      val s = Files.list(staged)
      try s.iterator().forEachRemaining(p => Files.deleteIfExists(p))
      finally s.close()
      Files.deleteIfExists(staged)
      ()
    }
    spark.read.schema("doc_id BIGINT, keep_id BIGINT")
      .option("recursiveFileLookup", "true")
      .parquet(outDir)
      .select(col("doc_id"), col("keep_id"))
  }
}
