package graft.streaming

import java.nio.file.Files

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The ANN serving index's ingest loop live — new vectors arrive in
  * micro-batches and are folded into the persisted [[IvfIndex]] via
  * foreachBatch ([[IvfIndex.appendTagged]]: routed onto the FIXED cells
  * of the persisted router, no refit, retry-idempotent), then the
  * maintained index is compacted and searched. With x57 (minhash),
  * x67 (semantic cells) and this module, all THREE persisted indexes
  * run their append lifecycle inside the live loop.
  *
  * Exactness contract (q261's oracle, the IVF lifecycle's SECOND
  * construction): appends are route-on-fixed-cells, so the final corpus
  * is the same whatever the batch ORDER or COUNT — streamed ingest must
  * be indistinguishable from the one-shot 80% assignment at search
  * time. The batches are therefore staged by the ARRIVAL hash (id-
  * decorrelated, the x60 staging), the adversarial order for anything
  * order-sensitive; a hash match against q261's verbatim oracle proves
  * stream-fold ≡ batch-fold ≡ one-shot. Compaction between the last
  * fold and the search exercises the maintenance step in-loop. */
object StreamIvfIngest {

  /** Build+save a seeded index on the base corpus under `stageDir/idx`,
    * stream the day-1 delta through `numBatches` append-only
    * micro-batches, compact, then search `queries` at (k, nprobe). */
  def replayParquet(spark: SparkSession, dir: String, stageDir: String,
                    deltaMod: Int, nlist: Int, k: Int, nprobe: Int,
                    queryIdBound: Long,
                    queryName: String = "stream_ivf_ingest",
                    numBatches: Int = 2): DataFrame = {
    require(numBatches >= 1, s"numBatches=$numBatches")
    val emb = graft.sources.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = emb.where(col("vec_id") % deltaMod =!= 0
      && col("vec_id") % deltaMod =!= 1)
    val day1 = emb.where(col("vec_id") % deltaMod === 1)
    val idxDir = s"$stageDir/idx"

    IvfIndex.buildSeeded(base, "vec_id", "embedding", nlist = nlist)
      .save(idxDir)
    ReplayStage.sweepAppendMarkers(idxDir)

    // arrival-hash staging: order-decorrelated from ids on purpose —
    // the appends must not care
    val arrB = pmod(graft.functions.HashFns.md5Hash60(
      concat(lit("arr:"), col("vec_id").cast("string"))),
      lit(numBatches.toLong))
    val staged = Files.createTempDirectory("graft_ivf_ingest")
    try {
      (0 until numBatches).foreach { i =>
        ReplayStage.writePart(day1.where(arrB === i), staged,
          f"$i%02d_day.parquet", (i + 1) * 1000000L)
      }
      val stream = spark.readStream.schema(day1.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged.toString)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val idx = IvfIndex.load(spark, idxDir, "vec_id")
          ReplayStage.foldOncePerBatch(idxDir, batchId) {
            idx.appendTagged(batch, "embedding", idxDir, tag = s"b$batchId")
          }
          graft.Caches.release()
          ()
        }
        .trigger(Trigger.AvailableNow())
        .queryName(queryName)
        .start()
      q.awaitTermination()
    } finally ReplayStage.cleanupStaged(staged)
    IvfIndex.compact(spark, idxDir, maxFilesPerPartition = 1)
    IvfIndex.load(spark, idxDir, "vec_id")
      .search(emb.where(col("vec_id") % deltaMod === 0
            && col("vec_id") < queryIdBound)
          .select(col("vec_id").as("query_id"), col("embedding")),
        "query_id", "embedding", k = k, nprobe = nprobe)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"))
  }
}
