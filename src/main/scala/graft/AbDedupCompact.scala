package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B artifact main for [[graft.operators.DedupIndex.compact]]: builds
  * the corpus index, folds a delta in as MANY append generations (the
  * daily cadence), then times the SAME probe against the fragmented
  * index and the compacted one — the measured form of "probe listing
  * cost grows with append count, compact makes it flat". Emits one JSON
  * line (and writes it to SPARK_GRAFT_BENCH_OUT) with the per-table
  * part-file totals before/after and the median probe seconds
  * before/after. Run via scripts/jrun.sh graft.AbDedupCompact.
  */
object AbDedupCompact {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val appends = sys.env.getOrElse("SPARK_GRAFT_AB_APPENDS", "12").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("ab_dedup_compact")
      .toString
    val corpus = docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1)
    val probe = docs.where(col("doc_id") % 5 === 0)

    graft.operators.DedupIndex.build(corpus, "doc_id", "text").save(dir)
    val idx = graft.operators.DedupIndex.load(spark, dir, "doc_id")
    // the %5=1 delta in `appends` slices: slice k is doc_id % (5*appends)
    // == 5k+1 — together exactly the day-1 delta, arriving day by day
    (0 until appends).foreach { k =>
      idx.append(docs.where(
        col("doc_id") % (5L * appends) === (5L * k + 1L)), "text", dir)
      ()
    }

    def files(): Map[String, Long] =
      graft.operators.DedupIndex.audit(spark, dir)
        .groupBy(col("table")).agg(sum(col("files")).as("f"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def probeSec(): Double = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.DedupIndex.load(spark, dir, "doc_id")
          .deltaDedup(probe, "text")
          .write.format("noop").mode("overwrite").save()
        graft.Caches.release()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      if (ts.size % 2 == 1) ts(ts.size / 2)
      else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
    }

    val filesBefore = files()
    val secBefore = probeSec()
    val stats = graft.operators.DedupIndex.compact(spark, dir,
      maxFilesPerPartition = 1)
    val filesAfter = files()
    val secAfter = probeSec()

    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val json =
      s"""{"metric":"dedup_index_compact_ab","sf":"$sfDir",""" +
        s""""appends":$appends,"iters":$iters,""" +
        s""""files_before":{"bands":${filesBefore.getOrElse("bands", 0L)},""" +
        s""""docs":${filesBefore.getOrElse("docs", 0L)}},""" +
        s""""files_after":{"bands":${filesAfter.getOrElse("bands", 0L)},""" +
        s""""docs":${filesAfter.getOrElse("docs", 0L)}},""" +
        s""""partitions_compacted":${stats.size},""" +
        s""""probe_sec_before":${fmt(secBefore)},""" +
        s""""probe_sec_after":${fmt(secAfter)}}"""
    println(json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
    spark.stop()
  }
}
