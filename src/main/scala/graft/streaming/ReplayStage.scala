package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}

import scala.jdk.CollectionConverters._

/** Shared staging for finite-file stream replays that need an explicit
  * end-of-stream watermark flush (the pattern StatefulSessions
  * introduced): a temp dir of symlinks to the real events parquet plus
  * ONE sentinel row (`user_id = -1`) dated `leadNs` past the global max
  * event time. The sentinel's only job is to advance the watermark past
  * every open window/session deadline so the final no-data batch emits
  * everything still buffered; consumers filter `user_id >= 0` AFTER the
  * stateful operator (a filter before it gets pushed below the
  * EventTimeWatermark node and un-advances the watermark).
  */
object ReplayStage {

  final case class Staged(dir: Path, schema: StructType, maxTsNanos: Long)

  /** Stage `dir/events.parquet` (file or directory of parts) for
    * streaming replay with a sentinel `leadNs` nanoseconds after the
    * max event time. The sentinel carries `ts` in the SAME physical
    * type as the source files so the explicit reader schema covers
    * both. */
  def stageEvents(spark: SparkSession, dir: String, leadNs: Long): Staged = {
    import spark.implicits._
    val src = s"$dir/events.parquet"
    val srcRaw = spark.read.parquet(src)
    val schema = srcRaw.schema
    val maxTsNanos = graft.sources.Tables.tsNanosNormalized(srcRaw)
      .agg(org.apache.spark.sql.functions.max("ts")).head().getLong(0)

    val replay = Files.createTempDirectory("graft_replay")
    val srcPath = Paths.get(src).toAbsolutePath
    val parts: Seq[Path] =
      if (Files.isDirectory(srcPath))
        Files.list(srcPath).iterator().asScala.toSeq
          .filter(_.getFileName.toString.endsWith(".parquet"))
      else Seq(srcPath)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.createSymbolicLink(replay.resolve(f"events_$i%04d.parquet"), p)
    }

    val sentinelTsNanos = maxTsNanos + leadNs
    val scratch = Files.createTempDirectory("graft_sentinel")
    val sentinelRaw =
      Seq((-1L, -1L, sentinelTsNanos)).toDF("user_id", "event_id", "ts")
    val sentinelDf = schema("ts").dataType match {
      case t @ (TimestampType | TimestampNTZType) =>
        sentinelRaw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)")
            .cast(t))
      case _ => sentinelRaw
    }
    sentinelDf.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val target = replay.resolve("zz_sentinel.parquet")
    Files.list(scratch).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .foreach(p => Files.move(p, target))
    Staged(replay, schema, maxTsNanos)
  }

  /** The staged dir as a streaming DataFrame (raw source schema; `ts`
    * normalized to BIGINT nanos). */
  def readStream(spark: SparkSession, staged: Staged,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(staged.schema)
      .option("pathGlobFilter", "*.parquet")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    graft.sources.Tables.tsNanosNormalized(reader.parquet(staged.dir.toString))
  }

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `statePartitions` (a stateful query's state-partition count is
    * fixed at first start; a bounded replay wants a handful, not the
    * session default — a production 24/7 stream would size the session
    * conf to the cluster and pass None). */
  def withStatePartitions[A](spark: SparkSession, statePartitions: Option[Int])
      (body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
