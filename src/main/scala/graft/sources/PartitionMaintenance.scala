package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Maintenance primitives for any hive-partitioned parquet table the
  * engine appends to in place — the shared machinery behind
  * [[graft.operators.DedupIndex.compact]]/`audit` and
  * [[graft.operators.SemDedupIndex.compact]]/`audit`: every
  * `mode("append")` fold adds part files inside existing partition
  * directories, so LISTING cost at read time grows with append count
  * (not data size) until crowded partitions are rewritten.
  *
  * A "table" here is `(name, rootDir, depth)` — depth is the number of
  * key=value directory levels (DedupIndex bands = 2, docs = 1,
  * SemDedupIndex corpus = 1). All listings are driver-side and bounded
  * by the table's CONFIG partition counts, never by row counts. */
object PartitionMaintenance {

  /** One [[compact]] decision per rewritten partition directory. */
  final case class CompactStats(table: String, partition: String,
                                filesBefore: Int, filesAfter: Int)

  private def listPaths(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(p)
    try {
      val b = Seq.newBuilder[java.nio.file.Path]
      val it = s.iterator(); while (it.hasNext) b += it.next()
      b.result().sortBy(_.getFileName.toString)
    } finally s.close()
  }

  private def partFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] =
    listPaths(dir).filter { p =>
      val n = p.getFileName.toString
      n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
    }

  /** Leaf key=value partition directories of a table root, `depth`
    * levels down. */
  private def leafPartitions(tableDir: java.nio.file.Path,
                             depth: Int): Seq[java.nio.file.Path] = {
    def dirs(p: java.nio.file.Path) = listPaths(p).filter(d =>
      java.nio.file.Files.isDirectory(d) &&
        d.getFileName.toString.contains("="))
    if (!java.nio.file.Files.isDirectory(tableDir)) Seq.empty
    else (1 until depth).foldLeft(dirs(tableDir))((acc, _) => acc.flatMap(dirs))
  }

  /** One row per partition directory: (table, partition, files, bytes)
    * — the number a maintenance job alarms on is `files`. */
  def audit(spark: SparkSession,
            tables: Seq[(String, String, Int)]): DataFrame = {
    import spark.implicits._
    val rows = tables.flatMap { case (name, dir, depth) =>
      val root = java.nio.file.Paths.get(dir)
      leafPartitions(root, depth).map { leaf =>
        val pf = partFiles(leaf)
        (name, root.relativize(leaf).toString, pf.size.toLong,
          pf.map(p => java.nio.file.Files.size(p)).sum)
      }
    }
    rows.toDF("table", "partition", "files", "bytes")
  }

  /** Rewrite partitions whose part-file count exceeds
    * `maxFilesPerPartition` down to ONE file each — strictly
    * O(touched): only crowded partition directories are read and
    * rewritten (each is a self-contained parquet dir; the partition
    * values live in the directory name, so a rewrite cannot change any
    * row); under-threshold partitions are not even opened. Swap order
    * is commit-by-rename (move the compacted file in, then delete the
    * replaced parts) — like any non-transactional table rewrite, run
    * quiesced or behind a table-format transaction in production. */
  def compact(spark: SparkSession, tables: Seq[(String, String, Int)],
              maxFilesPerPartition: Int): Seq[CompactStats] = {
    require(maxFilesPerPartition >= 1,
      s"compact: maxFilesPerPartition=$maxFilesPerPartition")
    tables.flatMap { case (name, dir, depth) =>
      val root = java.nio.file.Paths.get(dir)
      leafPartitions(root, depth).flatMap { leaf =>
        val before = partFiles(leaf)
        if (before.size <= maxFilesPerPartition) None
        else {
          val scratch =
            java.nio.file.Files.createTempDirectory("graft_compact")
          spark.read.parquet(leaf.toString)
            .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
          val compacted = listPaths(scratch)
            .find(_.getFileName.toString.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException(
              s"compact: no part written for $leaf"))
          val dst = leaf.resolve(
            s"compacted-${java.util.UUID.randomUUID()}.parquet")
          java.nio.file.Files.move(compacted, dst)
          before.foreach(java.nio.file.Files.deleteIfExists(_))
          listPaths(scratch).foreach(java.nio.file.Files.deleteIfExists(_))
          java.nio.file.Files.deleteIfExists(scratch)
          Some(CompactStats(name, root.relativize(leaf).toString,
            before.size, 1))
        }
      }
    }
  }
}
