package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Maintenance primitives for any hive-partitioned parquet table the
  * engine appends to in place — the shared machinery behind
  * [[graft.operators.DedupIndex.compact]]/`audit`,
  * [[graft.operators.SemDedupIndex.compact]]/`audit` and
  * [[graft.operators.IvfIndex.compact]]/`audit`: every
  * `mode("append")` fold adds part files inside existing partition
  * directories, so LISTING cost at read time grows with append count
  * (not data size) until crowded partitions are rewritten.
  *
  * A "table" here is `(name, rootDir, depth)` — depth is the number of
  * key=value directory levels (DedupIndex bands = 2, docs = 1,
  * SemDedupIndex corpus = 1, IvfIndex corpus = 1). All listings are
  * driver-side and bounded by the table's CONFIG partition counts,
  * never by row counts.
  *
  * All I/O goes through the Hadoop [[FileSystem]] resolved from the
  * table root's own URI (`file://` paths and bare local paths use the
  * local FS; `hdfs://`/`s3a://` roots use their scheme's FS), so the
  * maintenance layer runs wherever the index itself was saved — the
  * 100-TB posture is a deployment fact, not a POSIX assumption. A root
  * that does not exist or is not a directory fails loudly instead of
  * returning an empty "healthy" report.
  *
  * Crash safety: [[compact]]'s swap is manifest-guarded. Before any
  * compacted file enters a partition directory, a `_compact_manifest_*`
  * file is atomically published (write-to-tmp + rename) recording the
  * files the swap adds and the files it replaces; the manifest is
  * deleted only after the replaced parts are gone. A process death at
  * ANY point leaves a state [[recover]] (run automatically at the start
  * of every compact) resolves: all added files present → finish the
  * swap (delete the replaced parts); any added file missing → roll back
  * (delete the partial adds; the originals are intact). Duplicated rows
  * can therefore never silently survive a re-compact — the failure mode
  * the pre-manifest move-then-delete ordering allowed. */
object PartitionMaintenance {

  /** One [[compact]] decision per rewritten partition directory. */
  final case class CompactStats(table: String, partition: String,
                                filesBefore: Int, filesAfter: Int)

  /** Default compacted-file size target: a partition holding more bytes
    * than this is rewritten into `ceil(bytes / target)` files so a hot
    * partition never serializes through ONE task and ONE file. */
  val DefaultTargetBytesPerFile: Long = 128L * 1024 * 1024

  private val ManifestPrefix = "_compact_manifest_"
  private val ScratchPrefix = ".compact_tmp_"

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(p))
  }

  private def listStatus(fs: FileSystem, p: Path): Seq[FileStatus] =
    fs.listStatus(p).toSeq.sortBy(_.getPath.getName)

  private def partFiles(fs: FileSystem, dir: Path): Seq[FileStatus] =
    listStatus(fs, dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") &&
        !n.startsWith(".") && !n.startsWith("_")
    }

  /** Leaf key=value partition directories of a table root, `depth`
    * levels down. The root must exist and be a directory — a wrong or
    * remote-unreachable path must fail the maintenance job loudly, not
    * report zero partitions as if the table were healthy. */
  private def leafPartitions(fs: FileSystem, name: String, tableDir: Path,
                             depth: Int): Seq[Path] = {
    require(fs.exists(tableDir) && fs.getFileStatus(tableDir).isDirectory,
      s"maintenance: table '$name' root $tableDir does not exist or is " +
        "not a directory — refusing to report an empty (healthy-looking) " +
        "listing for a path that cannot be the table")
    def dirs(p: Path): Seq[Path] = listStatus(fs, p)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath)
    (1 until depth).foldLeft(dirs(tableDir))((acc, _) => acc.flatMap(dirs))
  }

  private def relative(root: Path, leaf: Path): String =
    leaf.toUri.getPath.stripPrefix(root.toUri.getPath).stripPrefix("/")

  // ---- manifest-guarded swap --------------------------------------

  private def writeManifest(fs: FileSystem, leaf: Path,
                            adds: Seq[String], dels: Seq[String]): Path = {
    val manifest = new Path(leaf,
      s"$ManifestPrefix${java.util.UUID.randomUUID()}")
    val tmp = new Path(leaf, manifest.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((adds.map("add:" + _) ++ dels.map("del:" + _))
      .mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // atomic publish: a half-written manifest must never be read as a
    // complete one (recovery acting on a truncated del-list would leave
    // the unlisted originals duplicated forever)
    require(fs.rename(tmp, manifest),
      s"compact: could not publish manifest $manifest")
    manifest
  }

  private def readManifest(fs: FileSystem,
                           manifest: Path): (Seq[String], Seq[String]) = {
    val in = fs.open(manifest)
    val text =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    (lines.collect { case l if l.startsWith("add:") => l.drop(4) },
      lines.collect { case l if l.startsWith("del:") => l.drop(4) })
  }

  /** Resolve any interrupted swap in `leaf`: finish it when every added
    * file landed, roll it back when the adds are partial, and sweep
    * `.tmp` manifest remnants plus orphaned scratch dirs. Idempotent;
    * called automatically per partition by [[compact]]. */
  private def recoverLeaf(fs: FileSystem, leaf: Path): Unit = {
    listStatus(fs, leaf).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(ManifestPrefix) && n.endsWith(".tmp")) {
        // unpublished manifest: the swap never started — nothing was
        // added to the partition yet
        fs.delete(st.getPath, false); ()
      } else if (n.startsWith(ScratchPrefix) && st.isDirectory) {
        // scratch from a run that died before (or during) the swap; the
        // manifest decides the swap's fate, the scratch is always dead
        fs.delete(st.getPath, true); ()
      } else if (n.startsWith(ManifestPrefix)) {
        val (adds, dels) = readManifest(fs, st.getPath)
        if (adds.forall(a => fs.exists(new Path(leaf, a)))) {
          // swap complete on the add side: finish the delete side so the
          // replaced rows do not coexist with their compacted copy
          dels.foreach(dl => fs.delete(new Path(leaf, dl), false))
        } else {
          // partial add: roll back — the originals are all still here
          adds.foreach(a => fs.delete(new Path(leaf, a), false))
        }
        fs.delete(st.getPath, false); ()
      }
    }
  }

  /** IDEMPOTENT tagged append for a hive-partitioned table: publish the
    * staged partitioned write at `stagedDir` (same partitionBy layout,
    * `depth` key=value levels) into the live table at `tableDir`, every
    * published file named `ingest-<tag>-…`. A PREVIOUS publish of the
    * same tag — complete or cut short by a crash — is swept first (the
    * deterministic name prefix makes old copies findable), so re-running
    * the unit after any failure converges to exactly one copy of the
    * batch: the retry-safety a `foreachBatch` index append needs, where
    * a marker written after a completed `mode("append")` leaves a crash
    * window that double-appends (the round-17 advice item). Driver-side
    * work is bounded by the table's CONFIG partition count. The staged
    * dir is consumed (deleted) on success. */
  def publishTagged(spark: SparkSession, stagedDir: String,
                    tableDir: String, depth: Int, tag: String): Unit = {
    require(tag.nonEmpty && !tag.exists(c => c == '/' || c == '-'),
      s"publishTagged: tag must be path-safe and dash-free: '$tag'")
    val (fs, root) = fsFor(spark, tableDir)
    val (sfs, staged) = fsFor(spark, stagedDir)
    require(fs.getUri == sfs.getUri,
      s"publishTagged: staging $staged must live on the table's " +
        s"FileSystem ${fs.getUri} so the publish is a rename, not a copy")
    // completion marker at the TABLE ROOT (compact never touches the
    // root, only partition dirs): once it exists, the unit is durably
    // done and a retry is a pure no-op — crucially, this stays true
    // even after a later compact folds the ingest-<tag> files into
    // compacted-* names, where the sweep-by-prefix below would find
    // nothing and a markerless retry would re-append the whole batch.
    // The residual window (publish complete, marker not yet written,
    // compact runs, THEN the retry arrives) falls under compact's
    // documented quiescence requirement.
    val published = new Path(root, s"_published_$tag")
    if (fs.exists(published)) {
      fs.delete(staged, true) // consume the re-staged copy
      return
    }
    val prefix = s"ingest-$tag-"
    // sweep: any file from a previous INCOMPLETE attempt at THIS tag
    leafPartitions(fs, "publish", root, depth).foreach { leaf =>
      partFiles(fs, leaf).filter(_.getPath.getName.startsWith(prefix))
        .foreach(st => fs.delete(st.getPath, false))
    }
    // publish: move staged parts under deterministic tag names, creating
    // partition dirs the table has not seen yet (new band keys / cells)
    leafPartitions(fs, "staged", staged, depth).foreach { sl =>
      val rel = relative(staged, sl)
      val dst = new Path(root, rel)
      fs.mkdirs(dst)
      partFiles(fs, sl).zipWithIndex.foreach { case (st, i) =>
        require(fs.rename(st.getPath,
          new Path(dst, f"$prefix$i%05d.parquet")),
          s"publishTagged: could not move ${st.getPath} into $dst")
      }
    }
    fs.create(published, true).close()
    fs.delete(staged, true)
    ()
  }

  /** One row per partition directory: (table, partition, files, bytes)
    * — the number a maintenance job alarms on is `files`. An
    * interrupted compact swap surfaces here too: its duplicate copies
    * are counted (the partition reads over-threshold, and the next
    * [[compact]] recovers it first). */
  def audit(spark: SparkSession,
            tables: Seq[(String, String, Int)]): DataFrame = {
    import spark.implicits._
    val rows = tables.flatMap { case (name, dir, depth) =>
      val (fs, root) = fsFor(spark, dir)
      leafPartitions(fs, name, root, depth).map { leaf =>
        val pf = partFiles(fs, leaf)
        (name, relative(root, leaf), pf.size.toLong, pf.map(_.getLen).sum)
      }
    }
    rows.toDF("table", "partition", "files", "bytes")
  }

  /** Rewrite partitions whose part-file count exceeds
    * `maxFilesPerPartition` — strictly O(touched): only crowded
    * partition directories are read and rewritten (each is a
    * self-contained parquet dir; the partition values live in the
    * directory name, so a rewrite cannot change any row);
    * under-threshold partitions are not even opened. Output file count
    * is SIZE-AWARE: `ceil(partitionBytes / targetBytesPerFile)` files
    * (≥ 1), so a hot partition is not funneled through one task and one
    * giant file at scale. The swap itself is manifest-guarded (see the
    * object doc): a crash at any point is resolved by the recovery pass
    * the next compact runs — duplicates can never become permanent.
    * Like any non-transactional table rewrite, run quiesced or behind a
    * table-format transaction in production. */
  def compact(spark: SparkSession, tables: Seq[(String, String, Int)],
              maxFilesPerPartition: Int,
              targetBytesPerFile: Long = DefaultTargetBytesPerFile)
      : Seq[CompactStats] = {
    require(maxFilesPerPartition >= 1,
      s"compact: maxFilesPerPartition=$maxFilesPerPartition")
    require(targetBytesPerFile >= 1,
      s"compact: targetBytesPerFile=$targetBytesPerFile")
    tables.flatMap { case (name, dir, depth) =>
      val (fs, root) = fsFor(spark, dir)
      leafPartitions(fs, name, root, depth).flatMap { leaf =>
        recoverLeaf(fs, leaf)
        val before = partFiles(fs, leaf)
        val bytes = before.map(_.getLen).sum
        val nOut = math.max(1L,
          (bytes + targetBytesPerFile - 1) / targetBytesPerFile).toInt
        // skip when the partition is already at (or under) its OPTIMAL
        // file count: a partition whose byte-targeted output count
        // exceeds maxFilesPerPartition would otherwise be fully
        // rewritten on EVERY maintenance run while never getting
        // "better" — the alarm threshold and the layout target are
        // different numbers, and the rewrite trigger must respect both
        if (before.size <= math.max(maxFilesPerPartition, nOut)) None
        else {
          // scratch INSIDE the leaf (dot-prefixed: invisible to Spark
          // listings and to partFiles) — same FileSystem, so the swap
          // move below is a rename, never a copy
          val scratch = new Path(leaf,
            s"$ScratchPrefix${java.util.UUID.randomUUID()}")
          // coalesce, not repartition: caps the output file count
          // without shuffling; reading `bytes` worth of parquet yields
          // ≥ nOut input splits at any sane maxPartitionBytes, and if
          // it yields fewer the partition was small enough for fewer
          spark.read.parquet(leaf.toString).coalesce(nOut)
            .write.mode("overwrite").parquet(scratch.toString)
          val compactedSrc = listStatus(fs, scratch)
            .filter(st => st.isFile &&
              st.getPath.getName.endsWith(".parquet"))
          require(compactedSrc.nonEmpty,
            s"compact: no part written for $leaf")
          val swapId = java.util.UUID.randomUUID()
          val adds = compactedSrc.zipWithIndex.map { case (_, i) =>
            f"compacted-$swapId-part$i%05d.parquet"
          }
          // manifest FIRST (atomically published), then adds, then
          // deletes, then the manifest itself — every crash point is
          // recoverable (see recoverLeaf)
          val manifest = writeManifest(fs, leaf, adds,
            before.map(_.getPath.getName))
          compactedSrc.zip(adds).foreach { case (src, add) =>
            require(fs.rename(src.getPath, new Path(leaf, add)),
              s"compact: could not move ${src.getPath} into $leaf")
          }
          before.foreach(st => fs.delete(st.getPath, false))
          fs.delete(manifest, false)
          fs.delete(scratch, true)
          Some(CompactStats(name, relative(root, leaf),
            before.size, adds.size))
        }
      }
    }
  }
}
