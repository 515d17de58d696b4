package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The maintenance layer's deployment contract: audit/compact run
  * through the Hadoop [[org.apache.hadoop.fs.FileSystem]] resolved from
  * the table root's own URI (an explicit `file://` handle must
  * reproduce the bare-path results row for row), a wrong root fails
  * loudly instead of reporting a healthy-looking empty listing, compact
  * splits oversized partitions by a byte target instead of funneling
  * them through one file, and an interrupted manifest-guarded swap is
  * recovered — forward when every added file landed, backward when the
  * adds are partial — so duplicate rows can never survive a
  * re-compact. */
class PartitionMaintenanceSpec extends SparkSpec {

  /** A one-level hive table with `parts` append generations in each of
    * two k= partitions; returns (root, rows per partition). */
  private def fixture(parts: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pm_fix").toString
    (0 until parts).foreach { g =>
      (0 until 10).map(i => (g * 10L + i, i % 2))
        .toDF("id", "k")
        .repartition(1)
        .write.mode("append").partitionBy("k").parquet(dir)
    }
    dir
  }

  private def tables(dir: String) = Seq(("t", dir, 1))

  test("a file:// Hadoop handle reproduces the bare-path audit " +
    "path-for-path and compact behaves identically through it") {
    val dir = fixture(parts = 3)
    val bare = PartitionMaintenance.audit(spark, tables(dir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val viaFs = PartitionMaintenance.audit(spark, Seq(("t", s"file://$dir", 1)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(bare == viaFs,
      s"file:// audit must equal the bare-path audit: $bare vs $viaFs")
    assert(bare.forall(_._3 == 3L), "fixture: 3 append generations each")

    val before = spark.read.parquet(dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    val stats = PartitionMaintenance.compact(spark,
      Seq(("t", s"file://$dir", 1)), maxFilesPerPartition = 1)
    assert(stats.size == 2 && stats.forall(s =>
      s.filesBefore == 3 && s.filesAfter == 1), s"stats: $stats")
    val after = spark.read.parquet(dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(after == before, "compact through file:// must not change rows")
    assert(PartitionMaintenance.audit(spark, tables(dir))
      .collect().forall(_.getLong(2) == 1L))
  }

  test("a missing table root fails loudly instead of auditing empty") {
    val gone = "/tmp/definitely_not_a_graft_table_" +
      java.util.UUID.randomUUID()
    val e = intercept[IllegalArgumentException] {
      PartitionMaintenance.audit(spark, Seq(("t", gone, 1))).collect()
    }
    assert(e.getMessage.contains("does not exist"))
    intercept[IllegalArgumentException] {
      PartitionMaintenance.compact(spark, Seq(("t", gone, 1)), 1)
    }
    ()
  }

  test("compact is size-aware: a partition above the byte target is " +
    "rewritten into multiple files, none above ~target each") {
    val dir = fixture(parts = 4)
    val bytes = PartitionMaintenance.audit(spark, tables(dir))
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    // a target of half the partition size → optimal layout = 2 files
    // (> 1, < the 4 on disk, so the rewrite both triggers and splits)
    val target = bytes.values.max / 2
    val stats = PartitionMaintenance.compact(spark, tables(dir),
      maxFilesPerPartition = 1, targetBytesPerFile = target)
    assert(stats.size == 2 && stats.forall(s =>
      s.filesBefore == 4 && s.filesAfter > 1),
      s"an over-target partition must split into multiple files: $stats")
    val audit = PartitionMaintenance.audit(spark, tables(dir))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    stats.foreach(s => assert(audit(s.partition) == s.filesAfter.toLong,
      s"reported filesAfter must match the on-disk listing: $s"))
    assert(spark.read.parquet(dir).count() == 40L)
    // already-optimal layouts are NOT perpetually rewritten: with a
    // tiny byte target the optimal count exceeds what's on disk, so the
    // skip threshold (max of the alarm count and the byte-targeted
    // count) must leave the partition alone instead of rewriting the
    // same bytes on every maintenance run
    val again = PartitionMaintenance.compact(spark, tables(dir),
      maxFilesPerPartition = 1, targetBytesPerFile = 1L)
    assert(again.isEmpty,
      s"an at-or-under-optimal partition must not be rewritten: $again")
  }

  test("an interrupted swap with all adds landed is rolled FORWARD: " +
    "the replaced originals are deleted, rows deduplicate") {
    import org.apache.hadoop.fs.Path
    val dir = fixture(parts = 2)
    val leaf = new java.io.File(dir, "k=0")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val originals = leaf.listFiles().filter(f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    // simulate the crash window: the compacted copy moved in, originals
    // NOT yet deleted, manifest still present
    val addName = "compacted-crash-part00000.parquet"
    java.nio.file.Files.copy(originals.head.toPath,
      new java.io.File(leaf, addName).toPath)
    val manifest = new java.io.File(leaf, "_compact_manifest_crash")
    java.nio.file.Files.write(manifest.toPath,
      (s"add:$addName\n" + s"del:${originals.head.getName}\n").getBytes)
    // the partition now double-counts the first original's rows
    assert(spark.read.parquet(dir).count() == 25L)

    val stats = PartitionMaintenance.compact(spark, tables(dir),
      maxFilesPerPartition = 1)
    assert(!manifest.exists, "recovery must consume the manifest")
    assert(spark.read.parquet(dir).count() == 20L,
      "the replaced original must be gone — duplicates must not be " +
        "rewritten into the compacted file")
    assert(spark.read.parquet(dir).select(col("id")).distinct().count() == 20L)
    assert(stats.forall(_.filesAfter == 1))
    assert(!fs.exists(new Path(s"$dir/k=0/${originals.head.getName}")))
  }

  test("depth-2 (bands-layout) tables compact through file:// too, " +
    "manifest-guarded, with partitions preserved") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pm_d2").toString
    (0 until 3).foreach { g =>
      (0 until 12).map(i => (g * 12L + i, i % 2, i % 3))
        .toDF("id", "a", "b")
        .repartition(1)
        .write.mode("append").partitionBy("a", "b").parquet(dir)
    }
    val t = Seq(("t2", s"file://$dir", 2))
    val before = PartitionMaintenance.audit(spark, t)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(before.size == 6 && before.values.forall(_ == 3L),
      s"fixture: 2x3 leaves, 3 generations each: $before")
    val rows = spark.read.parquet(dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq

    val stats = PartitionMaintenance.compact(spark, t,
      maxFilesPerPartition = 1)
    assert(stats.size == 6 && stats.forall(s =>
      s.filesBefore == 3 && s.filesAfter == 1 &&
        s.partition.count(_ == '/') == 1), s"stats: $stats")
    val after = PartitionMaintenance.audit(spark, t)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(after.keySet == before.keySet && after.values.forall(_ == 1L))
    assert(spark.read.parquet(dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == rows,
      "depth-2 compact must not change a row")
  }

  test("publishTagged sweeps an orphaned partial publish of the same " +
    "tag before republishing — the retry converges from any state") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("pm_pub").toString
    (0 until 10).map(i => (i.toLong, i % 2)).toDF("id", "k")
      .repartition(1).write.mode("overwrite").partitionBy("k").parquet(table)
    // a previous attempt's orphan under the SAME tag, in a partition
    // the retry's staged write also touches
    val leaf = new java.io.File(table, "k=0")
    val orphanSrc = leaf.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(orphanSrc.toPath,
      new java.io.File(leaf, "ingest-bx-99999.parquet").toPath)
    assert(spark.read.parquet(table).count() == 15L, "orphan doubles k=0")

    val staging = java.nio.file.Files.createTempDirectory("pm_stage").toString
    (10 until 14).map(i => (i.toLong, i % 2)).toDF("id", "k")
      .repartition(1).write.mode("overwrite").partitionBy("k")
      .parquet(staging)
    PartitionMaintenance.publishTagged(spark, staging, table,
      depth = 1, tag = "bx")
    val ids = spark.read.parquet(table).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 14L),
      s"orphan swept + staged batch published exactly once: $ids")
    assert(!new java.io.File(staging).exists,
      "the staging dir is consumed on success")
    // a second identical publish from a re-staged copy also converges
    (10 until 14).map(i => (i.toLong, i % 2)).toDF("id", "k")
      .repartition(1).write.mode("overwrite").partitionBy("k")
      .parquet(staging)
    PartitionMaintenance.publishTagged(spark, staging, table,
      depth = 1, tag = "bx")
    assert(spark.read.parquet(table).count() == 14L)

    // the retry-AFTER-COMPACT case: compaction folds the ingest-bx
    // files into compacted-* names, so the sweep-by-prefix would find
    // nothing — the _published_bx root marker (which compact never
    // touches) must make the retry a no-op instead of a double-append
    PartitionMaintenance.compact(spark, Seq(("t", table, 1)),
      maxFilesPerPartition = 1)
    (10 until 14).map(i => (i.toLong, i % 2)).toDF("id", "k")
      .repartition(1).write.mode("overwrite").partitionBy("k")
      .parquet(staging)
    PartitionMaintenance.publishTagged(spark, staging, table,
      depth = 1, tag = "bx")
    assert(spark.read.parquet(table).count() == 14L,
      "a retry after compaction must not re-append the batch")
    assert(!new java.io.File(staging).exists,
      "the skipped retry still consumes its staging")
  }

  test("compact refuses to fold a MARKERLESS publish: the crashed " +
    "batch is carried forward under its ingest names and the retry " +
    "still converges to exactly one copy") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("pm_carry").toString
    (0 until 10).map(i => (i.toLong, i % 2)).toDF("id", "k")
      .repartition(1).write.mode("overwrite").partitionBy("k").parquet(table)
    val staging = java.nio.file.Files.createTempDirectory("pm_cs").toString
    def stage(lo: Int, hi: Int): Unit =
      (lo until hi).map(i => (i.toLong, i % 2)).toDF("id", "k")
        .repartition(1).write.mode("overwrite").partitionBy("k")
        .parquet(staging)

    stage(10, 14)
    PartitionMaintenance.publishTagged(spark, staging, table,
      depth = 1, tag = "ba")
    stage(14, 18)
    PartitionMaintenance.publishTagged(spark, staging, table,
      depth = 1, tag = "bb")
    // simulate the residual crash window: publish of bb COMPLETED (all
    // renames landed) but the process died before the marker write
    assert(new java.io.File(table, "_published_bb").delete())

    // compact between the crash and the retry — the exact sequence the
    // round-18 quiescence caveat deferred: scheduled maintenance runs
    // before the stream restarts
    val stats = PartitionMaintenance.compact(spark, Seq(("t", table, 1)),
      maxFilesPerPartition = 1)
    assert(stats.nonEmpty)
    val leafFiles = Seq("k=0", "k=1").flatMap(k =>
      new java.io.File(table, k).listFiles().toSeq.map(_.getName))
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
    assert(leafFiles.count(_.startsWith("ingest-bb-")) == 2,
      s"the markerless batch must keep its ingest names: $leafFiles")
    assert(!leafFiles.exists(_.startsWith("ingest-ba-")),
      s"the RECORDED batch must fold into compacted names: $leafFiles")
    assert(spark.read.parquet(table).count() == 18L,
      "carry-forward must not duplicate or drop the crashed batch's rows")

    // the inbound retry finds its own files by prefix and republishes
    stage(14, 18)
    PartitionMaintenance.publishTagged(spark, staging, table,
      depth = 1, tag = "bb")
    val ids = spark.read.parquet(table).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 18L),
      s"retry after carry-forward converges to one copy: $ids")
    // and once recorded, a later compact MAY fold it
    PartitionMaintenance.compact(spark, Seq(("t", table, 1)),
      maxFilesPerPartition = 1)
    assert(spark.read.parquet(table).count() == 18L)
    assert(PartitionMaintenance.audit(spark, Seq(("t", table, 1)))
      .collect().forall(_.getLong(2) == 1L),
      "post-record compact folds everything down to one file per leaf")
  }

  test("compact folds the per-batch root markers into ONE manifest — " +
    "root listing stays bounded and folded tags remain retry-no-ops") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("pm_fold").toString
    (0 until 10).map(i => (i.toLong, i % 2)).toDF("id", "k")
      .repartition(1).write.mode("overwrite").partitionBy("k").parquet(table)
    val staging = java.nio.file.Files.createTempDirectory("pm_fs").toString
    val n = 6
    (0 until n).foreach { b =>
      (10 + 2 * b until 12 + 2 * b).map(i => (i.toLong, i % 2))
        .toDF("id", "k").repartition(1).write.mode("overwrite")
        .partitionBy("k").parquet(staging)
      PartitionMaintenance.publishTagged(spark, staging, table,
        depth = 1, tag = s"b$b")
    }
    def rootEntries() = new java.io.File(table).listFiles().toSeq
      .map(_.getName).filterNot(n => n.startsWith("k=") || n == "_SUCCESS")
    assert(rootEntries().count(_.startsWith("_published_")) == n,
      s"fixture: one marker per batch: ${rootEntries()}")

    PartitionMaintenance.compact(spark, Seq(("t", table, 1)),
      maxFilesPerPartition = 1)
    val after = rootEntries()
    assert(after.count(_.startsWith("_ptags-")) == 1 &&
      !after.exists(_.startsWith("_published_")),
      s"markers must fold into exactly one manifest: $after")

    // idempotence survives the fold: a retry of EVERY folded tag is a
    // no-op (consumes its staging, appends nothing)
    (0 until n).foreach { b =>
      (10 + 2 * b until 12 + 2 * b).map(i => (i.toLong, i % 2))
        .toDF("id", "k").repartition(1).write.mode("overwrite")
        .partitionBy("k").parquet(staging)
      PartitionMaintenance.publishTagged(spark, staging, table,
        depth = 1, tag = s"b$b")
    }
    assert(spark.read.parquet(table).count() == (10 + 2 * n).toLong,
      "no folded tag may re-append")
    // a second fold cycle does not grow the root: N more batches, one
    // compact, still one manifest
    (n until 2 * n).foreach { b =>
      (10 + 2 * b until 12 + 2 * b).map(i => (i.toLong, i % 2))
        .toDF("id", "k").repartition(1).write.mode("overwrite")
        .partitionBy("k").parquet(staging)
      PartitionMaintenance.publishTagged(spark, staging, table,
        depth = 1, tag = s"b$b")
    }
    PartitionMaintenance.compact(spark, Seq(("t", table, 1)),
      maxFilesPerPartition = 1)
    assert(rootEntries().count(_.startsWith("_ptags-")) == 1 &&
      !rootEntries().exists(_.startsWith("_published_")),
      s"root listing must stay bounded across fold cycles: ${rootEntries()}")
    assert(spark.read.parquet(table).select("id").distinct().count()
      == (10 + 4 * n).toLong)
  }

  test("sweepStaging deletes only aged .staging_* leftovers, never a " +
    "fresh in-flight attempt") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pm_sweep").toString
    def mkStaging(name: String, ageMs: Long): Unit = {
      (0 until 4).map(i => (i.toLong, i % 2)).toDF("id", "k")
        .repartition(1).write.mode("overwrite").partitionBy("k")
        .parquet(s"$dir/$name")
      val t = System.currentTimeMillis() - ageMs
      assert(new java.io.File(dir, name).setLastModified(t))
    }
    mkStaging(".staging_bands_dead", ageMs = 120000L)
    mkStaging(".staging_docs_dead", ageMs = 120000L)
    mkStaging(".staging_bands_live", ageMs = 0L)

    val swept = PartitionMaintenance.sweepStaging(spark, dir,
      olderThanMillis = 60000L)
    assert(swept.toSet == Set(".staging_bands_dead", ".staging_docs_dead"),
      s"swept: $swept")
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(left == Set(".staging_bands_live"),
      s"the fresh attempt must survive: $left")
    // a missing dir is a quiet no-op (retention runs on a cadence; the
    // index may not exist yet)
    assert(PartitionMaintenance.sweepStaging(spark,
      s"$dir/nope_${java.util.UUID.randomUUID()}", 0L).isEmpty)
  }

  test("an interrupted swap with partial adds is rolled BACK: the " +
    "partial adds are deleted, the originals survive untouched") {
    val dir = fixture(parts = 2)
    val leaf = new java.io.File(dir, "k=1")
    // manifest names TWO adds; only one landed before the crash
    val addName = "compacted-crash2-part00000.parquet"
    val original = leaf.listFiles().filter(f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
    java.nio.file.Files.copy(original.toPath,
      new java.io.File(leaf, addName).toPath)
    val manifest = new java.io.File(leaf, "_compact_manifest_crash2")
    java.nio.file.Files.write(manifest.toPath,
      (s"add:$addName\nadd:compacted-crash2-part00001.parquet\n" +
        s"del:${original.getName}\n").getBytes)
    // a .tmp manifest remnant must be swept too
    val tmp = new java.io.File(leaf, "_compact_manifest_dead.tmp")
    java.nio.file.Files.write(tmp.toPath, "add:x\n".getBytes)

    PartitionMaintenance.compact(spark, tables(dir),
      maxFilesPerPartition = 1)
    assert(!manifest.exists && !tmp.exists)
    assert(!new java.io.File(leaf, addName).exists,
      "the partial add must be rolled back")
    assert(spark.read.parquet(dir).count() == 20L)
    assert(spark.read.parquet(dir).select(col("id")).distinct().count() == 20L)
  }
}
