package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Sink operators (SURVEY.md §2.1, S5–S7). */
object Writers {

  /** S5: compressed CSV directory (the reference writes bzip2 because it
    * is splittable — reference `ihop/import_data.py:674-676`,
    * `README.md:84`). Written distributed, one file per partition. */
  def csvBzip2(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("compression", "bzip2").csv(dir)

  /** S6: parquet sink (distributed). */
  def parquet(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  /** ORC sink (columnar alternative; built into Spark). */
  def orc(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  /** Newline-JSON sink (gzip — splittable is not needed on the write
    * side; re-ingest goes through the S1 schema'd reader). Completes
    * the matrix: every readable format round-trips. */
  def jsonGzip(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(dir)

  /** Hive-partitioned zstd parquet — the curated-dataset layout for
    * cold data at scale: one directory per partition value lets readers
    * prune whole partitions at planning time; zstd is the best
    * ratio/speed tradeoff of the built-in codecs for archival tables
    * (zstd-jni ships with Spark). The repartition on the partition
    * columns routes each partition value to ONE task — without it every
    * task writes a file into every value directory (tasks × values
    * small files); the in-partition sort adds parquet page-level
    * min/max locality on `sortCols` for row-group skipping. */
  def partitionedParquetZstd(df: DataFrame, dir: String,
                             partitionCols: Seq[String],
                             sortCols: Seq[String] = Nil): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy(partitionCols: _*)
      .parquet(dir)

  /** S7: single-file CSV with header. The reference collects to pandas
    * for this (`top_n_df.toPandas().to_csv`); the distributed-friendly
    * equivalent is a coalesce(1) write — only valid for small results
    * (top-N tables, cluster CSVs), never for fact tables. */
  def singleCsv(df: DataFrame, dir: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
}
