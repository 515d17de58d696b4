package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted IVF index must return exactly what the transient
  * [[Similarity.ivfTopK]] returns for the same router config, survive a
  * save/load round-trip bit-for-bit, and prune the corpus scan to the
  * probed cell directories (static partition pruning).
  */
class IvfIndexSpec extends SparkSpec {

  private def asRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("rank"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("built index ≡ transient ivfTopK; save/load round-trips") {
    val d = sf("sf0.001")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val qs = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))

    val transient = asRows(Similarity.ivfTopK(qs, emb,
      "query_id", "vec_id", "embedding", k = 5, nlist = 8, nprobe = 3))

    val idx = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
    val built = asRows(idx.search(qs, "query_id", "embedding", k = 5, nprobe = 3))
    assert(built == transient)

    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    idx.save(dir)
    val loaded = IvfIndex.load(spark, dir, "vec_id")
    val reread = asRows(loaded.search(qs, "query_id", "embedding", k = 5, nprobe = 3))
    assert(reread == built)

    // cell directories on disk + static partition pruning in the scan
    val cellDirs = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.getName.startsWith("_cell=")).map(_.getName).toSet
    assert(cellDirs.size == 8, s"expected 8 cell dirs, got $cellDirs")
    val plan = loaded.search(qs, "query_id", "embedding", k = 5, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_cell"),
      s"corpus scan should carry a _cell partition filter:\n$plan")
  }
}
