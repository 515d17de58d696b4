package graft.operators

import graft.functions.ExprUtils
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for file skipping at scale.
  *
  * Z-ordering (Morton curve) interleaves the bits of two clustering
  * keys so that a range-partitioned sort on the single interleaved key
  * keeps rows close in BOTH dimensions. Files then cover compact
  * rectangles of (a, b) space, and parquet min/max statistics on the
  * two raw columns let scans skip whole files for predicates on either
  * dimension — the standard lakehouse layout trick for tables queried
  * along more than one axis.
  */
object Layout {

  private def shl(e: Column, bits: Column): Column = call_function("shiftleft", e, bits)
  private def shr(e: Column, bits: Column): Column = call_function("shiftright", e, bits)

  /** 62-bit Morton key over the low 31 bits of two non-negative
    * columns: bit i of `a` lands at bit 2i, bit i of `b` at bit 2i+1.
    * 31 bits per dimension keeps the result strictly positive (the
    * sign bit stays clear), so ordering by the key is ordering along
    * the Z-curve in every engine's signed BIGINT. Pure integer
    * bit-math — reproducible in an external SQL oracle. */
  def mortonKey(a: Column, b: Column): Column =
    ExprUtils.bind2(a.bitwiseAND(lit(0x7FFFFFFFL)), b.bitwiseAND(lit(0x7FFFFFFFL))) {
      (x, y) =>
        aggregate(sequence(lit(0), lit(30)), lit(0L), (acc, i) =>
          acc
            .bitwiseOR(shl(shr(x, i).bitwiseAND(lit(1L)), i * lit(2)))
            .bitwiseOR(shl(shr(y, i).bitwiseAND(lit(1L)), i * lit(2) + lit(1))))
    }

  /** Write `df` z-ordered on (aCol, bCol): range-partition on the
    * Morton key into `numFiles` output tasks, sort within each, drop
    * the key, write zstd parquet. Each file then covers a disjoint
    * slice of the Z-curve — a compact rectangle of key space whose
    * min/max column statistics make predicate skipping effective on
    * BOTH columns. */
  def zorderedParquet(df: DataFrame, dir: String, aCol: String, bCol: String,
                      numFiles: Int = 8): Unit =
    df.withColumn("_z", mortonKey(col(aCol), col(bCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").option("compression", "zstd").parquet(dir)
}
