package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables once at write time
  * so repeated equi-joins/aggregations on the bucket key run with NO
  * exchange (SURVEY.md §7 scale posture; at 100 TB the dominant cost of
  * a fact-fact join is the shuffle — bucketing amortizes it across
  * every downstream query).
  *
  * Bucketed output requires the session catalog (`saveAsTable`); callers
  * own the table namespace.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True iff the physical plan of `df` contains a shuffle exchange —
    * the assertion hook for "this bucketed join must not shuffle". */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
