package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality inspector: prints the formatted physical plan for
  * selected queries so scan pruning / pushdown / join strategy / sort
  * handling can be audited (the first plan that passes is not
  * necessarily the plan you want). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q01_topn_count", "q02_filter_regex", "q10_semijoin_topn",
                  "q11_exclude_top_users", "q21_agg_pricing")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Queries.all(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
