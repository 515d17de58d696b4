package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Privacy: k-anonymity audit group math and the suppression variant's
  * row-preserving QI nulling. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI = (city, band); the (a, 1) group has 3 members, (b, 2) has 1
  private val rows = Seq(
    (1L, "a", 1L), (2L, "a", 1L), (3L, "a", 1L), (4L, "b", 2L))
    .toDF("id", "city", "band")

  test("audit: group sizes and the k flag") {
    val a = Privacy.kAnonymityAudit(rows, Seq("city", "band"), k = 2)
      .orderBy(col("city")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(a == Seq(("a", 1L, 3L, 0L), ("b", 2L, 1L, 1L)))
  }

  test("suppress: risky groups get nulled QI, row count unchanged") {
    val s = Privacy.suppressBelowK(rows, Seq("city", "band"), k = 2)
    assert(s.count() == 4)
    val suppressed = s.where(col("id") === 4L).collect().head
    assert(suppressed.isNullAt(s.columns.indexOf("city")) &&
      suppressed.isNullAt(s.columns.indexOf("band")))
    assert(s.where(col("city").isNotNull).count() == 3)
  }
}
