package graft.export

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Annotation.cohensKappaMilli closed forms: perfect agreement, a
  * hand-computed partial-agreement table, and the contingency payload. */
class AnnotationSpec extends SparkSpec {
  import spark.implicits._

  private def kappa(rows: Seq[(String, String)]): (Long, Array[org.apache.spark.sql.Row]) = {
    val out = Annotation.cohensKappaMilli(rows.toDF("a", "b"), "a", "b").collect()
    (out.head.getAs[Long]("kappa_milli"), out)
  }

  test("perfect agreement is exactly 1000 milli") {
    val (k, _) = kappa(Seq(("x", "x"), ("y", "y"), ("x", "x")))
    assert(k == 1000L)
  }

  test("hand-computed 2x2: kappa = 0.5") {
    // n=4, diag=3; row marginals a:3 b:1, col a:2 b:2 → Σrc = 8
    // κ = (4·3 − 8) / (16 − 8) = 0.5
    val (k, out) = kappa(Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b")))
    assert(k == 500L)
    val ct = out.map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("n"))).toMap
    assert(ct == Map(("a", "a") -> 2L, ("a", "b") -> 1L, ("b", "b") -> 1L))
    assert(out.head.getAs[Long]("n_items") == 4L &&
      out.head.getAs[Long]("n_agree") == 3L &&
      out.head.getAs[Long]("sum_rowcol") == 8L)
  }

  test("labels seen by only one annotator contribute zero chance mass") {
    // B never answers "z": Σrc must ignore the z row marginal
    val (_, out) = kappa(Seq(("z", "a"), ("a", "a")))
    assert(out.head.getAs[Long]("sum_rowcol") == 2L) // row a:1 × col a:2
  }
}
