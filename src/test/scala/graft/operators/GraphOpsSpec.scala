package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form tests for the round-13 graph operators: deterministic
  * synchronous label propagation and k-core peeling. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference implementation of the deterministic LPA
    * round (plain collections) — the spec's oracle. */
  private def refLpa(nodes: Seq[String], edges: Seq[(String, String)],
                     iters: Int): Map[String, String] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    var l = nodes.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      l = nodes.map { n =>
        adj.get(n) match {
          case Some(nbrs) if nbrs.nonEmpty =>
            val cnt = nbrs.map(l).groupBy(identity).view.mapValues(_.size)
            n -> cnt.toSeq.minBy { case (lab, c) => (-c, lab) }._1
          case _ => n -> l(n)
        }
      }.toMap
    }
    l
  }

  private val lpaNodes = Seq("a", "b", "c", "d", "e", "f", "g")
  // two triangles bridged at c—d; g isolated
  private val lpaEdges = Seq(("a", "b"), ("a", "c"), ("b", "c"),
    ("d", "e"), ("d", "f"), ("e", "f"), ("c", "d"))

  test("label propagation matches the reference round-for-round") {
    (1 to 4).foreach { iters =>
      val out = LabelProp.communities(
          lpaNodes.toDF("node"), lpaEdges.toDF("src", "dst"), iters)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out == refLpa(lpaNodes, lpaEdges, iters), s"at $iters rounds")
    }
  }

  test("label propagation: isolated nodes keep their own label") {
    val out = LabelProp.communities(
        lpaNodes.toDF("node"), lpaEdges.toDF("src", "dst"), 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("g") == "g")
  }

  test("k-core: K4 survives k=3, the attached path is peeled") {
    // K4 on 1..4; path 4—5—6 hangs off it
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    val out = KCore.core(edges, k = 3, peelRounds = 4)
      .orderBy(col("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("k-core: cascade peel needs multiple rounds (path graph empties)") {
    // path 1—2—3—4: every peel round removes the endpoints at k=2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(KCore.core(edges, k = 2, peelRounds = 3).count() == 0L)
    // ...but a single round leaves the (not-yet-converged) inner path
    assert(KCore.core(edges, k = 2, peelRounds = 1)
      .orderBy(col("node")).collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("k-core: cycle is its own 2-core") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("u", "v")
    val out = KCore.core(edges, k = 2, peelRounds = 2)
      .orderBy(col("node")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }
}
