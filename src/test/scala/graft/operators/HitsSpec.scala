package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HITS integer fixed-point: hand-computed chain graph, the zero rules
  * (no in-edges → authority 0, no out-edges → hub 0), max-normalization
  * (some score hits exactly `scale` each half-round), and determinism. */
class HitsSpec extends SparkSpec {

  private def chain() = {
    import spark.implicits._
    val nodes = Seq("a", "b", "c").toDF("node")
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    (nodes, edges)
  }

  test("one iteration on a->b->c matches the hand computation") {
    val (nodes, edges) = chain()
    val got = Hits.scores(nodes, edges, iterations = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // auth: raw(b)=raw(c)=scale -> both normalize to scale; a has no
    // in-edges -> 0. hub: raw(a)=auth(b)=scale, raw(b)=auth(c)=scale
    // -> both scale; c has no out-edges -> 0.
    assert(got("a") == (1000000L, 0L))
    assert(got("b") == (1000000L, 1000000L))
    assert(got("c") == (0L, 1000000L))
    graft.Caches.release()
  }

  test("max-normalization pins the top score to scale; determinism") {
    import spark.implicits._
    val nodes = Seq("h1", "h2", "x", "y", "z").toDF("node")
    // h1 points at 3 authorities, h2 at 1 — h1 must dominate hubs
    val edges = Seq(("h1", "x"), ("h1", "y"), ("h1", "z"), ("h2", "x"))
      .toDF("src", "dst")
    def run() = Hits.scores(nodes, edges, iterations = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val g1 = run(); val g2 = run()
    assert(g1 == g2, "integer fixed-point must be deterministic")
    assert(g1("h1")._1 == 1000000L, "dominant hub normalizes to scale")
    assert(g1("h1")._1 > g1("h2")._1)
    assert(g1("x")._2 >= g1("y")._2, "doubly-cited authority >= singly")
    assert(g1.values.forall { case (h, a) =>
      h >= 0 && h <= 1000000L && a >= 0 && a <= 1000000L })
    graft.Caches.release()
  }
}
