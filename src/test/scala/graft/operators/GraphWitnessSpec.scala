package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form tests for the round-15 convergence/quality witnesses:
  * k-core peel traces, BFS frontier traces, LPA limit-cycle detection,
  * semi-synchronous LPA, and Newman modularity. */
class GraphWitnessSpec extends SparkSpec {
  import spark.implicits._

  test("peelTrace: path graph trace is exact, trailing removed = 0") {
    // path 1—2—3—4 at k=2: round 1 drops the endpoints, round 2 the rest
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val out = KCore.peelTrace(edges, k = 2, peelRounds = 4)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 4L, 3L, 0L), (1L, 2L, 1L, 2L),
      (2L, 0L, 0L, 2L), (3L, 0L, 0L, 0L), (4L, 0L, 0L, 0L)))
  }

  test("peelTrace: stable core shows an all-zero removed tail") {
    // triangle is its own 2-core: nothing is ever removed
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("u", "v")
    val out = KCore.peelTrace(edges, k = 2, peelRounds = 3)
      .orderBy(col("round")).collect()
    assert(out.forall(r => r.getLong(1) == 3L && r.getLong(2) == 3L
      && r.getLong(3) == 0L))
  }

  test("frontierTrace: path histogram with zero-filled tail") {
    // path 1—2—3—4—5 from seed 1: one node per hop, dry from hop 5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val dist = Bfs.hopDistance(edges, Seq(1L).toDF("node"), rounds = 6)
    val out = Bfs.frontierTrace(dist, rounds = 6)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L, 1L), (1L, 1L, 2L), (2L, 1L, 3L),
      (3L, 1L, 4L), (4L, 1L, 5L), (5L, 0L, 5L), (6L, 0L, 5L)))
  }

  test("convergenceTrace: bipartite square enters a period-2 cycle") {
    // 4-cycle a—b—c—d—a: synchronous LPA swaps labels across the two
    // sides forever — changed stays at |V| while changed2 drops to 0
    val nodes = Seq("a", "b", "c", "d").toDF("node")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val out = LabelProp.convergenceTrace(nodes, edges, iterations = 6)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // rounds >= 3: pure period-2 cycle (l_k = l_{k-2}, all labels move)
    out.filter(_._1 >= 3).foreach { case (k, ch, ch2, nl) =>
      assert(ch == 4L, s"round $k changed"); assert(ch2 == 0L, s"round $k")
      assert(nl == 2L, s"round $k n_labels")
    }
    assert(out.head == ((0L, 0L, 0L, 4L)))
  }

  test("convergenceTrace: a true fixpoint shows changed = 0") {
    // triangle: everyone adopts "a" at round 1 and stays
    val nodes = Seq("a", "b", "c").toDF("node")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val out = LabelProp.convergenceTrace(nodes, edges, iterations = 4)
      .orderBy(col("round")).collect()
    // round 1: b,c change to a (a itself moves to b — min neighbor)
    out.filter(_.getLong(0) >= 3).foreach { r =>
      assert(r.getLong(1) == 0L, s"round ${r.getLong(0)} changed")
    }
  }

  test("semiSyncCommunities: bipartite square converges to one label") {
    val sides = Seq(("a", 0), ("c", 0), ("b", 1), ("d", 1))
      .toDF("node", "side")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val out = LabelProp.semiSyncCommunities(sides, edges, halfRounds = 6)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.values.toSet == Set("a"))
    val tr = LabelProp.semiSyncTrace(sides, edges, halfRounds = 6)
      .orderBy(col("round")).collect()
    // half-round 1 updates side 1 (b, d -> a); 2 updates side 0 (c -> a)
    assert(tr(1).getLong(1) == 2L && tr(2).getLong(1) == 1L)
    tr.filter(_.getLong(0) >= 3).foreach { r =>
      assert(r.getLong(1) == 0L, s"half-round ${r.getLong(0)}")
      assert(r.getLong(2) == 1L)
    }
  }

  test("semiSyncCommunities: isolated nodes keep their own label") {
    val sides = Seq(("a", 0), ("b", 1), ("z", 0)).toDF("node", "side")
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val out = LabelProp.semiSyncCommunities(sides, edges, halfRounds = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("z") == "z")
  }

  test("newmanQ: two clean triangles score Q = 0.5 exactly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, "x"), (2L, "x"), (3L, "x"),
      (4L, "y"), (5L, "y"), (6L, "y")).toDF("node", "label")
    val r = Modularity.newmanQ(labels, edges).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L && r.getLong(2) == 6L)
    assert(r.getLong(3) == 72L)
    assert(r.getLong(4) == 500L) // (4*6*6 - 72) / (4*36) = 0.5
  }

  test("newmanQ: one community covering everything scores 0") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val labels = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("node", "label")
    assert(Modularity.newmanQ(labels, edges).head().getLong(4) == 0L)
  }

  test("newmanQ: bipartite side-split scores -0.5 (the q247 pathology)") {
    // square a—b—c—d—a, communities = the two sides: zero intra edges
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val labels = Seq(("a", "even"), ("c", "even"), ("b", "odd"),
      ("d", "odd")).toDF("node", "label")
    val r = Modularity.newmanQ(labels, edges).head()
    assert(r.getLong(2) == 0L)     // no intra edges at all
    assert(r.getLong(4) == -500L)  // Q = -1/2, the anti-community floor
  }
}
