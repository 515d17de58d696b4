package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer fixed-point PageRank: hand-iterated ranks, dangling-mass
  * decay, and partitioning-independence of the integer arithmetic. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // a→b, a→c, b→c; c dangling. scale 300 → base 100, teleport 15.
  private def nodes = Seq("a", "b", "c").toDF("node")
  private def edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")

  test("two hand-iterated rounds match exactly") {
    // r1: contrib from a = ((100 div 2)*85) div 100 = 42 to b and c;
    //     from b = ((100 div 1)*85) div 100 = 85 to c
    // r1 = (a 15, b 57, c 142)
    // r2: from a = ((15 div 2)*85) div 100 = 5; from b = ((57)*85) div 100 = 48
    // r2 = (a 15, b 20, c 68)
    val r = PageRank.ranks(nodes, edges, iterations = 2, scaleTotal = 300L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 15L, "b" -> 20L, "c" -> 68L))
  }

  test("one round matches, and total mass decays via the dangling node") {
    val r = PageRank.ranks(nodes, edges, iterations = 1, scaleTotal = 300L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 15L, "b" -> 57L, "c" -> 142L))
    assert(r.values.sum < 300L, "dangling + integer truncation must only lose mass")
  }

  test("dangling redistribution matches hand iteration, near-conserves mass") {
    // r1: share = ((100 div 3)*85) div 100 = 28 added to every node;
    //     contribs as in the drop-variant (b 42, c 42+85=127)
    // r1 = (a 15+28, b 15+28+42, c 15+28+127) = (43, 85, 170)
    val r1 = PageRank.ranks(nodes, edges, iterations = 1, scaleTotal = 300L,
        redistributeDangling = true)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r1 == Map("a" -> 43L, "b" -> 85L, "c" -> 170L))
    // r2: share = ((170 div 3)*85) div 100 = 47;
    //     from a: ((43 div 2)*85) div 100 = 17 to b,c; from b: 72 to c
    // r2 = (a 62, b 79, c 151); loss is integer truncation only
    val r2 = PageRank.ranks(nodes, edges, iterations = 2, scaleTotal = 300L,
        redistributeDangling = true)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r2 == Map("a" -> 62L, "b" -> 79L, "c" -> 151L))
    assert(r2.values.sum >= 290L && r2.values.sum <= 300L,
      "redistribution keeps mass up to div-floor truncation")
  }

  test("ranks are partitioning-independent (pure integer arithmetic)") {
    val big = (1L to 300L)
    val e = big.flatMap(i => Seq((s"n$i", s"n${i % 50}"), (s"n$i", s"n${(i + 7) % 50}")))
      .distinct.toDF("src", "dst")
    val n = big.map(i => s"n$i").toDF("node")
      .union(Seq.tabulate(50)(i => s"n$i").toDF("node")).distinct()
    val r1 = PageRank.ranks(n.repartition(1), e.repartition(1), 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val r2 = PageRank.ranks(n.repartition(13), e.repartition(7), 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r1 == r2)
    assert(r1.values.toSet.size > 1, "hub nodes must separate from leaves")
  }

  test("personalized ranks: mass stays in the seed neighborhood") {
    // two disconnected components: a->b->c and x->y; seed = {a}
    val nodes = Seq("a", "b", "c", "x", "y").toDF("node")
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val r = PageRank.personalizedRanks(nodes, edges, seeds,
        iterations = 3, scaleTotal = 1000L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("x") == 0L && r("y") == 0L,
      "nodes unreachable from the seeds must hold zero mass")
    assert(r("a") > 0L && r("b") > 0L && r("c") > 0L,
      "the seed's forward neighborhood must hold positive mass")
    assert(r("a") >= r("b") && r("b") >= r("c"),
      "mass decays with distance from the seed on a chain")
    graft.Caches.release()
  }
}
