package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized-graph invariants for the round-15 witnesses, each
  * checked against an independent plain-collections reference —
  * complementing GraphWitnessSpec's closed forms (the RankStatsPropSpec
  * discipline: deterministic seeds, properties that must hold for ANY
  * graph). */
class GraphWitnessPropSpec extends SparkSpec {
  import spark.implicits._

  private def randomGraph(seed: Int, n: Int, m: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to m).flatMap { _ =>
      val u = rnd.nextInt(n).toLong; val v = rnd.nextInt(n).toLong
      if (u < v) Some((u, v)) else if (v < u) Some((v, u)) else None
    }.distinct
  }

  /** Reference peel: simultaneous sub-k removal, plain collections —
    * returns the per-round edge sets e_0..e_R. */
  private def refPeel(edges: Seq[(Long, Long)], k: Long,
                      rounds: Int): Seq[Seq[(Long, Long)]] = {
    var cur = edges
    Seq(edges) ++ (0 until rounds).map { _ =>
      val deg = (cur.map(_._1) ++ cur.map(_._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      cur = cur.filter(p => keep(p._1) && keep(p._2))
      cur
    }
  }

  test("peelTrace matches the reference peel round-for-round") {
    Seq((3, 12, 30), (11, 20, 60), (23, 15, 45)).foreach {
      case (seed, n, m) =>
        val edges = randomGraph(seed, n, m)
        val ref = refPeel(edges, k = 2, rounds = 5)
        val out = KCore.peelTrace(edges.toDF("u", "v"), k = 2, peelRounds = 5)
          .orderBy(col("round")).collect()
        out.foreach { r =>
          val e = ref(r.getLong(0).toInt)
          val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.size.toLong
          assert(r.getLong(1) == nodes && r.getLong(2) == e.size.toLong,
            s"seed $seed round ${r.getLong(0)}")
        }
        // monotone: removed is never negative, n_nodes never grows
        val ns = out.map(_.getLong(1))
        assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
        assert(out.forall(_.getLong(3) >= 0L))
    }
  }

  test("frontierTrace matches reference BFS level sizes and settles") {
    Seq((5, 14, 28), (17, 25, 50)).foreach { case (seed, n, m) =>
      val edges = randomGraph(seed, n, m)
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val seeds = Seq(0L, 1L)
      var settled = seeds.toSet.filter(s => s < n)
      var frontier = settled
      val refLevels = Seq(settled.size.toLong) ++ (1 to 6).map { _ =>
        val next = frontier.flatMap(x => adj.getOrElse(x, Set.empty))
          .diff(settled)
        settled ++= next; frontier = next
        next.size.toLong
      }
      val out = Bfs.frontierTrace(
          Bfs.hopDistance(edges.toDF("src", "dst"),
            seeds.toDF("node"), rounds = 6), rounds = 6)
        .orderBy(col("round")).collect()
      assert(out.map(_.getLong(1)).toSeq == refLevels, s"seed $seed")
      // settled is the running sum of frontiers
      assert(out.map(_.getLong(2)).toSeq ==
        refLevels.scanLeft(0L)(_ + _).tail, s"seed $seed settled")
    }
  }

  test("newmanQ matches a brute-force reference on random partitions") {
    Seq((31, 12, 26), (41, 18, 40)).foreach { case (seed, n, m) =>
      val rnd = new scala.util.Random(seed + 1)
      val edges = randomGraph(seed, n, m)
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val label = nodes.map(v => v -> s"c${rnd.nextInt(3)}").toMap
      val mm = edges.size.toLong
      val intra = edges.count(p => label(p._1) == label(p._2)).toLong
      val degByC = (edges.map(_._1) ++ edges.map(_._2))
        .groupBy(label).view.mapValues(_.size.toLong).toMap
      val sumD2 = degByC.values.map(d => d * d).sum
      val refQ = math.floor(1000.0 *
        (4.0 * mm * intra - sumD2) / (4.0 * mm * mm)).toLong
      val r = Modularity.newmanQ(
        label.toSeq.toDF("node", "label"),
        edges.toDF("src", "dst")).head()
      assert(r.getLong(0) == mm && r.getLong(2) == intra
        && r.getLong(3) == sumD2 && r.getLong(4) == refQ, s"seed $seed")
      // Q is bounded: [-1/2, 1)
      assert(r.getLong(4) >= -500L && r.getLong(4) < 1000L)
    }
  }

  test("semiSyncTrace: changed counts only touch the active side") {
    val edges = randomGraph(53, 16, 30)
      .map { case (u, v) => (s"a$u", s"b$v") } // force bipartite-ish ids
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val sides = nodes.map(v => (v, if (v.startsWith("a")) 0 else 1))
    val tr = LabelProp.semiSyncTrace(sides.toDF("node", "side"),
        edges.toDF("src", "dst"), halfRounds = 8)
      .orderBy(col("round")).collect()
    val sideCount = sides.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    tr.filter(_.getLong(0) >= 1).foreach { r =>
      val active = sideCount((r.getLong(0) % 2).toInt)
      assert(r.getLong(1) <= active,
        s"half-round ${r.getLong(0)}: changed ${r.getLong(1)} > side $active")
    }
    // n_labels never increases (labels only merge toward minima here)
    val nl = tr.map(_.getLong(2))
    assert(nl.zip(nl.tail).forall { case (a, b) => b <= a })
  }
}
