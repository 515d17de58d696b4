package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance by synchronous frontier expansion —
  * the TRAVERSAL member of the graph family (PageRank/HITS/PPR rank,
  * LabelProp partitions, KCore densifies, connected components via
  * Dedup.keeperTransitive): dist(node) = min #hops from any seed,
  * computed level by level. A crawl pipeline uses it for frontier
  * depth quotas and contamination blast-radius ("everything within 3
  * hops of a flagged source"); a graph-feature pipeline uses it as the
  * distance-to-anchor feature.
  *
  * Determinism: synchronous min-plus relaxation — a node's distance is
  * FINAL the first round it is reached (all edges cost 1), so a fixed
  * round count R yields exactly the nodes at distance ≤ R, identically
  * on any engine.
  *
  * Scale design: the per-round work is FRONTIER-BOUNDED, not
  * graph-bounded — round k joins the adjacency ONLY against the nodes
  * first reached at k−1 (one hash join + distinct + one left-anti join
  * against the settled set, all key-partitioned). The settled set is
  * lineage-truncated per round (the Hits.matFlat / Dedup pattern: the
  * round plan references it twice — union + anti-join — so plain
  * persist+count would nest 2^k plan copies and the per-action
  * stringification goes CPU-bound). Unreached nodes never enter any
  * frame.
  */
object Bfs {

  /** `edges`: (`src`, `dst`) UNDIRECTED, pre-deduped; `seeds`: one
    * column `node`. Returns (node, dist) for every node within
    * `rounds` hops of any seed, dist = the minimum hop count. */
  def hopDistance(edges: DataFrame, seeds: DataFrame,
                  rounds: Int): DataFrame = {
    require(rounds >= 1, "hopDistance: rounds must be >= 1")
    val spark = edges.sparkSession
    // round-14 lazy matFlat (see Hits/LabelProp): constant-depth plans
    // via the LogicalRDD rebuild, per-round persists dedup the double
    // reference (frontier filter + anti-join), but nothing materializes
    // until the one action at the end — a single job for the whole
    // traversal. Handles release only after that action.
    def matFlat(df: DataFrame): (DataFrame, DataFrame) = {
      val p = df.persist()
      (spark.createDataFrame(p.rdd, p.schema), p)
    }
    val adj = edges.select(col("src").as("node"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("node"), col("src").as("nbr")))
      .persist()
    val handles = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var (d, dHandle) = matFlat(
      seeds.select(col("node")).distinct()
        .select(col("node"), lit(0L).as("dist")))
    handles += dHandle
    var k = 1
    while (k <= rounds) {
      val frontier = d.where(col("dist") === (k - 1)).select(col("node"))
      val cand = adj
        .join(frontier.select(col("node").as("nbr")), Seq("nbr"), "left_semi")
        .select(col("node")).distinct()
      val fresh = cand.join(d.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(k.toLong).as("dist"))
      val (next, nextHandle) = matFlat(d.unionByName(fresh))
      handles += nextHandle
      d = next; dHandle = nextHandle
      k += 1
    }
    dHandle.count() // the traversal's ONE action — fills every cache
    handles.filter(_ ne dHandle).foreach(_.unpersist(blocking = false))
    adj.unpersist(blocking = false)
    graft.Caches.track(dHandle)
    d
  }

  /** SQL mirror of [[hopDistance]], unrolled: chained CTEs `d0..dR`
    * over caller-supplied CTEs `adj(node, nbr)` (both edge directions)
    * and `seeds(node)`. Select `node, dist` from `d$rounds`. Per-round
    * CTEs are `AS MATERIALIZED` (the settled set is referenced twice
    * per round). */
  def unrolledSqlCtes(rounds: Int): String =
    ("d0 AS MATERIALIZED (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist FROM seeds)" +:
      (1 to rounds).map { k =>
        s"""f$k AS MATERIALIZED (SELECT node FROM d${k - 1} WHERE dist = ${k - 1}),
           |c$k AS MATERIALIZED (SELECT DISTINCT a.node FROM adj a
           |        JOIN f$k f ON a.nbr = f.node),
           |d$k AS MATERIALIZED (SELECT node, dist FROM d${k - 1}
           |        UNION ALL
           |        SELECT c.node, CAST($k AS BIGINT) AS dist FROM c$k c
           |        LEFT JOIN d${k - 1} p ON c.node = p.node
           |        WHERE p.node IS NULL)""".stripMargin
      }).mkString(",\n")
}
