package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (Seidman 1983; the
  * Batagelj–Zaveršnik peel expressed as bulk rounds): repeatedly drop
  * every node whose CURRENT degree is below k, together with its
  * incident edges, until the k-core remains. The dense-subgraph
  * counterpart of the link-analysis family — a crawl pipeline uses the
  * core to separate densely-interlinked hub communities (spam rings,
  * boilerplate link farms, genuinely dense topics) from the long tail
  * that LPA/PageRank alone cannot isolate.
  *
  * Determinism contract: each round recomputes degrees over the
  * surviving edge set and removes ALL sub-k nodes simultaneously — no
  * ordering dependence, so any engine that runs the same round count
  * produces the identical core. A fixed `peelRounds` replaces the
  * "until fixpoint" stop so the unrolled SQL mirror is the same
  * computation; rounds beyond convergence are no-ops (the survivor set
  * is monotone decreasing), so callers size it generously — degeneracy
  * peeling converges in O(diameter-ish) bulk rounds on real graphs.
  *
  * Scale design: per round one degree aggregation (map-side combined)
  * plus two semi-join filters of the edge list against the survivor
  * set — all key-partitioned hash operations, no windows, no driver
  * state. The per-round edge frame is persisted and materialized so
  * lineage stays constant (the PageRank q86 discipline).
  */
object KCore {

  /** `edges`: (`u`, `v`) undirected, pre-deduped, u ≠ v. Returns
    * (node, deg) — the nodes surviving `peelRounds` rounds of sub-k
    * removal, with their degree inside the surviving subgraph. */
  def core(edges: DataFrame, k: Long, peelRounds: Int): DataFrame = {
    require(k >= 1, "core: k must be >= 1")
    require(peelRounds >= 1, "core: peelRounds must be >= 1")
    val spark = edges.sparkSession
    // Lineage-truncate WITHOUT an eager count (the round-14 lazy
    // matFlat, see Hits/LabelProp): the round plan references e three
    // times (degree count + two survivor semi-joins), so without the
    // LogicalRDD rebuild round r's plan holds 3^r copies of the input
    // subtree and every AQE stage update stringifies it. The per-round
    // persist stays (it dedups the triple reference at execution) but
    // fills only at the ONE action at the end — a single job for the
    // whole peel instead of a count job per round. Handles release
    // only after that action (a dropped never-filled cache re-runs its
    // subtree per consumer, chaining 3^r). Peak cache holds every
    // round's SHRINKING edge set instead of two rounds' — the peeled
    // sets decay geometrically on real graphs and persists spill to
    // disk, the price of k fewer driver round-trips.
    def matFlat(df: DataFrame): (DataFrame, DataFrame) = {
      val p = df.persist()
      (spark.createDataFrame(p.rdd, p.schema), p)
    }
    val handles = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var (e, eHandle) = matFlat(edges)
    handles += eHandle
    var i = 0
    while (i < peelRounds) {
      val deg = e.select(col("u").as("node"))
        .union(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
      val keep = deg.where(col("dg") >= k).select(col("node"))
      val (next, nextHandle) = matFlat(e
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v")))
      handles += nextHandle
      e = next; eHandle = nextHandle
      i += 1
    }
    val out = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("dg"))
    val result = graft.Caches.track(out.persist())
    result.count() // the peel's ONE action — fills every round's cache
    handles.foreach(_.unpersist(blocking = false))
    result
  }

  /** SQL mirror of [[core]], unrolled: chained CTEs `e0..eR` over a
    * caller-supplied CTE `edges(u, v)`; the final degree table is
    * `coredeg`. Select `node, dg` from it. Per-round CTEs are
    * `AS MATERIALIZED` (each edge set is referenced three times —
    * degree count + two survivor filters). */
  def unrolledSqlCtes(k: Long, peelRounds: Int): String =
    ("e0 AS MATERIALIZED (SELECT u, v FROM edges)" +:
      ((1 to peelRounds).map { r =>
        s"""d$r AS MATERIALIZED (SELECT node, COUNT(*) AS dg FROM (
           |        SELECT u AS node FROM e${r - 1}
           |        UNION ALL SELECT v FROM e${r - 1}) GROUP BY node),
           |k$r AS MATERIALIZED (SELECT node FROM d$r WHERE dg >= $k),
           |e$r AS MATERIALIZED (SELECT e.u, e.v FROM e${r - 1} e
           |        JOIN k$r a ON e.u = a.node
           |        JOIN k$r b ON e.v = b.node)""".stripMargin
      } :+
        s"""coredeg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS dg FROM (
           |        SELECT u AS node FROM e$peelRounds
           |        UNION ALL SELECT v FROM e$peelRounds) GROUP BY node)""".stripMargin))
      .mkString(",\n")
}
