package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan,
  * Albert & Kumara 2007, deterministic variant) — the graph-clustering
  * member of the link-analysis family (PageRank q86/q96, HITS q141,
  * PPR q143, triangles q158): crawl/source graphs get PARTITIONED into
  * communities for per-community quotas, dedup scopes, and contamination
  * tracing, where the centrality operators only RANK nodes.
  *
  * Semantics contract (what makes it bit-reproducible across engines —
  * textbook LPA breaks ties randomly and updates asynchronously, which
  * no two runs agree on): every node starts labeled with its own id;
  * each round, ALL nodes simultaneously adopt the label that is most
  * frequent among their neighbors' previous-round labels, breaking
  * count ties toward the LEXICOGRAPHICALLY SMALLEST label; isolated
  * nodes keep their label. A fixed round count (caller-chosen) replaces
  * the usual "until no change" stop so the unrolled SQL mirror runs the
  * identical computation.
  *
  * Scale design: one adjacency⨝labels hash join + one (node, label)
  * count aggregation + one per-node top-1 (row_number over a KEYED
  * window — state is one group's label histogram, never the corpus) per
  * round. The per-round frame is persisted and materialized so plan
  * lineage stays constant (the PageRank q86 discipline); adjacency is
  * built once (both edge directions) and persisted across rounds. Hub
  * skew lands in the count aggregation, which AQE splits; at 1000
  * executors every step is an ordinary key-partitioned shuffle.
  */
object LabelProp {

  /** `nodes`: one column `node`; `edges`: (`src`, `dst`) UNDIRECTED
    * pairs, pre-deduped (each pair once, either orientation). Returns
    * (node, label) after `iterations` synchronous rounds. */
  def communities(nodes: DataFrame, edges: DataFrame,
                  iterations: Int): DataFrame = {
    require(iterations >= 1, "communities: iterations must be >= 1")
    val spark = nodes.sparkSession
    val ndOwned = nodes.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val nd = if (ndOwned) nodes.persist() else nodes
    // both directions once, reused every round
    val adj = edges.select(col("src").as("node"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("node"), col("src").as("nbr")))
      .persist()
    adj.count()
    // Lineage-truncate WITHOUT an eager count (the round-14 lazy
    // matFlat, see Hits): each round references the previous labels
    // twice (count join + isolated-node fallback), so without the
    // LogicalRDD rebuild round k's plan holds 2^k copies of round 0's —
    // and every AQE stage update stringifies it (explainString-bound,
    // not data-bound). The per-round persist stays (it is what dedups
    // the double reference at execution), but nothing materializes
    // until the ONE action at the end — the whole loop is a single job
    // instead of one count job per round. Handles release only AFTER
    // that action: dropping a never-filled cache would re-run its
    // subtree once per consumer, which chains exponentially.
    def matFlat(df: DataFrame): (DataFrame, DataFrame) = {
      val p = df.persist()
      (spark.createDataFrame(p.rdd, p.schema), p)
    }
    val handles = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var (l, lHandle) = matFlat(nd.select(col("node"), col("node").as("label")))
    handles += lHandle
    var i = 0
    while (i < iterations) {
      val cnt = adj.join(l.select(col("node").as("nbr"), col("label")), "nbr")
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("c").desc, col("label"))
      val best = cnt.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select(col("node"), col("label").as("_best"))
      val (next, nextHandle) = matFlat(l.join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("_best"), col("label")).as("label")))
      handles += nextHandle
      l = next; lHandle = nextHandle
      i += 1
    }
    lHandle.count() // the loop's ONE action — fills every round's cache
    handles.filter(_ ne lHandle).foreach(_.unpersist(blocking = false))
    if (ndOwned) nd.unpersist(blocking = false)
    adj.unpersist(blocking = false)
    graft.Caches.track(lHandle)
    l // the LogicalRDD rebuild — downstream plans stay constant-depth
  }

  /** SQL mirror of [[communities]], unrolled: chained CTEs `l0..lK`
    * over caller-supplied CTEs `nodes(node)` and `adj(node, nbr)` (both
    * edge directions). Interpolate into a WITH clause and SELECT from
    * `l$iterations`. Kept here so operator and oracle share one
    * definition of the round; per-round CTEs are `AS MATERIALIZED`
    * (each round is referenced twice — count join + isolated-node
    * fallback — and DuckDB re-expands inlined multi-reference CTEs
    * exponentially). */
  def unrolledSqlCtes(iterations: Int): String =
    ("l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)" +:
      (1 to iterations).map { k =>
        s"""c$k AS MATERIALIZED (SELECT a.node, l.label, COUNT(*) AS c
           |        FROM adj a JOIN l${k - 1} l ON a.nbr = l.node
           |        GROUP BY a.node, l.label),
           |b$k AS MATERIALIZED (SELECT node, label FROM (
           |        SELECT node, label,
           |               ROW_NUMBER() OVER (PARTITION BY node
           |                 ORDER BY c DESC, label) AS rn
           |        FROM c$k) WHERE rn = 1),
           |l$k AS MATERIALIZED (SELECT p.node,
           |        COALESCE(b.label, p.label) AS label
           |        FROM l${k - 1} p LEFT JOIN b$k b ON p.node = b.node)""".stripMargin
      }).mkString(",\n")
}
