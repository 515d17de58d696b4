package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank centrality in exact integer fixed-point — the crawl-graph
  * source-quality signal (CommonCrawl ranks its frontier by exactly
  * this family of link centralities; a training pipeline weights
  * source domains with it).
  *
  * Arithmetic contract: ranks live on an integer scale (`scaleTotal`
  * mass, default 1e12). Every step is integer division (`div`), so the
  * iteration is bit-exact in ANY engine — an unrolled SQL mirror
  * reproduces it with `//`. Per-edge contribution is
  * `((rank div outdeg) * 85) div 100`; teleport is `(base * 15) div
  * 100`.
  *
  * Dangling mass (out-degree-0 nodes) has two documented policies:
  *  - `redistributeDangling = false` (default): dangling rank is
  *    DROPPED each round — totals decay, relative order is unaffected
  *    for ranking use (the lazy-renormalize choice of sparse
  *    power-iteration implementations).
  *  - `redistributeDangling = true`: each round adds
  *    `((danglingSum div n) * 85) div 100` to every node — canonical
  *    PageRank's uniform dangling redistribution (what NetworkX
  *    computes), at the cost of one 1-row aggregation per round.
  *
  * Scale design: one shuffle join edges⨝ranks on src plus one
  * aggregation on dst per iteration (both key-partitioned; AQE handles
  * hub skew), and the per-round frame is persisted + lineage-truncated
  * the q54 way so the plan does not grow with iteration count. The
  * dangling sum is a 1-row driver scalar per round (vocab-free; same
  * class as Bpe's per-round argmax). Loop-local persists (out-degrees,
  * weighted edges, superseded rounds) are unpersisted before
  * returning; the final frame is registered in [[graft.Caches]] so a
  * request loop's `Caches.release()` reclaims it.
  */
object PageRank {

  /** `nodes`: one column `node`; `edges`: (`src`, `dst`), pre-deduped.
    * Returns (node, rank) on the integer scale. */
  def ranks(nodes: DataFrame, edges: DataFrame, iterations: Int,
            scaleTotal: Long = 1000000000000L,
            redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 1, s"ranks: iterations must be >= 1")
    // callers pass LAZY plans (typically union/join + distinct): pin
    // both, or the node set re-runs its distinct in EVERY round's
    // left join and the edge plan twice in the setup below. A frame
    // the caller already persisted keeps its cache — only frames WE
    // persist here are unpersisted on return.
    val ndOwned = nodes.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val nd = if (ndOwned) nodes.persist() else nodes
    val n = nd.count()
    require(n > 0, "ranks: empty node set")
    val edOwned = edges.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val ed = if (edOwned) edges.persist() else edges
    val base = scaleTotal / n
    val teleport = base * 15 / 100
    val outdeg = ed.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist()
    val e = ed.join(outdeg, Seq("src")).persist()
    e.count() // materialize once; reused every iteration
    // Broadcast the NODE-SIZED side of both per-round joins when the
    // node set is provably small (guide §3.1, the Hits/LabelProp gate,
    // same config key): the weighted edge table then never shuffles
    // inside the loop. Scale-gated on n (already counted above): past
    // `graft.graph.broadcastScoresMaxRows` (default 4M rows) a
    // web-scale rank frame cannot broadcast and the shuffle plan
    // stands. Join strategy only — identical rows.
    val bcastMax = nodes.sparkSession.conf
      .getOption("graft.graph.broadcastScoresMaxRows")
      .map(_.toLong).getOrElse(4000000L)
    val bc: DataFrame => DataFrame =
      if (n <= bcastMax) (df: DataFrame) => broadcast(df)
      else identity[DataFrame]
    // the dangling node SET is static across rounds — only its rank
    // sum changes — so compute it once
    val dangling =
      if (redistributeDangling)
        Some(nd.join(outdeg.select(col("src").as("node")),
          Seq("node"), "left_anti").persist())
      else None
    var r = nd.select(col("node"), lit(base).as("rank"))
    val handles = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var i = 0
    while (i < iterations) {
      val share = dangling match {
        case Some(d) =>
          // the one unavoidable driver action per round; it also FILLS
          // the previous round's lazily-persisted cache (this semi-join
          // reads it), which is what lets the loop skip per-round
          // count() jobs entirely (round-14: one job per round, not two)
          val dm = r.join(d, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0L))).first().getLong(0)
          dm / n * 85 / 100
        case None => 0L
      }
      val contrib = e.join(bc(r), e("src") === r("node"))
        .select(col("dst").as("node"),
          expr("((rank div outdeg) * 85) div 100").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      val next = nd.select(col("node"))
        .join(bc(contrib), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport + share) + coalesce(col("contrib"), lit(0L))).as("rank"))
      r = dangling match {
        case Some(_) =>
          // each round is referenced TWICE (next round's dangling
          // scalar + contrib join) — persist, fill lazily at the next
          // scalar; release only after the final materialization
          // (dropping a never-filled cache would re-run its subtree
          // once per consumer, chaining exponentially)
          val p = next.persist(); handles += p; p
        case None =>
          // single-reference chain: each round feeds only the next, so
          // no persist is needed — plan text grows linearly and the one
          // final action executes the whole chain as ONE job (was one
          // count job per round)
          next
      }
      i += 1
    }
    val res =
      if (dangling.isDefined) graft.Caches.track(r) // persisted in-loop
      else graft.Caches.persist(r)
    res.count() // materialize the chain before anything releases
    handles.filter(_ ne r).foreach(_.unpersist(blocking = false))
    if (ndOwned) nd.unpersist(blocking = false)
    if (edOwned) ed.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    e.unpersist(blocking = false)
    dangling.foreach(_.unpersist(blocking = false))
    res
  }

  /** The SQL mirror of [[ranks]], unrolled: chained CTEs `r0..rK` over
    * caller-supplied CTEs `nodes(node)`, `e(src, dst, outdeg)` and
    * `ns(n)` (the node count — the oracle derives base/teleport itself
    * because registered oracle SQL is static across scale factors).
    * Interpolate into a WITH clause and SELECT from `r$iterations`.
    * Kept HERE so operator and oracle share one definition of the
    * arithmetic. Per-round CTEs are `AS MATERIALIZED`: with the
    * dangling CTE each round references the previous round twice, and
    * DuckDB inlines multiply-referenced CTEs — an unmarked chain
    * re-expands exponentially. */
  def unrolledSqlCtes(iterations: Int, scaleTotal: Long,
                      redistributeDangling: Boolean = false): String = {
    val tp = s"((($scaleTotal // ns.n) * 15) // 100)"
    ((s"r0 AS MATERIALIZED (SELECT node, CAST($scaleTotal // ns.n AS BIGINT) AS rank " +
      "FROM nodes CROSS JOIN ns)") +:
      (1 to iterations).map { k =>
        val dangCte =
          if (redistributeDangling)
            s"""d$k AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0) AS dm
               |        FROM r${k - 1}
               |        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = r${k - 1}.node)),
               |""".stripMargin
          else ""
        val share =
          if (redistributeDangling) s" + ((d$k.dm // ns.n) * 85) // 100" else ""
        val extraJoin = if (redistributeDangling) s" CROSS JOIN d$k" else ""
        s"""${dangCte}c$k AS MATERIALIZED (SELECT e.dst AS node,
           |        SUM(((r${k - 1}.rank // e.outdeg) * 85) // 100) AS contrib
           |        FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
           |        GROUP BY e.dst),
           |r$k AS MATERIALIZED (SELECT n.node,
           |        CAST($tp$share + COALESCE(c$k.contrib, 0) AS BIGINT) AS rank
           |        FROM nodes n CROSS JOIN ns$extraJoin
           |        LEFT JOIN c$k ON n.node = c$k.node)""".stripMargin
      }).mkString(",\n")
  }

  /** Personalized PageRank (topic-sensitive PageRank, Haveliwala 2002):
    * identical integer arithmetic to [[ranks]] but ALL teleport mass
    * returns to the SEED set — rank mass measures proximity to the
    * seeds, the graph-expansion primitive behind related-item
    * retrieval and seed-set growing. Initial mass sits entirely on the
    * seeds (`scaleTotal div |seeds|` each); per round every seed
    * receives `((scaleTotal * 15) div 100) div |seeds|` and edges carry
    * the usual `((rank div outdeg) * 85) div 100`; dangling mass drops
    * (the [[ranks]] default policy). Same per-round join+agg shape,
    * persisted + lineage-truncated; the seed set broadcasts (it is
    * query-sized by definition).
    *
    * `seeds`: one column `node` (must be ⊆ nodes; pre-deduped). */
  def personalizedRanks(nodes: DataFrame, edges: DataFrame,
                        seeds: DataFrame, iterations: Int,
                        scaleTotal: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "personalizedRanks: iterations must be >= 1")
    val ndOwned = nodes.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val nd = if (ndOwned) nodes.persist() else nodes
    val edOwned = edges.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val ed = if (edOwned) edges.persist() else edges
    // same cache-ownership rule as nodes/edges: only unpersist a
    // persist WE created — a caller-cached seeds frame keeps its cache
    val sdOwned = seeds.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val sd = if (sdOwned) seeds.persist() else seeds
    val nSeeds = sd.count()
    require(nSeeds > 0, "personalizedRanks: empty seed set")
    val base = scaleTotal / nSeeds
    val tp = scaleTotal * 15 / 100 / nSeeds
    val outdeg = ed.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist()
    val e = ed.join(outdeg, Seq("src")).persist()
    e.count()
    // the [[ranks]] broadcast gate (nd is node-sized; counting the
    // persisted frame is the same one cheap action ranks pays)
    val bcastMax = nodes.sparkSession.conf
      .getOption("graft.graph.broadcastScoresMaxRows")
      .map(_.toLong).getOrElse(4000000L)
    val bc: DataFrame => DataFrame =
      if (nd.count() <= bcastMax) (df: DataFrame) => broadcast(df)
      else identity[DataFrame]
    // (node, isSeed) once — reused as the teleport mask every round
    val mask = nd.select(col("node"))
      .join(broadcast(sd.select(col("node"), lit(true).as("_seed"))),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("_seed"), lit(false)).as("_seed"))
      .persist()
    var r = mask.select(col("node"),
      when(col("_seed"), lit(base)).otherwise(lit(0L)).as("rank"))
    var i = 0
    while (i < iterations) {
      // single-reference chain (no per-round scalar here): each round
      // feeds only the next, so the loop is fully lazy — no persist, no
      // count; the one final action executes the whole chain as ONE job
      // (round-14: was one count job per round). `mask` and `e` are the
      // multiply-referenced frames and stay persisted above.
      val contrib = e.join(bc(r), e("src") === r("node"))
        .select(col("dst").as("node"),
          expr("((rank div outdeg) * 85) div 100").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      r = mask
        .join(bc(contrib), Seq("node"), "left")
        .select(col("node"),
          (when(col("_seed"), lit(tp)).otherwise(lit(0L))
            + coalesce(col("contrib"), lit(0L))).as("rank"))
      i += 1
    }
    val res = graft.Caches.persist(r)
    res.count() // materialize before the shared frames release
    if (ndOwned) nd.unpersist(blocking = false)
    if (edOwned) ed.unpersist(blocking = false)
    if (sdOwned) sd.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    e.unpersist(blocking = false)
    mask.unpersist(blocking = false)
    res
  }

  /** SQL mirror of [[personalizedRanks]], unrolled over caller CTEs
    * `nodes(node)`, `e(src, dst, outdeg)` and `seeds(node)`; derives
    * `sn(n)` itself. Select from `r$iterations`. */
  def unrolledPersonalizedSqlCtes(iterations: Int, scaleTotal: Long): String = {
    val tp = s"((($scaleTotal * 15) // 100) // sn.n)"
    ((s"sn AS MATERIALIZED (SELECT COUNT(*) AS n FROM seeds),\n" +
      s"r0 AS MATERIALIZED (SELECT n.node, CAST(CASE WHEN s.node IS NOT NULL " +
      s"THEN $scaleTotal // sn.n ELSE 0 END AS BIGINT) AS rank " +
      "FROM nodes n CROSS JOIN sn LEFT JOIN seeds s ON n.node = s.node)") +:
      (1 to iterations).map { k =>
        s"""c$k AS MATERIALIZED (SELECT e.dst AS node,
           |        SUM(((r${k - 1}.rank // e.outdeg) * 85) // 100) AS contrib
           |        FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
           |        GROUP BY e.dst),
           |r$k AS MATERIALIZED (SELECT n.node,
           |        CAST(CASE WHEN s.node IS NOT NULL THEN $tp ELSE 0 END
           |             + COALESCE(c$k.contrib, 0) AS BIGINT) AS rank
           |        FROM nodes n CROSS JOIN sn
           |        LEFT JOIN seeds s ON n.node = s.node
           |        LEFT JOIN c$k ON n.node = c$k.node)""".stripMargin
      }).mkString(",\n")
  }
}
