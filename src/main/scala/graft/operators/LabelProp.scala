package graft.operators

import org.apache.spark.sql.DataFrame
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
  * count aggregation + one per-node top-1 HASH AGGREGATE
  * (`min(struct(-c, label))` — map-side partial aggregation, no
  * per-node sort; guide §2.3/§2.4) per round. The per-round frame is
  * persisted and materialized so plan lineage stays constant (the
  * PageRank q86 discipline); adjacency is built once (both edge
  * directions) and persisted across rounds. Hub skew lands in the
  * count aggregation, which AQE splits; at 1000 executors every step
  * is an ordinary key-partitioned shuffle.
  */
object LabelProp {

  /** Per-round top-1 label: most-frequent, count ties toward the
    * LEXICOGRAPHICALLY SMALLEST label. `min` over the struct
    * `(-c, label)` orders exactly like the previous
    * `row_number() OVER (ORDER BY c DESC, label)` rank-1 pick (struct
    * ordering is field-by-field: -c ascending = c descending, then
    * label ascending — the same binary string comparison the window
    * sort used), but runs as a hash aggregate with map-side partial
    * aggregation instead of a shuffle+SORT window (guide §2.3
    * "aggregate before you shuffle", §2.4). */
  private def bestLabel(cnt: DataFrame): DataFrame =
    cnt.groupBy(col("node"))
      .agg(min(struct((-col("c")).as("nc"), col("label").as("lb"))).as("_t"))
      .select(col("node"), col("_t").getField("lb").as("_best"))

  /** The shared propagation loop: per-round label frames l_0..l_K,
    * each lineage-truncated (lazy matFlat, see Hits: each round
    * references the previous labels twice — count join + isolated-node
    * fallback — so without the LogicalRDD rebuild round k's plan holds
    * 2^k copies of round 0's, and every AQE stage update stringifies
    * it). The per-round persist dedups the double reference at
    * execution but fills only at the caller's ONE action — the whole
    * loop is a single job instead of one count job per round. The
    * caller must unpersist `handles` and `owned` only AFTER that
    * action (a dropped never-filled cache re-runs its subtree once per
    * consumer, which chains exponentially).
    *
    * `carryPrev = true` makes every frame CARRY `_prev` (last round's
    * label) and `_prev2` (two rounds back; = label at rounds 0/1) as
    * extra columns, so [[convergenceTrace]] aggregates each round's
    * frame directly instead of re-joining round k against k−1 and k−2
    * — two joins per traced round removed. The carried values are by
    * construction the same values those joins produced (every frame
    * holds the full node set, so the node-keyed 1:1 joins were pure
    * column carries). [[communities]] passes `false`: its frames stay
    * the narrow (node, label). */
  private def propagate(nodes: DataFrame, edges: DataFrame,
                        iterations: Int, carryPrev: Boolean)
      : (IndexedSeq[DataFrame], Seq[DataFrame], Seq[DataFrame]) = {
    require(iterations >= 1, "communities: iterations must be >= 1")
    val spark = nodes.sparkSession
    val ndOwned = nodes.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val nd = if (ndOwned) nodes.persist() else nodes
    // both directions once, reused every round
    val adj = edges.select(col("src").as("node"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("node"), col("src").as("nbr")))
      .persist()
    adj.count()
    // Broadcast the NODE-SIZED side of both per-round joins when the
    // node set is provably small (guide §3.1, the Hits.scores gate —
    // same config key): the adjacency table then never shuffles inside
    // the loop, and each round's frame keeps the balanced node-scan
    // partitioning instead of paying a per-round exchange. Scale-gated:
    // past `graft.graph.broadcastScoresMaxRows` (default 4M rows) a
    // web-scale label frame cannot broadcast and the shuffle plan
    // stands. Join strategy only — identical rows either way.
    val bcastMax = spark.conf.getOption("graft.graph.broadcastScoresMaxRows")
      .map(_.toLong).getOrElse(4000000L)
    val bc: DataFrame => DataFrame =
      if (nd.count() <= bcastMax) (df: DataFrame) => broadcast(df)
      else identity[DataFrame]
    def matFlat(df: DataFrame): (DataFrame, DataFrame) = {
      val p = df.persist()
      (spark.createDataFrame(p.rdd, p.schema), p)
    }
    val frames = IndexedSeq.newBuilder[DataFrame]
    val handles = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val init0 = nd.select(col("node"), col("node").as("label"))
    var (l, lHandle) = matFlat(
      if (carryPrev) init0.select(col("node"), col("label"),
        col("label").as("_prev"), col("label").as("_prev2"))
      else init0)
    frames += l; handles += lHandle
    var i = 0
    while (i < iterations) {
      val cnt = adj.join(bc(l.select(col("node").as("nbr"), col("label"))),
          "nbr")
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val joined = l.join(bc(bestLabel(cnt)), Seq("node"), "left")
      val (next, nextHandle) = matFlat(
        if (carryPrev) joined.select(col("node"),
          coalesce(col("_best"), col("label")).as("label"),
          col("label").as("_prev"), col("_prev").as("_prev2"))
        else joined.select(col("node"),
          coalesce(col("_best"), col("label")).as("label")))
      frames += next; handles += nextHandle
      l = next
      i += 1
    }
    val owned = (if (ndOwned) Seq(nd) else Seq.empty) :+ adj
    (frames.result(), handles.toSeq, owned)
  }

  /** `nodes`: one column `node`; `edges`: (`src`, `dst`) UNDIRECTED
    * pairs, pre-deduped (each pair once, either orientation). Returns
    * (node, label) after `iterations` synchronous rounds.
    * `track = false` keeps the result's persist OUT of the
    * [[graft.Caches]] registry — for callers that MEMOIZE the fit
    * across queries (the csEdges convention: the bench's per-query
    * release must not drop a shared table). */
  def communities(nodes: DataFrame, edges: DataFrame,
                  iterations: Int, track: Boolean = true): DataFrame = {
    val (frames, handles, owned) =
      propagate(nodes, edges, iterations, carryPrev = false)
    val lHandle = handles.last
    lHandle.count() // the loop's ONE action — fills every round's cache
    handles.filter(_ ne lHandle).foreach(_.unpersist(blocking = false))
    owned.foreach(_.unpersist(blocking = false))
    if (track) graft.Caches.track(lHandle)
    frames.last // the LogicalRDD rebuild — constant-depth downstream
  }

  /** Convergence witness for the fixed-round propagation: per round
    * k = 0..`iterations`, the count of nodes whose label changed vs the
    * PREVIOUS round (`changed`), vs TWO rounds back (`changed2`), and
    * the distinct-label (community) count. Two witnesses because
    * synchronous LPA has two limit behaviors: a trailing `changed = 0`
    * proves a true fixpoint, while a trailing `changed2 = 0` with
    * `changed > 0` proves a PERIOD-2 LIMIT CYCLE — each round being a
    * pure function of the previous labels, l_K = l_{K−2} forces every
    * later round to repeat with period 2. On bipartite graphs the
    * cycle is the EXPECTED outcome (labels swap sides every round, the
    * known pathology of synchronous updates — period ≤ 2 is
    * characteristic of synchronous majority-like dynamics, cf. Goles &
    * Olivos 1980 for threshold networks); [[semiSyncCommunities]] is
    * the converging variant. The round frames CARRY `_prev`/`_prev2`
    * (see [[propagate]]), so each traced round is ONE bounded aggregate
    * over its own frame — no per-round re-join of k against k−1/k−2;
    * `changed2` is 0 by convention for k < 2 (emitted as a literal —
    * the old code compared round 1's labels to themselves). */
  def convergenceTrace(nodes: DataFrame, edges: DataFrame,
                       iterations: Int): DataFrame = {
    val (frames, handles, owned) =
      propagate(nodes, edges, iterations, carryPrev = true)
    val head = frames.head
      .agg(countDistinct(col("label")).cast("long").as("n_labels"))
      .select(lit(0L).as("round"), lit(0L).as("changed"),
        lit(0L).as("changed2"), col("n_labels"))
    val rows = (1 to iterations).map { k =>
      val changed2 =
        if (k >= 2)
          sum(when(col("label") =!= col("_prev2"), 1L).otherwise(0L))
            .cast("long")
        else lit(0L)
      frames(k)
        .agg(sum(when(col("label") =!= col("_prev"), 1L).otherwise(0L))
            .cast("long").as("changed"),
          changed2.as("changed2"),
          countDistinct(col("label")).cast("long").as("n_labels"))
        .select(lit(k.toLong).as("round"), col("changed"), col("changed2"),
          col("n_labels"))
    }
    val out = (head +: rows).reduce(_.unionByName(_))
    val result = graft.Caches.track(out.persist())
    result.count() // the trace's ONE action — fills every round's cache
    handles.foreach(_.unpersist(blocking = false))
    owned.foreach(_.unpersist(blocking = false))
    result
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

  /** SQL mirror of [[convergenceTrace]]: appends a `lpatrace` CTE to
    * [[unrolledSqlCtes]] with one row per round. Select
    * `round, changed, changed2, n_labels` from `lpatrace`. */
  def traceSqlCtes(iterations: Int): String = {
    val head =
      """SELECT CAST(0 AS BIGINT) AS round, CAST(0 AS BIGINT) AS changed,
        |       CAST(0 AS BIGINT) AS changed2,
        |       CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels FROM l0""".stripMargin
    val rows = (1 to iterations).map { k =>
      val p2 =
        if (k >= 2)
          s"""CAST(SUM(CASE WHEN a.label <> c.label THEN 1 ELSE 0 END)
             |            AS BIGINT)""".stripMargin
        else "CAST(0 AS BIGINT)"
      val p2join =
        if (k >= 2) s"\n|JOIN l${k - 2} c ON a.node = c.node".stripMargin
        else ""
      s"""SELECT CAST($k AS BIGINT) AS round,
         |       CAST(SUM(CASE WHEN a.label <> b.label THEN 1 ELSE 0 END)
         |            AS BIGINT) AS changed,
         |       $p2 AS changed2,
         |       CAST(COUNT(DISTINCT a.label) AS BIGINT) AS n_labels
         |FROM l$k a JOIN l${k - 1} b ON a.node = b.node$p2join""".stripMargin
    }
    unrolledSqlCtes(iterations) +
      s",\nlpatrace AS (${(head +: rows).mkString("\nUNION ALL\n")})"
  }

  /** Semi-synchronous label propagation (the Cordasco & Gargano 2010
    * coloring schedule specialized to a 2-colorable graph): half-round
    * t updates ONLY the nodes of side t % 2 — odd half-rounds side 1,
    * even side 0 — from their neighbors' current labels, same
    * most-frequent / smallest-label rule as [[communities]]. On a
    * bipartite graph (sides = the two partitions, e.g. customers vs
    * suppliers) neighbors are never updated in the same half-round, so
    * the label-swap oscillation of the synchronous variant cannot
    * occur and the propagation genuinely converges (witnessed by
    * [[semiSyncTrace]]'s trailing changed = 0 half-rounds). Same scale
    * shape as [[communities]] — one adjacency⨝labels join + keyed
    * top-1 per half-round, with the count join pre-filtered to the
    * active side (half the work of a full round).
    *
    * `sides`: (node, side) with side ∈ {0, 1}; every graph node must
    * appear. Returns (node, label) after `halfRounds` half-rounds. */
  def semiSyncCommunities(sides: DataFrame, edges: DataFrame,
                          halfRounds: Int, track: Boolean = true): DataFrame = {
    val (frames, handles, owned) =
      semiSyncPropagate(sides, edges, halfRounds, carryPrev = false)
    val lHandle = handles.last
    lHandle.count() // the loop's ONE action — fills every round's cache
    handles.filter(_ ne lHandle).foreach(_.unpersist(blocking = false))
    owned.foreach(_.unpersist(blocking = false))
    if (track) graft.Caches.track(lHandle)
    frames.last
  }

  /** Per-half-round convergence trace of [[semiSyncCommunities]]:
    * (round, changed, n_labels). TWO trailing changed = 0 rows prove
    * the fixpoint — one full sweep (both sides) with no update, after
    * which every later half-round repeats. Frames carry `_prev` (see
    * [[propagate]]), so each traced half-round is one aggregate over
    * its own frame — no re-join of k against k−1. */
  def semiSyncTrace(sides: DataFrame, edges: DataFrame,
                    halfRounds: Int): DataFrame = {
    val (frames, handles, owned) =
      semiSyncPropagate(sides, edges, halfRounds, carryPrev = true)
    val head = frames.head
      .agg(countDistinct(col("label")).cast("long").as("n_labels"))
      .select(lit(0L).as("round"), lit(0L).as("changed"), col("n_labels"))
    val rows = (1 to halfRounds).map { k =>
      frames(k)
        .agg(sum(when(col("label") =!= col("_prev"), 1L).otherwise(0L))
            .cast("long").as("changed"),
          countDistinct(col("label")).cast("long").as("n_labels"))
        .select(lit(k.toLong).as("round"), col("changed"), col("n_labels"))
    }
    val out = (head +: rows).reduce(_.unionByName(_))
    val result = graft.Caches.track(out.persist())
    result.count() // the trace's ONE action — fills every round's cache
    handles.foreach(_.unpersist(blocking = false))
    owned.foreach(_.unpersist(blocking = false))
    result
  }

  /** The semi-synchronous loop body (shape of [[propagate]], count
    * join pre-filtered to the active side; same lazy matFlat / single
    * caller action / release-after-action discipline; same
    * [[bestLabel]] hash-aggregate top-1 and the same `carryPrev`
    * column-carry — only `_prev` here, [[semiSyncTrace]] never looks
    * two half-rounds back). */
  private def semiSyncPropagate(sides: DataFrame, edges: DataFrame,
                                halfRounds: Int, carryPrev: Boolean)
      : (IndexedSeq[DataFrame], Seq[DataFrame], Seq[DataFrame]) = {
    require(halfRounds >= 1, "semiSync: halfRounds must be >= 1")
    val spark = sides.sparkSession
    val sdOwned = sides.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val sd = if (sdOwned) sides.persist() else sides
    val adj = edges.select(col("src").as("node"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("node"), col("src").as("nbr")))
      .persist()
    adj.count()
    // the [[propagate]] broadcast gate — here it also covers the
    // per-half-round active-side semi-join (node-sized as well)
    val bcastMax = spark.conf.getOption("graft.graph.broadcastScoresMaxRows")
      .map(_.toLong).getOrElse(4000000L)
    val bc: DataFrame => DataFrame =
      if (sd.count() <= bcastMax) (df: DataFrame) => broadcast(df)
      else identity[DataFrame]
    def matFlat(df: DataFrame): (DataFrame, DataFrame) = {
      val p = df.persist()
      (spark.createDataFrame(p.rdd, p.schema), p)
    }
    val frames = IndexedSeq.newBuilder[DataFrame]
    val handles = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val init0 = sd.select(col("node"), col("node").as("label"))
    var (l, lHandle) = matFlat(
      if (carryPrev) init0.select(col("node"), col("label"),
        col("label").as("_prev"))
      else init0)
    frames += l; handles += lHandle
    var t = 1
    while (t <= halfRounds) {
      val active = sd.where(col("side") === (t % 2)).select(col("node"))
      val cnt = adj
        .join(bc(active), Seq("node"), "left_semi")
        .join(bc(l.select(col("node").as("nbr"), col("label"))), "nbr")
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val joined = l.join(bc(bestLabel(cnt)), Seq("node"), "left")
      val (next, nextHandle) = matFlat(
        if (carryPrev) joined.select(col("node"),
          coalesce(col("_best"), col("label")).as("label"),
          col("label").as("_prev"))
        else joined.select(col("node"),
          coalesce(col("_best"), col("label")).as("label")))
      frames += next; handles += nextHandle
      l = next
      t += 1
    }
    val owned = (if (sdOwned) Seq(sd) else Seq.empty) :+ adj
    (frames.result(), handles.toSeq, owned)
  }

  /** SQL mirror of [[semiSyncCommunities]], unrolled over
    * caller-supplied CTEs `sides(node, side)` and `adj(node, nbr)`.
    * Select from `m$halfRounds`. */
  def semiSyncSqlCtes(halfRounds: Int): String =
    ("m0 AS MATERIALIZED (SELECT node, node AS label FROM sides)" +:
      (1 to halfRounds).map { t =>
        s"""sc$t AS MATERIALIZED (SELECT a.node, l.label, COUNT(*) AS c
           |        FROM adj a
           |        JOIN sides s ON s.node = a.node AND s.side = ${t % 2}
           |        JOIN m${t - 1} l ON a.nbr = l.node
           |        GROUP BY a.node, l.label),
           |sb$t AS MATERIALIZED (SELECT node, label FROM (
           |        SELECT node, label,
           |               ROW_NUMBER() OVER (PARTITION BY node
           |                 ORDER BY c DESC, label) AS rn
           |        FROM sc$t) WHERE rn = 1),
           |m$t AS MATERIALIZED (SELECT p.node,
           |        COALESCE(b.label, p.label) AS label
           |        FROM m${t - 1} p LEFT JOIN sb$t b ON p.node = b.node)""".stripMargin
      }).mkString(",\n")

  /** SQL mirror of [[semiSyncTrace]]: appends an `sstrace` CTE to
    * [[semiSyncSqlCtes]]. Select `round, changed, n_labels` from it. */
  def semiSyncTraceSqlCtes(halfRounds: Int): String = {
    val head =
      """SELECT CAST(0 AS BIGINT) AS round, CAST(0 AS BIGINT) AS changed,
        |       CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels FROM m0""".stripMargin
    val rows = (1 to halfRounds).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS round,
         |       CAST(SUM(CASE WHEN a.label <> b.label THEN 1 ELSE 0 END)
         |            AS BIGINT) AS changed,
         |       CAST(COUNT(DISTINCT a.label) AS BIGINT) AS n_labels
         |FROM m$k a JOIN m${k - 1} b ON a.node = b.node""".stripMargin
    }
    semiSyncSqlCtes(halfRounds) +
      s",\nsstrace AS (${(head +: rows).mkString("\nUNION ALL\n")})"
  }
}
