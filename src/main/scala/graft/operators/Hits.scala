package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hub/authority centrality (Kleinberg 1999) in exact integer
  * fixed-point — the second member of the link-analysis family next to
  * [[PageRank]]: on a crawl graph, authorities are the pages good hubs
  * point AT and hubs are the pages that point at good authorities; on
  * a bipartite interaction graph (here customers→suppliers) the two
  * scores ARE the two sides' quality signals.
  *
  * Arithmetic contract: scores live on an integer `scale` (default
  * 1e6). Each half-round is
  *   raw(v)  = Σ over in/out edges of the counterpart score,
  *   s(v)    = (raw(v) * scale) div max(raw)   (max-normalization),
  * all BIGINT ops — bit-exact in any engine; [[unrolledSqlCtes]]
  * generates the mirror with `//`. Overflow bound: raw ≤ maxdeg·scale,
  * and raw·scale must stay under 2^63 — at scale=1e6 that admits
  * degrees up to ~9·10⁶ (raise by lowering `scale`). The bound IS
  * checked at runtime: the max(raw) scalar each half-round already
  * fetches is exactly the quantity that must fit, so a free driver-side
  * guard fails loudly instead of silently wrapping BIGINT.
  *
  * Scale design (PageRank's): per iteration, one edges⨝scores shuffle
  * join + one agg per direction; each half-round's raw aggregate is
  * PERSISTED before the normalization scalar is taken, so the join+agg
  * executes once — the scalar action materializes the cache and the
  * returned plan reads it back (PageRank.scala's persist-then-scalar
  * pattern; without it every half-round ran its subtree twice). The
  * max is inlined as a literal — the SQL mirror cross-joins the same
  * 1-row CTE. Per-round score frames persist + lineage-truncate but
  * fill LAZILY: the next half-round's mx scalar is the only driver
  * action per half (one job, not two — the round-14 change), and every
  * handle releases only after a later action has pulled all its
  * consumers; loop-local persists drop on return and the result
  * registers in [[graft.Caches]].
  */
object Hits {

  /** `nodes`: one column `node`; `edges`: (`src`, `dst`), pre-deduped.
    * Returns (node, hub, auth) on the integer scale. */
  def scores(nodes: DataFrame, edges: DataFrame, iterations: Int,
             scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "scores: iterations must be >= 1")
    val ndOwned = nodes.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val nd = if (ndOwned) nodes.persist() else nodes
    val edOwned = edges.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val ed = if (edOwned) edges.persist() else edges
    require(ed.limit(1).count() > 0, "scores: empty edge set")

    val spark = nodes.sparkSession

    // Broadcast the NODE-SIZED side of every per-half-round join when
    // the node set is provably small (guide §3.1: the big edge table
    // then never shuffles inside the loop — previously each half-round
    // sort-merge-joined edges against a ≤|V|-row score frame, paying an
    // edge-table exchange+sort 2·iterations times). SCALE-GATED, not
    // unconditional: a web-scale graph's score frame cannot broadcast,
    // so past `graft.graph.broadcastScoresMaxRows` (default 4M rows ≈
    // 160 MB framed — well under the 8 GB broadcast cap) the original
    // shuffle plan stands. The count is one cheap driver action on the
    // persisted node frame; join strategy only, identical rows.
    val bcastMax = spark.conf.getOption("graft.graph.broadcastScoresMaxRows")
      .map(_.toLong).getOrElse(4000000L)
    val bc: DataFrame => DataFrame =
      if (nd.count() <= bcastMax) (df: DataFrame) => broadcast(df)
      else identity[DataFrame]

    // Lineage-truncate WITHOUT an eager count (the round-14 lazy
    // variant of Bpe.train's matFlat): the LogicalRDD rebuild hands
    // back a CONSTANT-DEPTH plan over the persisted RDD, and the cache
    // fills when the NEXT half-round's mx scalar (the one driver action
    // this loop cannot avoid) pulls it — one job per half-round instead
    // of two. Correctness hinges on RELEASE ORDER, not fill order: a
    // handle may only unpersist after an action has pulled every
    // consumer of its cache (otherwise the un-cached subtree re-runs
    // per consumer and the recompute chains exponentially).
    def matFlat(df: DataFrame): (DataFrame, DataFrame) = {
      val p = df.persist()
      (spark.createDataFrame(p.rdd, p.schema), p)
    }

    // raw handles pending release: raw_X feeds score_X, which
    // materializes during the NEXT half-round's mx action — so each mx
    // first releases the PREVIOUS half-round's raw (its score consumer
    // just filled) and then queues its own.
    var pendingRaw: List[DataFrame] = Nil
    def normalized(rawPlan: DataFrame): (DataFrame, DataFrame) = {
      val raw = rawPlan.persist()
      // 1-row scalar, inlined — the SQL mirror cross-joins its twin
      // CTE; this action also fills the previous half-round's score
      // cache (raw reads it), making that round's raw releasable
      val mx = raw.agg(greatest(max(col("raw")), lit(1L))).first().getLong(0)
      pendingRaw.foreach(_.unpersist(blocking = false))
      pendingRaw = List(raw)
      // overflow guard (free: mx is already on the driver): every raw
      // ≤ mx, so mx·scale < 2^63 ⇒ no product below can wrap
      require(mx <= Long.MaxValue / scale,
        s"scores: max(raw)=$mx overflows BIGINT at scale=$scale — " +
          s"lower `scale` (degree bound ~${Long.MaxValue / scale / scale})")
      // the nodes join looks skippable (absent ≡ 0, nothing re-injects
      // mass mid-loop) but measured SLOWER without it (17.2 s vs
      // 10.8 s at sf0.1): the join is what hands each round's cached
      // score frame balanced partitions — keep it. Under the broadcast
      // gate the stream side is the persisted node frame itself, whose
      // scan partitions are balanced by construction.
      matFlat(nd.select(col("node"))
        .join(bc(raw), Seq("node"), "left")
        .select(col("node"),
          coalesce(expr(s"(raw * ${scale}L) div ${mx}L"), lit(0L)).as("s")))
    }

    var (h, hP) = matFlat(nd.select(col("node"), lit(scale).as("s")))
    var a: DataFrame = null
    var aP: DataFrame = null
    var i = 0
    while (i < iterations) {
      val (aNext, aNextP) = normalized(
        ed.join(bc(h), ed("src") === h("node"))
          .groupBy(col("dst")).agg(sum(col("s")).as("raw"))
          .withColumnRenamed("dst", "node"))
      val (hNext, hNextP) = normalized(
        ed.join(bc(aNext.withColumnRenamed("s", "_a")),
            ed("dst") === aNext("node"))
          .groupBy(col("src")).agg(sum(col("_a")).as("raw"))
          .withColumnRenamed("src", "node"))
      if (aP != null) aP.unpersist(blocking = false)
      hP.unpersist(blocking = false)
      a = aNext; aP = aNextP; h = hNext; hP = hNextP
      i += 1
    }
    val out = h.select(col("node"), col("s").as("hub"))
      .join(bc(a.select(col("node"), col("s").as("auth"))), Seq("node"))
    val pinned = graft.Caches.persist(out)
    pinned.count() // fills the final h score cache (via its still-
    // pending raw) and the result — only now is everything releasable
    pendingRaw.foreach(_.unpersist(blocking = false))
    hP.unpersist(blocking = false)
    aP.unpersist(blocking = false)
    if (ndOwned) nd.unpersist(blocking = false)
    if (edOwned) ed.unpersist(blocking = false)
    pinned
  }

  /** SQL mirror of [[scores]], unrolled over caller CTEs `nodes(node)`
    * and `e(src, dst)`. Select `h$iterations` (hub) joined with
    * `a$iterations` (auth). MATERIALIZED per round — each score table
    * is referenced twice downstream. */
  def unrolledSqlCtes(iterations: Int, scale: Long = 1000000L): String = {
    (s"h0 AS MATERIALIZED (SELECT node, CAST($scale AS BIGINT) AS s FROM nodes)" +:
      (1 to iterations).map { k =>
        s"""ar$k AS MATERIALIZED (SELECT e.dst AS node, SUM(h${k - 1}.s) AS raw
           |        FROM e JOIN h${k - 1} ON e.src = h${k - 1}.node GROUP BY e.dst),
           |amx$k AS MATERIALIZED (SELECT GREATEST(MAX(raw), 1) AS mx FROM ar$k),
           |a$k AS MATERIALIZED (SELECT n.node,
           |        CAST(COALESCE((ar.raw * $scale) // amx.mx, 0) AS BIGINT) AS s
           |        FROM nodes n CROSS JOIN amx$k amx
           |        LEFT JOIN ar$k ar ON n.node = ar.node),
           |hr$k AS MATERIALIZED (SELECT e.src AS node, SUM(a$k.s) AS raw
           |        FROM e JOIN a$k ON e.dst = a$k.node GROUP BY e.src),
           |hmx$k AS MATERIALIZED (SELECT GREATEST(MAX(raw), 1) AS mx FROM hr$k),
           |h$k AS MATERIALIZED (SELECT n.node,
           |        CAST(COALESCE((hr.raw * $scale) // hmx.mx, 0) AS BIGINT) AS s
           |        FROM nodes n CROSS JOIN hmx$k hmx
           |        LEFT JOIN hr$k hr ON n.node = hr.node)""".stripMargin
      }).mkString(",\n")
  }
}
