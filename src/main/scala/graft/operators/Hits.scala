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
  * degrees up to ~9·10⁶ (raise by lowering `scale`; the contract is
  * checked nowhere at runtime because degree is data — document at the
  * call site).
  *
  * Scale design (PageRank's): per iteration, one edges⨝scores shuffle
  * join + one agg per direction; the normalization max is a 1-row
  * driver scalar per half-round (inlined as a literal — the SQL mirror
  * cross-joins the same 1-row CTE); per-round frames persist +
  * materialize so lineage stays constant-depth; loop-local persists
  * drop on return and the result registers in [[graft.Caches]].
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

    def normalized(raw: DataFrame): DataFrame = {
      // 1-row scalar, inlined — the SQL mirror cross-joins its twin CTE
      val mx = raw.agg(greatest(max(col("raw")), lit(1L))).first().getLong(0)
      nd.select(col("node"))
        .join(raw, Seq("node"), "left")
        .select(col("node"),
          coalesce(expr(s"(raw * ${scale}L) div ${mx}L"), lit(0L)).as("s"))
    }

    var h = nd.select(col("node"), lit(scale).as("s")).persist()
    var a: DataFrame = null
    var i = 0
    while (i < iterations) {
      // persist WITHOUT an eager count: the very next normalization
      // scalar (the mx action inside normalized()) materializes the
      // cache, so an explicit count would only add a job per
      // half-round — 8 extra scheduler round-trips per run on a plan
      // whose depth is already bounded by the fixed iteration count
      val aNext = normalized(
        ed.join(h, ed("src") === h("node"))
          .groupBy(col("dst")).agg(sum(col("s")).as("raw"))
          .withColumnRenamed("dst", "node")).persist()
      val hNext = normalized(
        ed.join(aNext.withColumnRenamed("s", "_a"),
            ed("dst") === aNext("node"))
          .groupBy(col("src")).agg(sum(col("_a")).as("raw"))
          .withColumnRenamed("src", "node")).persist()
      if (a != null) a.unpersist(blocking = false)
      h.unpersist(blocking = false)
      a = aNext; h = hNext
      i += 1
    }
    val out = h.select(col("node"), col("s").as("hub"))
      .join(a.select(col("node"), col("s").as("auth")), Seq("node"))
    val pinned = graft.Caches.persist(out)
    pinned.count()
    h.unpersist(blocking = false)
    a.unpersist(blocking = false)
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
