package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity (Newman & Girvan 2004) of a node partition over an
  * undirected graph — the QUALITY witness for [[LabelProp]]'s
  * communities (the q144/q149 recall-audit idea applied to graph
  * clustering): Q = Σ_c (e_c/m − (d_c/2m)²), where e_c is the
  * intra-community edge count, d_c the community's degree sum, and m
  * the total edge count. Q near 0 means the partition is no better
  * than random wiring; Q ≳ 0.3 is the conventional "real community
  * structure" bar.
  *
  * Arithmetic contract: e_c, d_c, m and the derived Σd_c² are exact
  * BIGINT sufficient statistics; the single Q scaling runs through
  * DOUBLE in the same association in both engines (the q203/q197
  * discipline): q_milli = floor(1000·(4m·Σe_c − Σd_c²) / (4m²)).
  * Exactness bound: Σd_c² ≤ 4m² must fit a BIGINT, so m ≲ 1.5·10⁹
  * edges — beyond that, pre-scale degrees (documented, not silent).
  *
  * Scale design: one edges⨝labels hash join (two key-partitioned
  * probes) for the intra count, one endpoint-union aggregation for the
  * degree sums — no windows, no driver loops; the final combine is a
  * 1×1 cross join. Communities with zero incident edges contribute
  * nothing to Q and are not counted in `n_comm`.
  */
object Modularity {

  /** `labels`: (`node`, `label`); `edges`: (`src`, `dst`) undirected,
    * pre-deduped, endpoints present in `labels`. One row:
    * (m_edges, n_comm, intra_edges, sum_deg_sq, q_milli). */
  def newmanQ(labels: DataFrame, edges: DataFrame): DataFrame = {
    val lab = labels.select(col("node"), col("label"))
    val tagged = edges
      .join(lab.select(col("node").as("src"), col("label").as("_ls")), "src")
      .join(lab.select(col("node").as("dst"), col("label").as("_ld")), "dst")
    val mIntra = tagged.agg(
      count(lit(1)).cast("long").as("m_edges"),
      sum(when(col("_ls") === col("_ld"), 1L).otherwise(0L))
        .cast("long").as("intra_edges"))
    val degByComm = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .join(lab, "node")
      .groupBy(col("label")).agg(count(lit(1)).cast("long").as("d_c"))
    val commStats = degByComm.agg(
      count(lit(1)).cast("long").as("n_comm"),
      sum(col("d_c") * col("d_c")).cast("long").as("sum_deg_sq"))
    // m_edges = 0 guard: an empty edge input would otherwise divide
    // 0/0 → NaN, and CAST(floor(NaN)) diverges between engines (Spark
    // nulls, DuckDB errors). Q of an empty graph is defined here as 0,
    // deterministically, in both the expr and [[sqlCtes]].
    mIntra.crossJoin(commStats) // 1×1
      .select(col("m_edges"), col("n_comm"), col("intra_edges"),
        col("sum_deg_sq"),
        expr("""CASE WHEN m_edges = 0 THEN CAST(0 AS BIGINT)
          | ELSE CAST(floor(1000.0 *
          | (4.0 * CAST(m_edges AS DOUBLE) * CAST(intra_edges AS DOUBLE)
          |  - CAST(sum_deg_sq AS DOUBLE))
          | / (4.0 * CAST(m_edges AS DOUBLE) * CAST(m_edges AS DOUBLE)))
          | AS BIGINT) END""".stripMargin.replace("\n", " ")).as("q_milli"))
  }

  /** SQL mirror of [[newmanQ]] as CTEs over caller-supplied
    * `lab(node, label)` and `ed(src, dst)`. Select
    * `m_edges, n_comm, intra_edges, sum_deg_sq, q_milli` from `modq`. */
  def sqlCtes: String =
    """mi AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges,
      |              CAST(SUM(CASE WHEN ls.label = ld.label THEN 1 ELSE 0 END)
      |                   AS BIGINT) AS intra_edges
      |       FROM ed JOIN lab ls ON ed.src = ls.node
      |               JOIN lab ld ON ed.dst = ld.node),
      |dc AS (SELECT l.label, CAST(COUNT(*) AS BIGINT) AS d_c
      |       FROM (SELECT src AS node FROM ed
      |             UNION ALL SELECT dst FROM ed) p
      |       JOIN lab l ON p.node = l.node GROUP BY l.label),
      |cs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_comm,
      |              CAST(SUM(d_c * d_c) AS BIGINT) AS sum_deg_sq FROM dc),
      |modq AS (SELECT m_edges, n_comm, intra_edges, sum_deg_sq,
      |  CASE WHEN m_edges = 0 THEN CAST(0 AS BIGINT)
      |  ELSE CAST(floor(1000.0 *
      |    (4.0 * CAST(m_edges AS DOUBLE) * CAST(intra_edges AS DOUBLE)
      |     - CAST(sum_deg_sq AS DOUBLE))
      |    / (4.0 * CAST(m_edges AS DOUBLE) * CAST(m_edges AS DOUBLE)))
      |    AS BIGINT) END AS q_milli
      |  FROM mi CROSS JOIN cs)""".stripMargin
}
