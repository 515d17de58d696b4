package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heaps'-law vocabulary-growth audit — V(N) ≈ K·N^β: how fast new
  * vocabulary appears as the corpus grows in a fixed ingest order. The
  * growth-curve companion of q209's Zipf tail and q218's Chao1: Chao1
  * asks "how much vocabulary is left", this asks "at what rate does
  * more data keep buying new types" — the curve a dataset-scaling
  * decision reads (β ≈ 0.5 for natural text; β drifting up flags
  * synthetic/templated inflow, down flags saturation).
  *
  * Scale design: token counts and first-occurrence histograms are hash
  * aggregations; BOTH running sums (tokens seen, types seen) ride
  * [[Relational.scalableCumSum]] — the bucketed-histogram prefix sum,
  * never a corpus-wide single-task window. The β fit runs on the
  * `points` sampled prefixes only: ln values floored to exact micro
  * integers per point (the q209 per-term ln discipline), OLS sufficient
  * statistics exact BIGINT, one final double division. */
object VocabGrowth {

  /** Growth table at `points` evenly-spaced document-count prefixes
    * (in `idCol` order) + the fitted β. Output per point: (point,
    * docs_prefix, n_tokens, v_types, x_micro = floor(10⁶·ln N),
    * y_micro = floor(10⁶·ln V), beta_micro). */
  def heapsFit(docs: DataFrame, idCol: String, tokensCol: String,
               points: Int = 10): DataFrame = {
    require(points >= 2, s"heapsFit: points=$points")
    val perDoc = docs.select(col(idCol), size(col(tokensCol)).cast("long")
      .as("_nt"))
    val firstOcc = docs
      .select(col(idCol).as("_d"), explode(col(tokensCol)).as("_tok"))
      .groupBy(col("_tok")).agg(min(col("_d")).as("_fd"))
      .groupBy(col("_fd")).agg(count(lit(1)).cast("long").as("_newt"))
    val c1 = Relational.scalableCumSum(perDoc, idCol, idCol, "_nt",
      cumName = "n_tokens", rankName = "_r")
    val c2 = Relational.scalableCumSum(
      c1.join(firstOcc, col(idCol) === col("_fd"), "left")
        .na.fill(0L, Seq("_newt")).drop("_fd"),
      idCol, idCol, "_newt", cumName = "v_types", rankName = "_r2")
    val nDocs = perDoc.agg(count(lit(1)).cast("long").as("_n"))
    val sampled = c2.crossJoin(broadcast(nDocs))
      .withColumn("_step", expr(s"GREATEST(_n DIV $points, 1)"))
      .where(expr(s"_r % _step = 0 AND _r DIV _step <= $points") &&
        col("n_tokens") >= 1L && col("v_types") >= 1L)
      .select(expr("_r DIV _step").cast("long").as("point"),
        col("_r").cast("long").as("docs_prefix"),
        col("n_tokens").cast("long"), col("v_types").cast("long"),
        expr("CAST(floor(1000000.0 * ln(CAST(n_tokens AS DOUBLE)))" +
          " AS BIGINT)").as("x_micro"),
        expr("CAST(floor(1000000.0 * ln(CAST(v_types AS DOUBLE)))" +
          " AS BIGINT)").as("y_micro"))
    val sP = graft.Caches.persist(sampled)
    val fit = sP.agg(count(lit(1)).cast("long").as("_fn"),
        sum(col("x_micro")).cast("long").as("_sx"),
        sum(col("y_micro")).cast("long").as("_sy"),
        sum(col("x_micro") * col("y_micro")).cast("long").as("_sxy"),
        sum(col("x_micro") * col("x_micro")).cast("long").as("_sxx"))
      // ratio FIRST, then the 10⁶ scale: num and den stay under 2⁵³ so
      // their double conversions are exact and an exactly-linear growth
      // table reads beta_micro = 1000000 exactly (scaling num by 10⁶
      // before dividing rounds past 2⁵³ and can read 999999)
      .select(expr("""CAST(CASE WHEN _fn * _sxx - _sx * _sx > 0
             |THEN floor(1000000.0 * (CAST(_fn * _sxy - _sx * _sy AS DOUBLE)
             |     / CAST(_fn * _sxx - _sx * _sx AS DOUBLE)))
             |ELSE 0 END AS BIGINT)""".stripMargin.replace("\n", " "))
        .as("beta_micro"))
    sP.crossJoin(broadcast(fit))
  }
}
