package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns via
  * higher-order functions (`zip_with` + `aggregate`) — no UDF, no
  * driver-side collect. Accumulation is left-to-right in double
  * precision, so results are deterministic for a given array order. */
object VectorFns {

  def toDoubles(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubles(a), toDoubles(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubles(a), toDoubles(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** L2-normalized copy (zero vector maps to itself).
    *
    * Both the double-cast array and the norm are lambda-bound: an
    * interpreted `transform` re-evaluates every expression its lambda
    * references once PER ELEMENT, so an unbound norm turns the
    * normalize into O(dim²) interpreted evals per row (measured as
    * ~4.5 s of the KMeans featurize path at sf0.1 before binding —
    * dominating every operator that normalizes). */
  def l2Normalize(a: Column): Column =
    ExprUtils.bind(toDoubles(a)) { ad =>
      ExprUtils.bind(sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))) { n =>
        when(n === 0.0, ad).otherwise(transform(ad, x => x / n))
      }
    }
}
