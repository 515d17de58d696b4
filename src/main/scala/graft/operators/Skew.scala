package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers for 100-TB-scale shuffles.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one side has a few pathological hot
  * keys and the other side is small enough to replicate per salt.
  */
object Skew {

  /** Salted inner equi-join: the (large, skewed) `left` gets a random
    * salt in [0, saltFactor); the (smaller) `right` is replicated once
    * per salt value. The shuffle then spreads each hot key over
    * `saltFactor` reducers. Semantics are exactly the plain inner join.
    *
    * `rand` here is seeded per-partition by Spark — determinism of the
    * JOIN RESULT is unaffected (the salt only routes rows).
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      saltFactor: Int = 16): DataFrame = {
    val salted = left.withColumn("_salt",
      (rand(7L) * saltFactor).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Key-frequency probe: the top-n heaviest join keys with counts —
    * run this on a sample to decide whether salting is warranted. */
  def hotKeys(df: DataFrame, key: String, n: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key)).limit(n)
}
