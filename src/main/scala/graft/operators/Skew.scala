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

  /** Hybrid skew join: the hot-key probe drives the plan — keys whose
    * sampled frequency extrapolates past `hotThreshold` rows take the
    * salted path (spread over `saltFactor` reducers, right side
    * replicated per salt), everything else takes the plain shuffle
    * join. Salting costs `saltFactor`× replication of the right rows it
    * touches, so paying it ONLY for the keys that need it is the right
    * trade at scale: a uniform table degenerates to the plain join plus
    * one broadcast semi/anti split, a skewed one caps its largest
    * reducer at ~hotCount/saltFactor.
    *
    * Result ≡ plain inner join (both paths are inner joins on `key`;
    * the hot/cold split is a disjoint partition of the left rows). The
    * probe is deterministic (seeded sample).
    */
  def autoSaltedJoin(left: DataFrame, right: DataFrame, key: String,
                     saltFactor: Int = 16, hotThreshold: Long = 1000000L,
                     sampleFraction: Double = 0.01,
                     seed: Long = 17L): DataFrame = {
    require(sampleFraction > 0 && sampleFraction <= 1, "sampleFraction in (0,1]")
    val hot = broadcast(
      left.sample(withReplacement = false, sampleFraction, seed)
        .groupBy(col(key)).agg(count(lit(1)).as("_c"))
        .where(col("_c") >= lit(hotThreshold.toDouble * sampleFraction))
        .select(col(key)))
    val cold = left.join(hot, Seq(key), "left_anti")
      .join(right, Seq(key), "inner")
    val salted = saltedInnerJoin(
      left.join(hot, Seq(key), "left_semi"),
      right.join(hot, Seq(key), "left_semi"), key, saltFactor)
    cold.union(salted.select(cold.columns.toIndexedSeq.map(col): _*))
  }
}
