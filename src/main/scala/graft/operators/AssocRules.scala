package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association-rule mining (Agrawal & Srikant 1994,
  * pairwise/2-itemset form) — the co-occurrence analytics member next
  * to the co-purchase graph projections (q158): for every item pair
  * appearing together in ≥ minSupport baskets, emit support,
  * directional confidence, and lift.
  *
  * Rule metrics are deterministic integers: confidence in milli-units
  * via cross-multiplied floor division (pair·1000 DIV item — both
  * operands comfortably in BIGINT), lift in micro-units via DOUBLE
  * (floor((pair·N·10⁶)/(cntA·cntB)) with every operand cast to DOUBLE
  * in the same association on both engines — the BIGINT numerator
  * pair·N·10⁶ would overflow at ~1e9-basket scale, where Spark
  * (non-ANSI) wraps silently while DuckDB raises; IEEE
  * multiply/divide/floor is bit-deterministic, so parity holds).
  *
  * Scale design: baskets are deduplicated to DISTINCT (basket, item)
  * first (one hash shuffle); the pair generation is a self-join on the
  * basket key, whose fanout is C(basket size, 2) — bounded by the
  * basket-size cap of the data model (TPC-H lineitem ≤ 7 lines/order),
  * never corpus-quadratic. Pair counting is one (itemA,itemB) hash agg;
  * item counts attach by two item-keyed joins (broadcastable when the
  * item dimension is small, plain hash joins otherwise). The basket
  * count N is a 1-row aggregate broadcast via cross join.
  */
object AssocRules {

  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val items = baskets.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val n = items.agg(countDistinct(col("bk")).cast("long").as("n_baskets"))
    val icnt = items.groupBy(col("it"))
      .agg(count(lit(1)).cast("long").as("c"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("item_a"), col("b.it").as("item_b"))
      .agg(count(lit(1)).cast("long").as("pair_n"))
      .where(col("pair_n") >= minSupport)
    pairs
      .join(icnt.withColumnRenamed("it", "item_a").withColumnRenamed("c", "cnt_a"), "item_a")
      .join(icnt.withColumnRenamed("it", "item_b").withColumnRenamed("c", "cnt_b"), "item_b")
      .crossJoin(n)
      .select(col("item_a"), col("item_b"), col("pair_n"),
        col("cnt_a"), col("cnt_b"),
        expr("pair_n * 1000 DIV cnt_a").cast("long").as("conf_ab_milli"),
        expr("pair_n * 1000 DIV cnt_b").cast("long").as("conf_ba_milli"),
        floor((col("pair_n").cast("double") * col("n_baskets").cast("double")
            * lit(1000000.0))
          / (col("cnt_a").cast("double") * col("cnt_b").cast("double")))
          .cast("long").as("lift_micro"))
  }
}
