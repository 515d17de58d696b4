package graft.plans

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** The custom sort-merge as-of physical operator must agree with the
  * compositional form (equi-join + θ-filter + rank window) on every
  * input, and its plan must be exchange+sort+merge — no window, no
  * pair materialization. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lefts = Seq(
    // (id, key, t)
    (1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 50L),
    (4L, 20L, 100L), (5L, 30L, 100L), (6L, 40L, 100L))
    .toDF("event_id", "k", "t")
  private lazy val rights = Seq(
    // (oid, key, ot): key 10 has a history incl. a tie at 100;
    // key 20 only later rows; key 40 absent
    (101L, 10L, 90L), (102L, 10L, 100L), (103L, 10L, 100L), (104L, 10L, 200L),
    (201L, 20L, 150L), (301L, 30L, 100L))
    .toDF("order_id", "rk", "ot")

  test("as-of exec: latest at-or-before, tie-break by id, inner semantics") {
    val res = AsOf.latest(lefts, rights, "k", "rk", "t", "ot", Seq("order_id"))
      .select(col("event_id"), col("order_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(
      1L -> 103L, // t=100, key 10: history 90,100,100 → tie at 100 → max id
      2L -> 104L, // t=205, key 10: latest ≤ 205 is 200
      5L -> 301L  // t=100, key 30: exact boundary (ot == t) matches
      // event 3 (t=50 < all of key 10's history), event 4 (key 20's only
      // order is later), event 6 (key 40 absent) → dropped (inner as-of)
    ))
  }

  test("as-of exec ≡ compositional window form on events⋈orders") {
    val d = sf("sf0.001")
    val e = graft.sources.Tables.events(spark, d)
      .withColumn("_t", expr("ts DIV 1000000"))
    val o = spark.read.parquet(s"$d/orders.parquet")
      .withColumn("_ot", unix_millis(col("o_orderdate").cast("timestamp")))
    val native = AsOf.latest(e, o, "user_id", "o_custkey", "_t", "_ot",
        Seq("o_orderkey"))
      .select(col("event_id"), col("o_orderkey"), col("_ot").as("ord_ms"))
    val window = Relational.asOfLatest(
        e.drop("_t"), o.drop("_ot"), "user_id", "o_custkey",
        expr("ts DIV 1000000"), unix_millis(col("o_orderdate").cast("timestamp")),
        "event_id", "o_orderkey")
      .select(col("event_id"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ord_ms"))
    val n = native.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = window.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(n.nonEmpty && n == w)
  }

  test("as-of exec plans as exchange+sort+merge without a Window") {
    val native = AsOf.latest(lefts, rights, "k", "rk", "t", "ot", Seq("order_id"))
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"),
      s"custom exec missing from plan:\n$plan")
    assert(!plan.contains("Window"), "as-of exec must not plan a window")
  }

  test("AsOfFilterPushdown: left filters reach the scan, right filters stay") {
    val d = sf("sf0.001")
    val e = graft.sources.Tables.events(spark, d)
      .withColumn("_t", expr("ts DIV 1000000"))
    val o = spark.read.parquet(s"$d/orders.parquet")
      .withColumn("_ot", unix_millis(col("o_orderdate").cast("timestamp")))
    val joined = AsOf.latest(e, o, "user_id", "o_custkey", "_t", "_ot",
      Seq("o_orderkey"))

    // left-only predicate: must cross the custom node and land in the
    // parquet scan's pushed filters
    val leftFiltered = joined.where(col("event_id") <= 100L)
    val planL = leftFiltered.queryExecution.executedPlan.toString
    assert(planL.contains("PushedFilters: [IsNotNull(event_id), LessThanOrEqual(event_id,100)]")
        || planL.contains("LessThanOrEqual(event_id,100)"),
      s"left filter must reach the events scan:\n$planL")
    // and semantics are filter-after-join ≡ filter-before-join here
    val expect = joined.collect().filter(_.getAs[Long]("event_id") <= 100L)
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("o_orderkey"))).toSet
    val got = leftFiltered.collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("o_orderkey"))).toSet
    assert(got == expect && got.nonEmpty)

    // right-side predicate: must NOT be pushed below the join (it
    // filters the matched result, not the candidate history)
    val rightFiltered = joined.where(col("o_orderkey") =!= 1L)
    val opt = rightFiltered.queryExecution.optimizedPlan
    val joinNode = opt.collectFirst { case j: AsOfJoinNode => j }.get
    val rightFilters = joinNode.right.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(!rightFilters.exists(_.condition.toString.contains("o_orderkey")),
      s"right side must stay unfiltered, got: $rightFilters")
    val planR = rightFiltered.queryExecution.executedPlan.toString
    assert(!planR.contains("PushedFilters: [IsNotNull(o_orderkey), Not(EqualTo(o_orderkey,1))]"),
      s"right filter must not reach the orders scan:\n$planR")
  }
}
