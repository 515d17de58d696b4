package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form tests for the q165–q169 operator batch: funnel
  * exists-chain semantics, association-rule metrics, CDC latest-wins
  * merge, and the data-quality suite. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- Funnel ------------------------------------------------------
  // user 1: view@0, click@5, purchase@8  → full depth (horizons 10, 10)
  // user 2: view@0, click@50             → click outside horizon, depth 1
  // user 3: click@5 only                 → no view, not in output
  // user 4: view@0, purchase@3           → no click, depth 1
  private val funnelEvents = Seq(
    (1L, 0L, "view"), (1L, 5L, "click"), (1L, 8L, "purchase"),
    (2L, 0L, "view"), (2L, 50L, "click"),
    (3L, 5L, "click"),
    (4L, 0L, "view"), (4L, 3L, "purchase"))
    .toDF("user_id", "ts", "event_type")

  test("funnel: exists-chain depths, horizons, and missing step 1") {
    val out = Funnel.existsChain(funnelEvents,
        Seq("view", "click", "purchase"), Seq(10L, 10L))
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // (user, n_step1, n_step2, n_step3, depth)
    assert(out == Seq((1L, 1L, 1L, 1L, 3L), (2L, 1L, 0L, 0L, 1L),
      (4L, 1L, 0L, 0L, 1L)))
  }

  test("funnel: a click before any view never qualifies") {
    val ev = Seq((1L, 5L, "click"), (1L, 10L, "view"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.existsChain(ev, Seq("view", "click"), Seq(100L))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 0L))) // view counted, click not qualified
  }

  // --- AssocRules --------------------------------------------------
  // baskets: {1,2,3}, {1,2}, {1,3}, {2} → pair (1,2) n=2, (1,3) n=2,
  // (2,3) n=1; item counts 1→3, 2→3, 3→2; N=4
  private val baskets = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L),
    (11L, 1L), (11L, 2L),
    (12L, 1L), (12L, 3L),
    (13L, 2L))
    .toDF("bk", "it")

  test("assoc rules: support, confidence, and lift are exact integers") {
    val out = AssocRules.pairRules(baskets, "bk", "it", minSupport = 2L)
      .orderBy(col("item_a"), col("item_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    // (1,2): pair 2, cnt 3/3, conf both 2000/3=666, lift 2*4*1e6/9=888888
    // (1,3): pair 2, cnt 3/2, conf 666 / 1000, lift 8e6/6=1333333
    assert(out == Seq(
      (1L, 2L, 2L, 3L, 3L, 666L, 666L, 888888L),
      (1L, 3L, 2L, 3L, 2L, 666L, 1000L, 1333333L)))
  }

  test("assoc rules: duplicate basket lines collapse before pairing") {
    val dup = baskets.union(Seq((10L, 1L), (10L, 1L)).toDF("bk", "it"))
    val a = AssocRules.pairRules(dup, "bk", "it", 2L).orderBy("item_a", "item_b")
    val b = AssocRules.pairRules(baskets, "bk", "it", 2L).orderBy("item_a", "item_b")
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  // --- CdcMerge ----------------------------------------------------
  private val snap = Seq((1L, 100L), (2L, 200L), (3L, 300L))
    .toDF("k", "price")
  private val chg = Seq(
    (2L, 1L, "U", 250L),  // update existing
    (3L, 1L, "D", -1L),   // delete existing
    (4L, 1L, "I", 400L),  // insert new
    (5L, 1L, "U", 500L),  // upsert missing key
    (2L, 2L, "D", -1L),   // later delete beats the seq-1 update
    (3L, 2L, "I", 350L))  // later re-insert beats the seq-1 delete
    .toDF("k", "seq", "op", "price")

  test("cdc merge: latest-wins apply with upsert + delete semantics") {
    val out = CdcMerge.latestWins(snap, chg, "k", "seq", "op", Seq("price"))
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 100L, "base"), (3L, 350L, "I"),
      (4L, 400L, "I"), (5L, 500L, "U")))
  }

  // --- DataQuality -------------------------------------------------
  test("data quality: each constraint counts violations exactly") {
    val t = Seq((1L, "a", 5.0), (1L, "", 60.0), (2L, null, 7.0))
      .toDF("id", "name", "v")
    val parent = Seq(1L).toDF("pid")
    val rows = DataQuality.suite(Seq(
        DataQuality.unique("u", "t", t, "id"),
        DataQuality.complete("c", "t", t, "name"),
        DataQuality.inRange("r", "t", t, "v", 0, 50),
        DataQuality.referential("f", "t", t, "id", parent, "pid"),
        DataQuality.inSet("s", "t", t, "name", Seq("a", "")))
      ).orderBy(col("check_name")).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(rows == Seq(
      ("c", 3L, 2L, 0L),  // "" and null incomplete
      ("f", 3L, 1L, 0L),  // id=2 orphaned
      ("r", 3L, 1L, 0L),  // 60 out of range
      ("s", 3L, 1L, 0L),  // null not in set
      ("u", 3L, 1L, 0L))) // duplicate id=1
  }

  test("data quality: an empty audited table passes with 0 violations") {
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "name", "v")
    val rows = DataQuality.suite(Seq(
        DataQuality.complete("c", "t", empty, "name"),
        DataQuality.inRange("r", "t", empty, "v", 0, 50),
        DataQuality.unique("u", "t", empty, "id"))
      ).orderBy(col("check_name")).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // violations must be 0 (not NULL) and pass must be 1 over zero rows
    assert(rows == Seq(("c", 0L, 0L, 1L), ("r", 0L, 0L, 1L), ("u", 0L, 0L, 1L)))
  }

  test("data quality: an empty suite is rejected, not vacuously passed") {
    intercept[IllegalArgumentException] { DataQuality.suite(Seq.empty) }
  }

  test("assoc rules: lift survives counts whose BIGINT product would overflow") {
    // pair_n * n_baskets * 1e6 with n_baskets ~ 3e9 overflows BIGINT
    // (~9.2e18); the DOUBLE association must still yield the exact
    // floor. Closed form: floor(2e9 * 3e9 * 1e6 / (2.5e9 * 2.6e9)).
    val lift = spark.sql(
      """SELECT CAST(floor((CAST(2000000000 AS DOUBLE) * CAST(3000000000 AS DOUBLE)
        |                    * 1000000.0)
        |                 / (CAST(2500000000 AS DOUBLE) * CAST(2600000000 AS DOUBLE)))
        |       AS BIGINT) AS lift_micro""".stripMargin)
      .head().getLong(0)
    assert(lift == 923076L, s"exact floor of 6e24/6.5e18: $lift")
  }
}
