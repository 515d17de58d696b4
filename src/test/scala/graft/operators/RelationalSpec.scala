package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Per-operator tests mirroring the reference's
  * `tests/test_import_data.py` golden style: tiny literal inputs,
  * exact expected outputs. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val comments = Seq(
    // (id, author, subreddit, created_utc, body)
    ("c1", "alice", "AskReddit", 100, "hello"),
    ("c2", "alice", "aww", 110, "cute"),
    ("c3", "bob", "AskReddit", 120, "hi"),
    ("c4", "[deleted]", "aww", 130, "[removed]"),
    ("c5", "carol", "u_spammer", 140, "buy"),
    ("c6", "bob", "aww", 150, "nice"),
    ("c7", "dave", "NBA", 160, "dunk"),
  ).toDF("id", "author", "subreddit", "created_utc", "body")

  test("P1 regex filter keeps matches; complement drops them") {
    val kept = Relational.filterRegex(comments, "subreddit", "^u_.*")
    assert(kept.select("id").as[String].collect().toSet == Set("c5"))
    val dropped = Relational.filterRegex(comments, "subreddit", "^u_.*", keep = false)
    assert(dropped.count() == 6 && !dropped.select("subreddit").as[String]
      .collect().exists(_.startsWith("u_")))
  }

  test("P2/P3 sentinel filters") {
    assert(Relational.filterNotEqual(comments, "author", "[deleted]").count() == 6)
    assert(Relational.filterNotIn(comments, "body", Seq("[removed]", "[deleted]"))
      .count() == 6)
  }

  test("P4 range filter is strictly exclusive, bounds optional") {
    val df = Relational.filterRangeExclusive(comments, "created_utc", Some(100L), Some(150L))
    assert(df.select("id").as[String].collect().toSet == Set("c2", "c3", "c4", "c5"))
    assert(Relational.filterRangeExclusive(comments, "created_utc", None, None).count() == 7)
    assert(Relational.filterRangeExclusive(comments, "created_utc", Some(150L), None)
      .select("id").as[String].collect().toSet == Set("c7"))
  }

  test("A1 top-N: count desc, key asc tie-break, limit") {
    val top2 = Relational.topNByCount(comments, "subreddit", 2)
    // AskReddit=2, aww=3, NBA=1, u_spammer=1 → aww(3), AskReddit(2)
    assert(top2.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("aww", 3L), ("AskReddit", 2L)))
    // tie-break: all four with limit 4 → ties NBA/u_spammer sorted asc
    val top4 = Relational.topNByCount(comments, "subreddit", 4)
    assert(top4.collect().map(_.getString(0)).toSeq ==
      Seq("aww", "AskReddit", "NBA", "u_spammer"))
  }

  test("J1 semi-join never duplicates rows") {
    val dim = Seq("AskReddit", "aww", "AskReddit").toDF("subreddit")
    val semi = Relational.semiJoin(comments, dim, "subreddit")
    assert(semi.count() == 5) // c1,c2,c3,c4,c6 — no duplication from dup dim rows
  }

  test("A2 group-concat is sorted and counted") {
    val agg = Relational.groupConcat(comments, "author", "subreddit",
      "subreddit_concat", "context_length")
    val rows = agg.collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows("alice") == ("AskReddit aww", 2L))
    assert(rows("bob") == ("AskReddit aww", 2L))
    assert(rows("carol") == ("u_spammer", 1L))
  }

  test("W1 percentile exclusion: scalable impl ≡ literal global-window impl") {
    val counts = Seq(("a", 1L), ("b", 2L), ("c", 2L), ("d", 3L), ("e", 5L),
      ("f", 8L), ("g", 13L), ("h", 21L), ("i", 21L), ("j", 100L))
      .toDF("author", "cnt")
    for (pct <- Seq(0.05, 0.1, 0.3, 0.5)) {
      val fast = Relational.excludeTopPercentByCount(counts, "cnt", pct)
        .select("author").as[String].collect().toSet
      val literal = Relational.excludeTopPercentByCountGlobalWindow(counts, "cnt", pct)
        .select("author").as[String].collect().toSet
      assert(fast == literal, s"pct=$pct")
    }
    // pct=0.1: drop top 10% → percent_rank of j is 1.0 > 0.9; i,h share
    // rank 7/9 ≈ 0.777 → survive
    val kept = Relational.excludeTopPercentByCount(counts, "cnt", 0.1)
      .select("author").as[String].collect().toSet
    assert(kept == Set("a", "b", "c", "d", "e", "f", "g", "h", "i"))
  }

  test("W1 ties at the cutoff live or die together") {
    val counts = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 3L)).toDF("k", "cnt")
    // percent_rank: a=0, b=1/3, c=d=2/3. cutoff 0.5 → c,d both dropped
    val kept = Relational.excludeTopPercentByCount(counts, "cnt", 0.5)
      .select("k").as[String].collect().toSet
    assert(kept == Set("a", "b"))
  }

  test("J3+P7 join with time delta") {
    val subs = Seq(("s1", 100), ("s2", 200)).toDF("sid", "sub_utc")
    val coms = Seq(("c1", "s1", 150), ("c2", "s1", 500), ("c3", "s2", 210))
      .toDF("cid", "link", "com_utc")
    val joined = Relational.joinWithTimeDelta(subs, coms, "sid", "link",
      col("sub_utc"), col("com_utc"), "delta")
    val deltas = joined.select("cid", "delta").as[(String, Int)].collect().toMap
    assert(deltas == Map("c1" -> 50, "c2" -> 400, "c3" -> 10))
    // composite with P4: the reference's 72h-window decomposition
    val windowed = Relational.filterRangeExclusive(joined, "delta", Some(20L), Some(450L))
    assert(windowed.select("cid").as[String].collect().toSet == Set("c1", "c2"))
  }

  test("A7 thread-doc concatenates in (order, text) sorted order") {
    val joined = Seq(
      ("s1", "sub1", 100, "late"), ("s1", "sub1", 10, "first"),
      ("s1", "sub1", 50, "mid"), ("s2", "sub2", 5, "only"))
      .toDF("sid", "subreddit", "delta", "body")
    val docs = Relational.threadDoc(joined, "sid", Seq("subreddit"), "delta", "body")
    val m = docs.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(m == Map("s1" -> "first mid late", "s2" -> "only"))
  }

  test("sessionize splits on gap and aggregates per session") {
    val ev = Seq((1L, 10L, 1000L), (1L, 11L, 2000L), (1L, 12L, 99000L),
      (2L, 13L, 500L)).toDF("user_id", "event_id", "ms")
    val sessions = Relational.sessionize(ev, "user_id", col("ms"), "event_id", 10000L)
      .orderBy("user_id", "session_seq").collect()
    assert(sessions.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("exactPercentiles ≡ naive sorted-position oracle on random data") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 2000).map(_ =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(40).toLong)) // heavy duplication
    val ps = Seq(10, 25, 50, 75, 90)
    val got = Relational.exactPercentiles(rows.toDF("g", "v"), "g", col("v"), ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getLong(i + 1))).toMap
    val expect = rows.groupBy(_._1).view.mapValues { g =>
      val sorted = g.map(_._2).sorted
      ps.map(p => sorted(((p * sorted.size + 99) / 100 - 1).max(0)))
    }.toMap
    assert(got == expect)
  }

  test("exactPercentiles: discrete value at ceil(p·n/100), duplicates counted") {
    // group a: n=5 sorted [10,10,20,30,40] → p25 rank ceil(1.25)=2 → 10,
    // p50 rank 3 → 20, p75 rank ceil(3.75)=4 → 30
    // group b: n=2 sorted [7,9] → p25 rank 1 → 7, p50 rank 1 → 7, p75 rank 2 → 9
    val df = Seq(("a", 30L), ("a", 10L), ("a", 40L), ("a", 20L), ("a", 10L),
      ("b", 9L), ("b", 7L)).toDF("g", "v")
    val got = Relational.exactPercentiles(df, "g", col("v"), Seq(25, 50, 75))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("a", 10L, 20L, 30L), ("b", 7L, 7L, 9L)))
  }

  test("rangeJoinBucketed ≡ nested-loop semantics incl. bin boundaries") {
    val rnd = new scala.util.Random(31)
    val xs = (1 to 300).map(i => (i.toLong, rnd.nextInt(5000).toLong))
    val l = xs.toDF("lid", "lt")
    val r = xs.map { case (i, t) => (i + 1000L, t) }.toDF("rid", "rt")
    val w = 100L
    val got = Relational.rangeJoinBucketed(l, r, col("lt"), col("rt"), w)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val expect = (for {
      (li, lt) <- xs; (ri0, rt) <- xs
      if math.abs(lt - rt) <= w
    } yield (li, ri0 + 1000L)).toSet
    assert(got == expect && got.nonEmpty)
    // exact-boundary pair in adjacent bins must survive
    val lb = Seq((1L, 199L)).toDF("lid", "lt") // bin 1
    val rb = Seq((2L, 299L)).toDF("rid", "rt") // bin 2, delta == w
    assert(Relational.rangeJoinBucketed(lb, rb, col("lt"), col("rt"), 100L)
      .count() == 1)
  }

  test("scd2 collapses repeats, opens on change (incl. NULL transitions)") {
    // key 1 stream: A, A (collapse), NULL (open: A→NULL), NULL (collapse:
    // NULL<=>NULL no change), B (open: NULL→B)
    val df = Seq(
      (1L, 10L, 1L, Option("A")), (1L, 20L, 2L, Option("A")),
      (1L, 30L, 3L, Option.empty[String]), (1L, 40L, 4L, Option.empty[String]),
      (1L, 50L, 5L, Option("B")),
      (2L, 5L, 1L, Option("X")))
      .toDF("k", "ts", "seq", "attr")
    val got = Relational.scd2(df, Seq("k"), col("ts"), col("seq"), Seq("attr"))
      .select("k", "ts", "attr", "valid_from", "valid_to", "is_current")
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5))).toSeq
    assert(got == Seq(
      (1L, 10L, Some("A"), 10L, Some(30L), false),
      (1L, 30L, None, 30L, Some(50L), false),
      (1L, 50L, Some("B"), 50L, None, true),
      (2L, 5L, Some("X"), 5L, None, true)))
  }

  test("scd2 tie order + reserved-column guard") {
    // same ts: seq decides which row opens the version (tie column)
    val tied = Seq((1L, 10L, 1L, "A"), (1L, 10L, 2L, "B"), (1L, 10L, 3L, "B"))
      .toDF("k", "ts", "seq", "attr")
    val got = Relational.scd2(tied, Seq("k"), col("ts"), col("seq"), Seq("attr"))
      .select("seq", "attr", "is_current").orderBy("seq")
      .as[(Long, String, Boolean)].collect().toSeq
    // seq 1 opens A, seq 2 opens B, seq 3 collapses into it
    assert(got == Seq((1L, "A", false), (2L, "B", true)))
    // input columns clashing with reserved output names must be refused
    val clash = Seq((1L, 10L, 1L, "A", true)).toDF("k", "ts", "seq", "attr", "is_current")
    val e = intercept[IllegalArgumentException] {
      Relational.scd2(clash, Seq("k"), col("ts"), col("seq"), Seq("attr"))
    }
    assert(e.getMessage.contains("is_current"))
  }

  test("as-of join picks the latest right row at-or-before left ts") {
    val left = Seq((1L, 100L, "L1"), (1L, 50L, "L2"), (2L, 10L, "L3"))
      .toDF("k", "lts", "lid")
    val right = Seq((1L, 90L, "R1"), (1L, 100L, "R2"), (1L, 20L, "R3"),
      (2L, 11L, "R4")).toDF("k", "rts", "rid")
    val res = Relational.asOfLatest(left, right, "k", "k",
        col("lts"), col("rts"), "lid", "rid")
      .select("lid", "rid").as[(String, String)].collect().toMap
    assert(res == Map("L1" -> "R2", "L2" -> "R3")) // L3: no event ≤ 10 → dropped
  }
}
