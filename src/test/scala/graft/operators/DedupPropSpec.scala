package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant tests for the dedup family over randomized corpora with
  * planted duplicates (deterministic seeds). */
class DedupPropSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, n: Int, dupEvery: Int) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    (1 to n).map { i =>
      val text =
        if (i % dupEvery == 0 && i > dupEvery)
          // exact duplicate of an earlier doc
          (1 to 12).map(j => vocab(new scala.util.Random(seed + i - dupEvery + j).nextInt(vocab.size))).mkString(" ")
        else
          (1 to 12).map(j => vocab(new scala.util.Random(seed + i + j).nextInt(vocab.size))).mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  private def invariants(res: Map[Long, Long], ids: Seq[Long]): Unit = {
    assert(res.keySet == ids.toSet, "one keeper row per input doc")
    res.foreach { case (id, keep) => assert(keep <= id, s"keeper $keep > id $id") }
    // a keeper must itself map to a keeper ≤ itself that exists
    res.values.foreach(k => assert(res.contains(k)))
  }

  test("minhash/simhash/ngram keepers: total, monotone, closed") {
    val df = corpus(11, 60, 7)
    val ids = (1L to 60L)
    for (res <- Seq(
      Dedup.minhashLsh(df, "doc_id", "text", tauNum = 1, tauDenom = 2),
      Dedup.simhash(df, "doc_id", "text"),
      Dedup.ngramJaccard(df, "doc_id", "text", 3, 1, 2))) {
      invariants(res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, ids)
    }
  }

  test("exact dedup: keeper is min id of its text group; counts consistent") {
    val df = corpus(23, 80, 5)
    val res = Dedup.exact(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(res.length == 80)
    val byKeep = res.groupBy(_._2)
    byKeep.foreach { case (keep, members) =>
      assert(members.map(_._1).min == keep, "keeper is the min id")
      assert(members.forall(_._3 == members.length), "n_copies = group size")
    }
    // idempotence: deduping the survivors finds no further duplicates
    val survivors = df.join(
      Dedup.exact(df, "doc_id", "text").where(col("doc_id") === col("keep_id"))
        .select("doc_id"), Seq("doc_id"))
    val again = Dedup.exact(survivors, "doc_id", "text")
    assert(again.where(col("n_copies") > 1).count() == 0)
  }

  test("native sketch expressions ≡ HOF forms over randomized corpora") {
    import graft.functions.{HashFns, NativeFns, TextFns}
    NativeFns.register(spark)
    val df = corpus(47, 120, 9)
    val params = HashFns.hashParams(32, seed = 99L)
    val rows = df
      .withColumn("_toks", TextFns.wordTokens(col("text")))
      .withColumn("_hs", HashFns.shingleHashes(HashFns.wordShingles(col("_toks"), 2)))
      .select(
        HashFns.minhashFromHashes(col("_hs"), params).as("mh_hof"),
        NativeFns.minhash(col("_hs"), params).as("mh_nat"),
        HashFns.simhash64(col("_toks")).as("sh_hof"),
        NativeFns.simhash(col("_toks")).as("sh_nat"),
        TextFns.tokenHits(col("_toks"), Seq("alpha", "gamma", "mu")).cast("long").as("th_hof"),
        NativeFns.tokensInSet(col("_toks"), Seq("alpha", "gamma", "mu")).as("th_nat"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "minhash parity")
      assert(r.getLong(2) == r.getLong(3), "simhash parity")
      assert(r.getLong(4) == r.getLong(5), "tokensInSet parity")
    }
  }

  test("transitive keeper ≡ driver-side union-find over random pair graphs") {
    for (seed <- Seq(5, 17, 29)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val ids = (1L to n).toDF("id")
      val rawPairs = Seq.fill(25) {
        val x = rnd.nextInt(n) + 1L; val y = rnd.nextInt(n) + 1L
        (math.min(x, y), math.max(x, y))
      }.filter(p => p._1 != p._2).distinct
      val got = Dedup.keeperTransitiveFromPairs(ids, "id", rawPairs.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: classic union-find with path compression
      val parent = scala.collection.mutable.Map((1L to n).map(i => i -> i): _*)
      def find(x: Long): Long = {
        if (parent(x) != x) parent(x) = find(parent(x)); parent(x)
      }
      rawPairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (1L to n).map(i => i -> find(i)).toMap
      assert(got == expected, s"seed $seed")
      // idempotence: the keeper map is its own fixpoint
      got.foreach { case (id, keep) => assert(got(keep) == keep, s"seed $seed") }
    }
  }

  test("every exact duplicate is caught by every near-dup method") {
    val df = corpus(31, 50, 6)
    val exactGroups = Dedup.exact(df, "doc_id", "text")
      .where(col("doc_id") =!= col("keep_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assume(exactGroups.nonEmpty)
    for (method <- Seq(
      Dedup.minhashLsh(df, "doc_id", "text", tauNum = 9, tauDenom = 10),
      Dedup.simhash(df, "doc_id", "text", maxHamming = 0),
      Dedup.ngramJaccard(df, "doc_id", "text", 3, 99, 100))) {
      val res = method.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exactGroups.keys.foreach { dup =>
        assert(res(dup) < dup, s"exact duplicate $dup not linked by ${res(dup)}")
      }
    }
  }
}
