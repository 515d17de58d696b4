package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    (3L, "spark catalyst optimizes logical plans into physical plans with rules"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (5L, "completely different text about training data curation at scale now"),
  ).toDF("doc_id", "text")

  test("exact dedup assigns min-id keeper and copy counts") {
    val res = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(res(1L) == ((1L, 2L)) && res(4L) == ((1L, 2L)))
    assert(res(2L) == ((2L, 1L)) && res(3L) == ((3L, 1L)) && res(5L) == ((5L, 1L)))
  }

  test("exactSurvivors keeps one min-id row per distinct text, text intact") {
    val res = Dedup.exactSurvivors(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res.size == 4)                  // 5 docs, one exact dup pair
    assert(res.contains(1L) && !res.contains(4L), "min id 1 survives its dup 4")
    assert(res.keySet == Set(1L, 2L, 3L, 5L))
  }

  test("minhash LSH finds planted near-dups and exact dups") {
    val res = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleK = 3, numBands = 8, rowsPerBand = 2, tauNum = 1, tauDenom = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(4L) == 1L)           // exact dup always caught
    assert(res(2L) == 1L)           // near-dup (jaccard ~0.71 ≥ 0.5)
    assert(res(3L) == 3L && res(5L) == 5L)
    assert(res.size == 5)
  }

  test("minhash LSH with SQL-mirrored hashes finds the same planted dups") {
    val res = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleK = 3, numBands = 8, rowsPerBand = 2, tauNum = 1, tauDenom = 2,
        sqlMirroredHashes = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(4L) == 1L && res(2L) == 1L)
    assert(res(3L) == 3L && res(5L) == 5L)
  }

  test("ngram Jaccard dedup: exact threshold arithmetic") {
    // doc1/doc2: 11 trigram shingles each, 10 shared → J = 10/12 ≈ 0.833
    val at80 = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 4, 5) // τ=0.8
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at80(2L) == 1L && at80(4L) == 1L)
    val at90 = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 9, 10) // τ=0.9
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at90(2L) == 2L, "J=10/12 < 0.9 → not a dup")
    assert(at90(4L) == 1L, "exact dup J=1 survives any τ")
  }

  test("ngram Jaccard: production cap ≡ uncapped every-collision at test scale") {
    // q27's registered form runs maxPostings = 1000 mirrored in its
    // oracle; this is the every-collision witness that moved out of the
    // registry in round 9 — at sf0.001 no shingle's posting list
    // exceeds the cap, so the capped plan provably drops nothing and
    // the capped oracle still checks every collision.
    val d = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val capped = Dedup.ngramJaccard(d, "doc_id", "text", 3, 1, 2,
      maxPostings = 1000).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uncapped = Dedup.ngramJaccard(d, "doc_id", "text", 3, 1, 2,
      maxPostings = Int.MaxValue).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == uncapped)
    assert(capped.exists { case (id, keep) => id != keep }, "witness needs real dups")
  }

  test("simhash dedup links exact dups, keeps distinct docs apart") {
    val res = Dedup.simhash(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(4L) == 1L)
    assert(res(3L) == 3L && res(5L) == 5L)
  }

  test("simhash with SQL-mirrored hashes: same exact-dup linking, 60-bit domain") {
    import graft.functions.{HashFns, NativeFns, TextFns}
    val res = Dedup.simhash(docs, "doc_id", "text", maxHamming = 3,
        maxBucket = Int.MaxValue, sqlMirroredHashes = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(4L) == 1L)
    assert(res(3L) == 3L && res(5L) == 5L)
    // the mirrored sketch stays within the 60-bit md5-prefix domain
    NativeFns.register(spark)
    val sketches = docs.select(
      NativeFns.simhashFromHashes(
        HashFns.shingleHashesWith(TextFns.wordTokens(col("text")),
          HashFns.md5Hash60), Dedup.MirroredSimhashBits).as("sk"))
      .collect().map(_.getLong(0))
    assert(sketches.forall(s => s >= 0 && s < (1L << Dedup.MirroredSimhashBits)))
    // identical texts → identical sketches; disjoint-vocab texts differ
    assert(sketches(0) == sketches(3))
    assert(sketches(0) != sketches(2))
  }

  test("native simhash-from-hashes is bit-identical to the HOF fold") {
    import graft.functions.{HashFns, NativeFns, TextFns}
    NativeFns.register(spark)
    val bits = Dedup.MirroredSimhashBits
    val both = docs
      .withColumn("_hs", HashFns.shingleHashesWith(
        TextFns.wordTokens(col("text")), HashFns.md5Hash60))
      .select(
        HashFns.simhashFromHashesHof(col("_hs"), bits).as("hof"),
        NativeFns.simhashFromHashes(col("_hs"), bits).as("native"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), "simhash_hs parity"))
    // empty input → 0 sketch in both forms
    val empty = Seq(Tuple1("")).toDF("text")
      .withColumn("_hs", HashFns.shingleHashesWith(
        TextFns.wordTokens(col("text")), HashFns.md5Hash60))
      .select(HashFns.simhashFromHashesHof(col("_hs"), bits).as("hof"),
        NativeFns.simhashFromHashes(col("_hs"), bits).as("native"))
      .head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
  }

  test("embedding cosine dedup links identical vectors") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0.99f, 0.14f, 0f, 0f)), (4L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val res = Dedup.embeddingCosine(vecs, "vec_id", "embedding", tau = 0.95,
        planes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(2L) == 1L)          // identical
    assert(res(4L) == 4L)          // orthogonal
  }

  test("native sketch expressions are bit-identical to the HOF forms") {
    import graft.functions.{HashFns, NativeFns, TextFns}
    NativeFns.register(spark)
    val params = HashFns.hashParams(16, seed = 42L)
    val withBoth = docs
      .withColumn("_toks", TextFns.wordTokens(col("text")))
      .withColumn("_hs", HashFns.shingleHashes(
        HashFns.wordShingles(col("_toks"), 3)))
      .select(
        HashFns.minhashFromHashes(col("_hs"), params).as("mh_hof"),
        NativeFns.minhash(col("_hs"), params).as("mh_native"),
        HashFns.simhash64(col("_toks")).as("sh_hof"),
        NativeFns.simhash(col("_toks")).as("sh_native"))
      .collect()
    withBoth.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "minhash parity")
      assert(r.getLong(2) == r.getLong(3), "simhash parity")
    }
    // empty-input sentinel parity: no shingles → Mersenne prime slots
    val empty = Seq(Tuple1("ab")).toDF("text") // 1 token < k → no shingles
      .withColumn("_hs", HashFns.shingleHashes(
        HashFns.wordShingles(TextFns.wordTokens(col("text")), 3)))
      .select(NativeFns.minhash(col("_hs"), params).as("mh"))
      .head().getSeq[Long](0)
    assert(empty.forall(_ == HashFns.MersennePrime))
  }

  test("exact cosine dedup: all-pairs threshold keeper") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0.99f, 0.14f, 0f, 0f)), (4L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val res = Dedup.embeddingCosineExact(vecs, "vec_id", "embedding", tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(2L) == 1L && res(3L) == 1L) // cos(1,3) ≈ 0.990 ≥ 0.95
    assert(res(4L) == 4L)
    // exact variant ⊇ LSH variant: every LSH-found pair is exact-found
    val lsh = Dedup.embeddingCosine(vecs, "vec_id", "embedding", tau = 0.95,
        planes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lsh.foreach { case (id, keep) =>
      if (keep != id) assert(res(id) != id, s"LSH pair $id→$keep missed by exact")
    }
  }

  test("semanticDedup links only within a cell; cap silences quadratic cells") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0L), (2L, Array(1f, 0f, 0f, 0f), 0L),
      (3L, Array(0.99f, 0.14f, 0f, 0f), 1L), // near-dup of 1 but other cell
      (4L, Array(0f, 1f, 0f, 0f), 0L))
      .toDF("vec_id", "embedding", "cell")
    val res = Dedup.semanticDedup(vecs, "vec_id", "embedding", "cell",
        tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(2L) == 1L, "in-cell identical pair collapses")
    assert(res(3L) == 3L, "cross-cell near-dup is invisible (SemDeDup trade)")
    assert(res(4L) == 4L, "in-cell orthogonal pair survives")
    // cap: cell 0 has 3 members — maxBucket=2 drops the whole cell's pairs
    val capped = Dedup.semanticDedup(vecs, "vec_id", "embedding", "cell",
        tau = 0.95, maxBucket = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped.values.toSet == Set(1L, 2L, 3L, 4L) && capped(2L) == 2L)
  }

  test("null/empty/blank texts survive every dedup method as self-keepers") {
    val dirty = Seq(
      (1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
      (4L, "real text with enough words to shingle cleanly here"),
      (5L, "real text with enough words to shingle cleanly here"))
      .toDF("doc_id", "text")
    for ((name, res) <- Seq(
      "exact" -> Dedup.exact(dirty, "doc_id", "text"),
      "minhash" -> Dedup.minhashLsh(dirty, "doc_id", "text"),
      "minhash-mirror" -> Dedup.minhashLsh(dirty, "doc_id", "text",
        sqlMirroredHashes = true),
      "simhash" -> Dedup.simhash(dirty, "doc_id", "text"),
      "simhash-mirror" -> Dedup.simhash(dirty, "doc_id", "text",
        sqlMirroredHashes = true),
      "ngram" -> Dedup.ngramJaccard(dirty, "doc_id", "text"))) {
      val m = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m.keySet == Set(1L, 2L, 3L, 4L, 5L),
        s"$name lost rows: ${m.keySet}")
      assert(m(5L) == 4L, s"$name missed the exact dup pair")
      // a doc with no tokens must never be merged into a real group by
      // the all-sentinel/zero-sketch degenerate signature alone — except
      // with each other, which exact dedup does for identical strings
      assert(m(1L) == 1L, s"$name merged the null row into ${m(1L)}")
      assert(m(4L) == 4L, s"$name gave the real doc a degenerate keeper")
    }
  }

  test("keeperFromPairs: min partner wins, singletons self-map") {
    val ids = Seq(1L, 2L, 3L, 4L).toDF("id")
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("a", "b")
    val res = Dedup.keeperFromPairs(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L))
  }

  test("keeperTransitiveFromPairs: chains collapse where single-hop does not") {
    val ids = (1L to 7L).toDF("id")
    // chain 1~2~3~4 (no direct 1~3, 1~4, 2~4 edges) + pair 5~6
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val trans = Dedup.keeperTransitiveFromPairs(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(trans == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    // the single-hop policy leaves the chain split — the documented
    // divergence the transitive operator exists to remove
    val hop = Dedup.keeperFromPairs(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hop(4L) == 3L && trans(4L) == 1L)
    // empty pair set → identity map, converges in one round
    val none = Dedup.keeperTransitiveFromPairs(ids, "id",
        Seq.empty[(Long, Long)].toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(none == (1L to 7L).map(i => i -> i).toMap)
  }
}
