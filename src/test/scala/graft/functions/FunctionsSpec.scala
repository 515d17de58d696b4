package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("wsTokens: blank → empty, whitespace runs collapse") {
    val df = Seq("  a  b\tc ", "", "   ").toDF("t")
      .select(TextFns.tokenCount(col("t")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 0, 0))
  }

  test("wordTokens lowercases and strips punctuation") {
    val toks = Seq("Hello, World! Héllo #2").toDF("t")
      .select(TextFns.wordTokens(col("t"))).as[Seq[String]].head()
    assert(toks == Seq("hello", "world", "héllo", "2"))
  }

  test("repetition signals: topElementCount, charSum, edge cases") {
    val df = Seq("a a a b", "x y z", "", "c c").toDF("t")
      .select(TextFns.wordTokens(col("t")).as("tk"))
      .select(TextFns.topElementCount(col("tk")).as("top"),
        TextFns.charSum(col("tk")).as("cs"),
        TextFns.charSum(array_distinct(col("tk"))).as("csd"))
    assert(df.as[(Long, Long, Long)].collect().toSeq ==
      Seq((3L, 4L, 2L), (1L, 3L, 3L), (0L, 0L, 0L), (2L, 2L, 1L)))
  }

  test("winnow guarantee: a shared w+k-1-token run yields a shared fingerprint") {
    // k=3, w=4 → any shared run of ≥ 6 tokens must contribute at least
    // one common fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03)
    def fps(texts: String*): Seq[Set[Long]] =
      texts.toDF("t")
        .select(HashFns.winnow(HashFns.shingleHashes(
          HashFns.wordShingleSeq(TextFns.wordTokens(col("t")), 3)), 4))
        .as[Seq[Long]].collect().toSeq.map(_.toSet)
    val Seq(a, b, c) = fps(
      "p1 p2 p3 p4 p5 aaa bbb ccc ddd eee fff",
      "x1 x2 x3 aaa bbb ccc ddd eee fff y1 y2",
      "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10")
    assert((a & b).nonEmpty, "6-token shared run must attest a fingerprint")
    assert((a & c).isEmpty && (b & c).isEmpty, "disjoint docs share nothing")
    // too short to attest: fewer than w hashes → EMPTY, not NULL
    assert(fps("t1 t2 t3 t4 t5").head.isEmpty)
  }

  test("graft_top_count ≡ topElementCount HOF (incl. empty and NULL)") {
    graft.functions.NativeFns.register(spark)
    val docs = Seq("a b a b a b c", "x", "", "q w e r t y q q w")
      .toDF("t")
      .select(TextFns.wordTokens(col("t")).as("tk"))
      .select(graft.functions.NativeFns.topCount(col("tk")).as("n"),
        TextFns.topElementCount(col("tk")).as("h"))
    docs.collect().foreach(r => assert(r.getLong(0) == r.getLong(1),
      "native/HOF top-count parity"))
    // NULL array → NULL both ways
    val nul = Seq(Option.empty[Seq[String]]).toDF("tk")
      .select(graft.functions.NativeFns.topCount(col("tk")).as("n"),
        TextFns.topElementCount(col("tk")).as("h"))
      .head()
    assert(nul.isNullAt(0) && nul.isNullAt(1))
  }

  test("graft_rep_stats ≡ composed wordShingleSeq/graft_top_count form") {
    graft.functions.NativeFns.register(spark)
    val N = graft.functions.NativeFns
    val H = graft.functions.HashFns
    val docs = Seq("a b a b a b c", "x", "", "q w e r t y q q w",
        "a a a a a", "x y x y x y x y", "one two", "one two three")
      .toDF("t")
      .select(TextFns.wordTokens(col("t")).as("tk"))
      .select(N.repStats(col("tk")).as("rs"),
        size(H.wordShingleSeq(col("tk"), 2)).cast("long").as("nb"),
        N.topCount(H.wordShingleSeq(col("tk"), 2)).as("tb"),
        size(H.wordShingleSeq(col("tk"), 3)).cast("long").as("nt"),
        N.topCount(H.wordShingleSeq(col("tk"), 3)).as("tt"))
    docs.collect().foreach { r =>
      val rs = r.getStruct(0)
      assert(rs.getLong(0) == r.getLong(1), "n_bigrams parity")
      assert(rs.getLong(1) == r.getLong(2), "top_bigram_cnt parity")
      assert(rs.getLong(2) == r.getLong(3), "n_trigrams parity")
      assert(rs.getLong(3) == r.getLong(4), "top_trigram_cnt parity")
    }
    // NULL array → NULL struct (TopRunCount's can't-attest rule)
    val nul = Seq(Option.empty[Seq[String]]).toDF("tk")
      .select(N.repStats(col("tk")).as("rs")).head()
    assert(nul.isNullAt(0))
  }

  test("dedupSegments: keep-first order-preserving intra-doc dedup") {
    // segment size 2: "a b | c d | a b | e f" → the repeated "a b" drops
    val rows = Seq(
      "a b c d a b e f",  // planted duplicate segment
      "x y x y x y",      // all-same: 3 segments → 1 kept
      "p q r",            // partial last segment, no dups
      "")                 // empty → (0, 0, "")
      .toDF("t")
      .select(TextFns.dedupSegments(TextFns.wordTokens(col("t")), 2).as("d"))
      .select(col("d.n_segments"), col("d.n_unique_segments"),
        col("d.text_dedup"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows(0) == ((4L, 3L, "a b c d e f")))
    assert(rows(1) == ((3L, 1L, "x y")))
    assert(rows(2) == ((2L, 2L, "p q r")))
    assert(rows(3) == ((0L, 0L, "")))
  }

  test("isRepetitive: duplicate-token and dominant-bigram gates, empty-safe") {
    val df = Seq(
      "a b a b a b a b",          // one bigram dominates → repetitive
      "a a a b b b c c c d d d",  // >half tokens are repeats → repetitive
      // diverse and long enough that a single bigram is < 20% (short
      // docs trip the dominance gate by construction — a 5-token doc
      // has 4 bigrams, so even top=1 is ≥ 20%; length gating is
      // isQuality's job, the two compose in the x31 stream gate)
      "one two three four five six seven eight nine ten",
      "").toDF("t")               // empty → clean (not a division crash)
      .select(TextFns.isRepetitive(TextFns.wordTokens(col("t"))))
    assert(df.as[Boolean].collect().toSeq == Seq(true, true, false, false))
  }

  test("maskPattern counts and replaces; chain stages compose") {
    val df = Seq("mail me at a.b@x.co and c@y.org or call 123456789")
      .toDF("t")
      .select(TextFns.maskPattern(col("t"),
        """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "[EMAIL]").as("m"))
      .select(col("m.n"), TextFns.maskPattern(col("m.masked"),
        "[0-9]{9,}", "[NUM]").as("m2"))
      .select(col("n"), col("m2.n").as("n2"), col("m2.masked"))
    val (ne, nn, masked) = df.as[(Long, Long, String)].head()
    assert(ne == 2L && nn == 1L)
    assert(masked == "mail me at [EMAIL] and [EMAIL] or call [NUM]")
  }

  test("langId votes stopwords with declared-order tie-break") {
    graft.functions.NativeFns.register(spark)
    val docs = Seq(
      "the cat and the dog is in a house",   // en
      "der hund und die katze ist nicht da", // de
      "le chat est dans la maison pour une", // fr
      "el perro es una casa para los gatos", // es
      "xyzzy plugh qwerty").toDF("t")        // und
    val df = docs.select(TextFns.langId(col("t")))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "fr", "es", "und"))
    // native set-probe form ≡ pure-HOF form (= langId default)
    val both = docs.select(TextFns.langIdNative(col("t")).as("n"),
      TextFns.langIdHof(col("t")).as("h")).collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1), "langId parity"))
  }

  test("bottomK aggregate: deterministic k-min-by-hash sample, merge-safe") {
    graft.functions.NativeFns.register(spark)
    val rnd = new scala.util.Random(5)
    val rows = (1 to 500).map(i => (s"g${i % 3}", rnd.nextInt(100000).toLong))
    val df = rows.toDF("g", "v").repartition(7) // force partial agg + merge
    def h(x: Long): Long = (997L * x + 13L) % 2147483647L
    val got = df.groupBy(col("g"))
      .agg(NativeFns.bottomK(col("v"), pmod(col("v") * 997 + 13,
        lit(2147483647L)), 4).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val expect = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).sortBy(x => (h(x), x)).take(4).toSeq).toMap
    assert(got == expect)
    // sample size caps at group size
    val tiny = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
      .groupBy(col("g")).agg(NativeFns.bottomK(col("v"), col("v"), 5).as("s"))
      .head().getSeq[Long](1)
    assert(tiny == Seq(1L, 2L))
  }

  test("bottomKDistinct: KMV sketch dedupes pairs; estimator in range") {
    graft.functions.NativeFns.register(spark)
    // 6 distinct values repeated 100× across 3 partitions: the dedup
    // sketch must collapse to the 6 distinct pairs through partial
    // merges, while the row-sample form fills to k with duplicates.
    val df = spark.range(0, 600).select(
      (col("id") % 6).as("v"),
      pmod((col("id") % 6) * 997 + 13, lit(2147483647L)).as("h"))
      .repartition(3)
    val dd = df.agg(NativeFns.bottomKDistinct(col("v"), col("h"), 10).as("s"))
      .head().getSeq[Long](0)
    assert(dd.toSet == (0L to 5L).toSet && dd.size == 6)
    val smp = df.agg(NativeFns.bottomK(col("v"), col("h"), 10).as("s"))
      .head().getSeq[Long](0)
    assert(smp.size == 10) // duplicates are legitimate in the row sample
    // KMV estimator over 10k distinct ids with the md5 oracle hash:
    // (k-1)·|H| / h_(k) within ±30% of the true cardinality
    val big = spark.range(0, 10000).select(col("id").as("v"),
      HashFns.md5Hash(col("id").cast("string")).as("h"))
    val sk = big.agg(NativeFns.bottomKDistinct(col("v"), col("h"), 64).as("s"))
      .head().getSeq[Long](0)
    assert(sk.size == 64)
    val hk = big.where(col("v") === sk.last).select(col("h")).as[Long].head()
    val est = 63L * HashFns.MersennePrime / hk
    assert(est > 7000 && est < 13000, s"KMV estimate $est out of range")
  }

  test("quality gate: short or digit-heavy text fails") {
    val df = Seq(
      ("a solid sentence with enough words here", true),
      ("too short", false),
      ("1234567 890123 456789 012345 678901 23", false))
      .toDF("t", "expected")
    val got = df.select(TextFns.isQuality(col("t")), col("expected"))
      .as[(Boolean, Boolean)].collect()
    got.foreach { case (g, e) => assert(g == e) }
  }

  test("fingerprint: whitespace-invariant, content-sensitive, in range") {
    val fps = Seq("hello  world", "hello world", "hello worlds")
      .toDF("t").select(TextFns.fingerprint(col("t"))).as[Long].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
    assert(fps.forall(f => f >= 0 && f < TextFns.FingerprintPrime))
  }

  test("mirrored fingerprint matches a driver-side md5 reference fold") {
    val texts = Seq("hello  world", "The quick brown Fox!", "", "a b c d e")
    val got = texts.toDF("t")
      .select(TextFns.fingerprintMirrored(col("t"))).as[Long].collect()
    // reference implementation of the identical fold in plain Scala
    val p = TextFns.FingerprintPrime
    def md5h(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % p
    }
    val expected = texts.map { t =>
      val toks = t.trim.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
      toks.foldLeft(0L)((acc, w) => (acc * 31 + md5h(w)) % p)
    }
    assert(got.toSeq == expected)
  }

  test("graft_simhash_hs rejects a non-literal bits argument cleanly") {
    import graft.functions.NativeFns
    NativeFns.register(spark)
    val df = Seq((Array(1L, 2L), 3)).toDF("hs", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function(NativeFns.SimHashHsName, col("hs"), col("b"))).collect()
    }
    assert(e.getMessage.contains("literal int"))
    // out-of-range literal also fails analysis, not evaluation
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function(NativeFns.SimHashHsName, col("hs"), lit(65))).collect()
    }
    assert(e2.getMessage.contains("bits must be a literal in [1, 64]"))
  }

  test("vector math: dot/norm/cosine on float arrays") {
    val df = Seq((Array(1f, 0f, 2f), Array(2f, 1f, 0f))).toDF("a", "b")
    val (d, na, c) = df.select(
      VectorFns.dot(col("a"), col("b")),
      VectorFns.norm2(col("a")),
      VectorFns.cosine(col("a"), col("a")))
      .as[(Double, Double, Double)].head()
    assert(d == 2.0 && math.abs(na - math.sqrt(5)) < 1e-12 && math.abs(c - 1.0) < 1e-12)
  }

  test("BPE-ish pre-tokenization goldens") {
    val toks = Seq("Hello, world! it's 42 degrees").toDF("t")
      .select(TextFns.bpeishTokens(col("t"))).as[Seq[String]].head()
    assert(toks == Seq("Hello", ",", " world", "!", " it", "'s", " 42", " degrees"))
    val counts = Seq("", "  spaced  out  ").toDF("t")
      .select(TextFns.bpeishTokenCount(col("t"))).as[Int].collect().toSeq
    assert(counts == Seq(0, 2))
  }

  test("native graft_dot ≡ HOF dot, across element types") {
    graft.functions.NativeFns.register(spark)
    val df = Seq((Array(1f, 2f, 3f), Array(0.5, -1.0, 2.0)))
      .toDF("f", "d")
    val (native, hof) = df.select(
      graft.functions.NativeFns.dot(col("f"), col("d")),
      VectorFns.dot(col("f"), col("d"))).as[(Double, Double)].head()
    assert(native == hof && native == 1.0 * 0.5 - 2.0 + 6.0)
    // int arrays too
    val i = Seq((Array(1, 2), Array(3L, 4L))).toDF("a", "b")
      .select(graft.functions.NativeFns.dot(col("a"), col("b"))).as[Double].head()
    assert(i == 11.0)
    // HOF parity on edge cases: mismatched lengths / null elements → NULL
    val mm = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(graft.functions.NativeFns.dot(col("a"), col("b")).as("n"),
        VectorFns.dot(col("a"), col("b")).as("h"))
      .head()
    assert(mm.isNullAt(0) && mm.isNullAt(1))
    val withNull = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
      .select(graft.functions.NativeFns.dot(col("a"), col("b"))).head()
    assert(withNull.isNullAt(0))
  }

  test("word shingles: distinct k-grams, short docs → empty") {
    val sh = Seq("a b c d", "a b").toDF("t")
      .select(HashFns.wordShingles(TextFns.wordTokens(col("t")), 3))
      .as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1).isEmpty)
  }

  test("minhash: identical sets → identical signatures; sentinel for empty") {
    val params = HashFns.hashParams(16, 42L)
    assert(params.forall { case (a, b) =>
      a >= 1 && a < HashFns.MersennePrime && b >= 0 && b < HashFns.MersennePrime })
    val df = Seq("x y z w", "x y z w", "totally different words here", "")
      .toDF("t")
      .select(HashFns.minhashSignature(
        HashFns.wordShingles(TextFns.wordTokens(col("t")), 2), params))
      .as[Seq[Long]].collect()
    assert(df(0) == df(1))
    assert(df(0) != df(2))
    assert(df(3).forall(_ == HashFns.MersennePrime))
  }

  test("simhash: near-identical token sets land within small hamming distance") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "the quick brown fox jumps over the lazy dog again and again tonight",
      "completely unrelated set of words about spark catalyst optimization")
      .toDF("t").select(HashFns.simhash64(TextFns.wordTokens(col("t"))).as("s"))
    val s = df.as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s(0), s(1)) < ham(s(0), s(2)))
  }

  test("bitChunks partition the sketch exactly") {
    val df = Seq(0x123456789abcdefL).toDF("s")
      .select(HashFns.bitChunks(col("s"), 4)).as[Seq[Long]].head()
    // 16-bit chunks, low to high
    assert(df == Seq(0xcdefL, 0x89abL, 0x4567L, 0x123L))
  }

  test("tokenChunks: coverage, overlap, tail length, empty doc") {
    def chunksOf(n: Int, window: Int, stride: Int) =
      Seq(Seq.tabulate(n)(i => s"t$i")).toDF("t")
        .select(TextFns.tokenChunks(col("t"), window, stride).as("c"))
        .select(explode(col("c")).as("e"))
        .select(col("e.chunk_idx"), col("e.chunk_len"), col("e.chunk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // 10 tokens, window 4, stride 3 → starts 0,3,6,9
    val got = chunksOf(10, 4, 3)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._2).toSeq == Seq(4L, 4L, 4L, 1L)) // tail is short
    assert(got(1)._3 == "t3 t4 t5 t6") // overlap: t3 also ends chunk 0
    assert(got(0)._3.endsWith("t3"))
    assert(got(3)._3 == "t9")
    // every token appears in >= 1 chunk
    val covered = got.flatMap(_._3.split(" ")).toSet
    assert(covered == (0 until 10).map(i => s"t$i").toSet)
    assert(chunksOf(0, 4, 3).isEmpty)
    // window == stride → disjoint exact partition
    assert(chunksOf(6, 3, 3).map(_._3).toSeq == Seq("t0 t1 t2", "t3 t4 t5"))
    intercept[IllegalArgumentException](
      Seq(Seq("a")).toDF("t").select(TextFns.tokenChunks(col("t"), 3, 4)))
  }

  test("canonicalizeUrl: normalization rules and the things that must NOT change") {
    def canon(url: String): String =
      Seq(url).toDF("u").select(TextFns.canonicalizeUrl(col("u")))
        .collect().head.getString(0)
    // case + default port + fragment + dot segments + query sort
    assert(canon("HtTpS://WWW.Ex.COM:443/a/./b/../c?z=9&a=1#frag")
      == "https://www.ex.com/a/c?a=1&z=9")
    assert(canon("HTTP://EX.COM:80/x") == "http://ex.com/x")
    // idempotent: canonicalizing a canonical URL is the identity
    val once = canon("https://ex.com/a/b?a=1&b=2")
    assert(canon(once) == once)
    // NOT stripped: non-default ports, https' :80, real path segments
    assert(canon("https://ex.com:80/a") == "https://ex.com:80/a")
    assert(canon("http://ex.com:8080/a") == "http://ex.com:8080/a")
    // empty path -> '/', queryless URLs gain no '?'
    assert(canon("https://ex.com") == "https://ex.com/")
    assert(canon("https://ex.com/a") == "https://ex.com/a")
    // trailing /. and /segment/.. collapse
    assert(canon("https://ex.com/a/b/..") == "https://ex.com/a/")
    assert(canon("https://ex.com/a/.") == "https://ex.com/a/")
    // RFC 3986 §5.2.4 over-pop: '..' stranded at the root is removed
    assert(canon("https://ex.com/a/../../b") == "https://ex.com/b")
    assert(canon("https://ex.com/a/../..") == "https://ex.com/")
    assert(canon("https://ex.com/a/b/../../../c") == "https://ex.com/c")
    // '..x' is a REAL segment name, not a dot segment
    assert(canon("https://ex.com/..x/y") == "https://ex.com/..x/y")
  }

  test("decodeHtmlEntities: five entities, &amp; decoded last") {
    def dec(s: String): String =
      Seq(s).toDF("t").select(TextFns.decodeHtmlEntities(col("t")))
        .collect().head.getString(0)
    assert(dec("Q&amp;A &lt;b&gt; it&#39;s &quot;ok&quot;")
      == "Q&A <b> it's \"ok\"")
    // double-encoded &amp;lt; must yield the literal entity, not '<'
    assert(dec("&amp;lt;") == "&lt;")
    assert(dec("plain text") == "plain text")
  }

  test("extractHtmlText: boilerplate blocks dropped, prose kept, entities decoded") {
    def ext(html: String): (Long, Long, String, Long) = {
      val r = Seq(html).toDF("h")
        .select(TextFns.extractHtmlText(col("h")).as("e"))
        .select(col("e.n_blocks"), col("e.n_kept"), col("e.extracted"),
          col("e.boiler_permille"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
    }
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    val html =
      "<html><head><title>t</title><style>.x{}</style>" +
        "<script>var a=1;</script></head><body>" +
        "<!-- comment stripped -->" +
        "<nav><a href=\"/a\">home</a> <a href=\"/b\">about</a></nav>" +
        s"<p>$prose see <a href=\"/m\">more</a></p>" +
        "<p>Q&amp;A &lt;b&gt; done properly here today</p>" +
        "<footer><a href=\"/t\">terms</a> <a href=\"/p\">privacy</a></footer>" +
        "</body></html>"
    val (nb, nk, extracted, bp) = ext(html)
    assert(nb == 5L) // nav, p, p, footer + trailing </body></html> residue
    assert(nk == 2L) // the two prose paragraphs
    assert(extracted == s"$prose see more\nQ&A <b> done properly here today")
    assert(bp > 0L && bp < 1000L)
    // a link-only block is dropped even when long (link density rule)
    val linky = "<div>" + (1 to 10).map(i =>
      s"<a href=\"/$i\">item number $i</a>").mkString(" ") + "</div>"
    assert(ext(s"<html><body>$linky</body></html>")._2 == 0L)
    // a short prose block (< 25 chars) is dropped by min length
    assert(ext("<html><body><p>too short</p></body></html>")._2 == 0L)
    // script/style/comment content never leaks into extracted text
    assert(!ext(html)._3.contains("var a=1"))
    assert(!ext(html)._3.contains("comment stripped"))
  }
}
