package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UnigramTokenizer closed-form behavior: Viterbi picks the
  * maximum-likelihood segmentation, single-char fallback keeps every
  * word segmentable, ties break toward the shorter final piece, and
  * the E-step recount conserves character mass. */
class UnigramTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("a frequent multi-char piece beats per-char segmentation") {
    // "abab" x 40: pieces "ab"/"abab"... dominate; "x" forces the
    // single-char floor into the vocab
    val d = docs(Seq.fill(40)("abab").mkString(" ") + " x")
    val w = UnigramTokenizer.wordCounts(d, "text")
    val p = UnigramTokenizer.pieceScores(w, minCount = 10)
    val seg = UnigramTokenizer.viterbi(w, p).collect()
      .map(s => s.word -> s).toMap
    // all of a, b, ab, aba, bab, abab >= 10 occurrences-weighted; the
    // single 4-char piece "abab" has the highest per-piece probability
    // and one piece always beats two of anything (log-probs < 0)
    assert(seg("abab").seg == "abab" && seg("abab").n_pieces == 1L)
  }

  test("words with rare substrings fall back to single-char pieces") {
    val d = docs((Seq.fill(30)("aa") :+ "zq").mkString(" "))
    val w = UnigramTokenizer.wordCounts(d, "text")
    val p = UnigramTokenizer.pieceScores(w, minCount = 10)
    val seg = UnigramTokenizer.viterbi(w, p).collect()
      .map(s => s.word -> s).toMap
    // "zq" occurs once (< minCount) so only 'z','q' singles exist
    assert(seg("zq").seg == "z|q" && seg("zq").n_pieces == 2L)
  }

  test("best score is the sum of chosen piece scores (exact integers)") {
    val d = docs(Seq.fill(25)("ab ab cd").mkString(" "))
    val w = UnigramTokenizer.wordCounts(d, "text")
    val p = UnigramTokenizer.pieceScores(w, minCount = 10)
    val scores = p.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val seg = UnigramTokenizer.viterbi(w, p).collect()
    seg.foreach { s =>
      val total = s.seg.split("\\|").map(scores).sum
      assert(total == s.best_micro,
        s"${s.word}: pieces sum $total != dp ${s.best_micro}")
    }
  }

  test("recount conserves character mass and zeroes unused pieces") {
    val d = docs(Seq.fill(40)("abab cd").mkString(" "))
    val w = UnigramTokenizer.wordCounts(d, "text")
    val p = UnigramTokenizer.pieceScores(w, minCount = 10)
    val seg = UnigramTokenizer.viterbi(w, p)
    val rc = UnigramTokenizer.recount(seg)
    val charMass = rc.select(sum(length(col("piece")) * col("viterbi_cnt")))
      .head().getLong(0)
    val wordMass = w.select(sum(length(col("word")) * col("wcount")))
      .head().getLong(0)
    assert(charMass == wordMass,
      s"every char of every word is covered exactly once: $charMass vs $wordMass")
    // pieces on no Viterbi path are absent from the recount
    val used = rc.select(col("piece")).collect().map(_.getString(0)).toSet
    assert(!used.contains("ba"), "straddling piece 'ba' is never chosen")
  }

  test("greedy takes the longest piece at each cursor") {
    val d = docs(Seq.fill(40)("abab").mkString(" ") + " x")
    val w = UnigramTokenizer.wordCounts(d, "text")
    val p = UnigramTokenizer.pieceScores(w, minCount = 10)
    val g = UnigramTokenizer.greedy(w, p).collect().map(s => s.word -> s).toMap
    assert(g("abab").greedy_seg == "abab" && g("abab").greedy_pieces == 1L)
  }

  test("greedy never beats Viterbi and the regret is exact") {
    // craft a greedy trap: long prefix piece forces a worse tail. Corpus
    // of "aab" with frequent "aa": greedy eats "aa" then lone "b";
    // Viterbi may prefer the same or a|ab — either way the invariant
    // greedy_micro <= best_micro must hold word by word, and both
    // totals must equal their piece-score sums.
    val d = docs((Seq.fill(30)("aab") ++ Seq.fill(20)("ab")).mkString(" "))
    val w = UnigramTokenizer.wordCounts(d, "text")
    val p = UnigramTokenizer.pieceScores(w, minCount = 10)
    val scores = p.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val vit = UnigramTokenizer.viterbi(w, p).collect()
      .map(s => s.word -> s.best_micro).toMap
    UnigramTokenizer.greedy(w, p).collect().foreach { s =>
      assert(s.greedy_micro <= vit(s.word),
        s"${s.word}: greedy ${s.greedy_micro} beats dp ${vit(s.word)}")
      val total = s.greedy_seg.split("\\|").map(scores).sum
      assert(total == s.greedy_micro,
        s"${s.word}: pieces sum $total != greedy ${s.greedy_micro}")
    }
  }

  test("greedy covers every character exactly once") {
    val d = docs(Seq.fill(25)("abcde abc").mkString(" "))
    val w = UnigramTokenizer.wordCounts(d, "text")
    val p = UnigramTokenizer.pieceScores(w, minCount = 10)
    UnigramTokenizer.greedy(w, p).collect().foreach { s =>
      assert(s.greedy_seg.replace("|", "") == s.word,
        s"${s.word}: segmentation ${s.greedy_seg} must spell the word")
    }
  }
}
