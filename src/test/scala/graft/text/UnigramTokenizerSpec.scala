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
}
