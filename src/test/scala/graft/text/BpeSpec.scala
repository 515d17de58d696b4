package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpe merges most frequent pair first and composes hierarchically") {
    val words = Seq(("abab", 2L), ("ab", 1L)).toDF("w", "c")
    val merges = Bpe.train(words, "w", "c", numMerges = 2)
    // <a><b>: 2×2 + 1 = 5; <b><a>: 2. Round 1 then sees <ab><ab> in abab.
    assert(merges == Seq(Bpe.Merge(0, "<a><b>", 5L), Bpe.Merge(1, "<ab><ab>", 2L)))
  }

  test("bpe tie on count breaks lexicographically on the wrapped pair") {
    val words = Seq(("ab", 1L), ("ba", 1L)).toDF("w", "c")
    val merges = Bpe.train(words, "w", "c", numMerges = 1)
    assert(merges == Seq(Bpe.Merge(0, "<a><b>", 1L)))
  }

  test("bpe stops early when every word is a single symbol") {
    val words = Seq(("aa", 3L)).toDF("w", "c")
    val merges = Bpe.train(words, "w", "c", numMerges = 5)
    assert(merges == Seq(Bpe.Merge(0, "<a><a>", 3L)), "exhausts after one merge")
  }

  test("applyMerges replays training order; single-char and empty words survive") {
    val words = Seq(("abab", 2L), ("ab", 1L)).toDF("w", "c")
    val merges = Bpe.train(words, "w", "c", numMerges = 2)
    val applied = Seq("abab", "ab", "ba", "a", "")
      .toDF("w").select(col("w"), Bpe.applyMerges(col("w"), merges).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(applied("abab") == "<abab>")  // ab+ab merged, then the pair of abs
    assert(applied("ab") == "<ab>")
    assert(applied("ba") == "<b><a>")   // untouched: (b,a) never learned
    assert(applied("a") == "<a>" && applied("") == "")
  }

  test("merge replacement is left-to-right non-overlapping (BPE rule)") {
    // aaa with merge (a,a): simultaneous left-to-right gives <aa><a>
    val merges = Seq(Bpe.Merge(0, "<a><a>", 1L))
    val out = Seq("aaa").toDF("w")
      .select(Bpe.applyMerges(col("w"), merges)).head().getString(0)
    assert(out == "<aa><a>")
  }
}
