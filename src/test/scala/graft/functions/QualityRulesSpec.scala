package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Closed-form witnesses for the Gopher-rule primitives (q115) and the
  * PII redaction pass (q116) — hand-computed expectations on crafted
  * strings, independent of the DuckDB oracle. */
class QualityRulesSpec extends SparkSpec {

  private def one(text: String): Row = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextFns.wordTokens(col("text")).as("t"), col("text"))
      .select(
        size(col("t")).cast("long").as("n_words"),
        TextFns.charSum(col("t")).as("n_word_chars"),
        TextFns.symbolCount(col("text")).as("n_sym"),
        TextFns.alphaWordCount(col("t")).as("n_alpha_words"),
        TextFns.stopwordDistinctCount(col("t")).as("n_stop"))
      .head()
  }

  test("gopher metrics on a crafted doc") {
    // words: the, cat, and, the, dog, have, 42 -> 7 words
    // word chars: 3+3+3+3+3+4+2 = 21; symbols: # and ! -> 2
    // alpha words: all but "42" -> 6; distinct stopwords: the, and, have -> 3
    val r = one("the cat and the dog have 42 #!")
    assert(r.getLong(0) == 7L)
    assert(r.getLong(1) == 21L)
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == 6L)
    assert(r.getLong(4) == 3L)
  }

  test("gopher metrics on the empty / no-alpha edges") {
    val e = one("")
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.getLong(4) == 0L)
    val d = one("12 34 56")
    assert(d.getLong(0) == 3L && d.getLong(3) == 0L)
  }

  test("piiRedact counts and masks all three categories") {
    import spark.implicits._
    val r = Seq("reach user9@ex3.com or 555-867-5309 via 10.0.42.7 ok")
      .toDF("text").select(TextFns.piiRedact(col("text")).as("p"))
      .select(col("p.n_emails"), col("p.n_phones"), col("p.n_ips"),
        col("p.redacted"))
      .head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getString(3) == "reach <EMAIL> or <PHONE> via <IP> ok")
  }

  test("piiRedact leaves clean text untouched and counts zero") {
    import spark.implicits._
    val r = Seq("plain words only here 3-4 short 1.2 digits")
      .toDF("text").select(TextFns.piiRedact(col("text")).as("p"))
      .select(col("p.n_emails"), col("p.n_phones"), col("p.n_ips"),
        col("p.redacted"))
      .head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.getString(3) == "plain words only here 3-4 short 1.2 digits")
  }
}
