package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance weighting: feature extraction, ratio-table shape,
  * the exact integer weight arithmetic, and the domain-preference
  * semantics of the gate. */
class ImportanceSamplerSpec extends SparkSpec {
  import spark.implicits._

  test("featureStream emits unigrams plus space-joined bigrams") {
    val docs = Seq((1L, Seq("a", "b", "c"))).toDF("doc_id", "t")
    // 3 unigrams + 2 bigrams
    assert(ImportanceSampler.featureStream(docs, "doc_id", "t", 16).count() == 5)
    val empty = Seq((2L, Seq.empty[String])).toDF("doc_id", "t")
    assert(ImportanceSampler.featureStream(empty, "doc_id", "t", 16).count() == 0)
  }

  test("ratioTable covers every bucket and signs follow the distributions") {
    val target = Seq((1L, Seq("x", "x", "x", "x"))).toDF("doc_id", "t")
    val raw = Seq((1L, Seq("x", "x", "x", "x")),
      (2L, Seq("y", "y", "y", "y"))).toDF("doc_id", "t")
    val B = 8
    val rt = ImportanceSampler.ratioTable(target, raw, "doc_id", "t", B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rt.size == B && rt.keySet == (0L until B).toSet)
    // the bucket holding "x"-grams is over-represented in the target →
    // positive; the "y" buckets under-represented → negative
    assert(rt.values.max > 0 && rt.values.min < 0)
  }

  test("weigh: integer weights match the hand-evaluated formula") {
    val target = Seq((1L, Seq("x", "x"))).toDF("doc_id", "t")
    val raw = Seq((1L, Seq("x", "x")), (2L, Seq("y", "y"))).toDF("doc_id", "t")
    val B = 4
    val ratios = ImportanceSampler.ratioTable(target, raw, "doc_id", "t", B)
    val rt = ratios.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute a doc's weight directly from its bucket counts
    val fb = ImportanceSampler.featureStream(raw, "doc_id", "t", B)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = fb.groupBy(_._1).map { case (id, rows) =>
      id -> rows.groupBy(_._2).map { case (b, g) => g.size * rt(b) }.sum
    }
    val got = ImportanceSampler.weigh(ratios, raw, "doc_id", "t", B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("gate prefers target-like docs; gram-less docs drop") {
    val target = (1L to 5L).map(i => (i, Seq("data", "spark", "data", "spark")))
      .toDF("doc_id", "t")
    val raw = ((10L to 14L).map(i => (i, Seq("data", "spark", "data", "spark"))) ++
      (20L to 24L).map(i => (i, Seq("noise", "other", "words", "here"))) :+
      (30L, Seq.empty[String])).toDF("doc_id", "t")
    val ratios = ImportanceSampler.ratioTable(target, raw, "doc_id", "t", 32)
    val w = ImportanceSampler.weigh(ratios, raw, "doc_id", "t", 32)
    val kept = w.where(ImportanceSampler.keepCol(0L))
      .select("doc_id").as[Long].collect().toSet
    assert((10L to 14L).forall(kept.contains), s"target-like docs must survive: $kept")
    assert((20L to 24L).forall(!kept.contains(_)), s"off-domain docs must drop: $kept")
    assert(!kept.contains(30L), "gram-less docs carry no evidence and drop")
  }
}
