package graft.streaming

import graft.SparkSpec
import graft.functions.TextFns
import graft.text.NgramLm
import org.apache.spark.sql.functions._

/** Streaming LM gate: broadcast-model scoring is bit-identical to the
  * batch q80 path (stream ≡ batch doc-id sets), and the driver-size
  * guard fails loudly. */
class StreamLmGateSpec extends SparkSpec {
  import spark.implicits._

  private val thr = -3400000L

  test("stream replay ≡ batch scoreScaled gate, row for row") {
    val d = sf("sf0.001")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), TextFns.wordTokens(col("text")).as("t"))
    val model = NgramLm.fit(docs, "doc_id", "t")
    val tables = StreamLmGate.collectModel(model)
    val streamed = StreamLmGate
      .replayParquet(spark, d, tables, thr, queryName = "test_lm_gate")
      .as[Long].collect().toSet
    val batch = NgramLm.scoreScaled(model, docs, "doc_id", "t")
      .where(NgramLm.keepCol(thr))
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
    val total = docs.count()
    assert(streamed.nonEmpty && streamed.size < total, // gate must actually split
      s"gate kept ${streamed.size}/$total — not splitting")
  }

  test("collectModel guards the driver against non-vocab-sized tables") {
    val docs = Seq((1L, Seq("a", "b", "c", "a", "b"))).toDF("doc_id", "t")
    val model = NgramLm.fit(docs, "doc_id", "t")
    val t = StreamLmGate.collectModel(model)
    assert(t.vocabSize == 3 && t.c2.nonEmpty && t.c1.nonEmpty)
    // the guard itself: a fake model whose bigram table exceeds the cap
    val big = model.copy(bigramCounts =
      spark.range(StreamLmGate.MaxModelEntries + 1)
        .select(col("id").cast("string").as("prev"),
          col("id").cast("string").as("cur"), col("id").as("c2")))
    intercept[IllegalArgumentException](StreamLmGate.collectModel(big))
  }
}
