package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: codebook determinism, the exact-reconstruction
  * fixed point (a vector assembled from codebook centroids encodes to
  * exactly those codes), compression contract (m codes per vector),
  * and ADC recall against exact L2 top-k on the embeddings fixture. */
class PqSpec extends SparkSpec {

  private lazy val emb =
    graft.sources.Tables.table(spark, sf("sf0.001"), "embeddings")

  // m=16/k=32 on the 64-dim fixture: near-isotropic synthetic vectors
  // are PQ's adversarial case (no subspace structure to exploit), so
  // the spec uses finer codebooks than the 8x16 production default to
  // keep the recall signal meaningful
  private lazy val model = Pq.fit(emb, "vec_id", "embedding",
    Pq.Config(m = 16, k = 32, sampleN = 256, iters = 10))

  test("fit is deterministic and shapes match the config") {
    val again = Pq.fit(emb, "vec_id", "embedding",
      Pq.Config(m = 16, k = 32, sampleN = 256, iters = 10))
    assert(model.m == 16 && model.subDim == 4)
    assert(model.codebooks.length == 16)
    assert(model.codebooks.forall(_.forall(_.length == 4)))
    assert(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      again.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("native graft_pq_encode is bit-identical to the HOF twin") {
    val native = Pq.encode(model, emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = Pq.encodeHof(model, emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, codes) =>
      assert(codes == hof(id), s"vec $id: native $codes vs hof ${hof(id)}")
    }
  }

  test("native graft_pq_adc matches a driver-side lookup sum exactly") {
    graft.functions.NativeFns.register(spark)
    import spark.implicits._
    val lut = Seq.tabulate(4, 8)((s, c) => 0.25 * s + 0.125 * c - 1.0)
    val codes = Seq(Seq(0, 3, 7, 1), Seq(2, 2, 2, 2), Seq(7, 0, 5, 6))
    val df = codes.toDF("codes")
      .select(org.apache.spark.sql.functions.typedLit(lut).as("_lut"),
        col("codes"))
      .select(graft.functions.NativeFns.pqAdc(col("_lut"), col("codes"))
        .as("adist"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    val want = codes.map { cs =>
      // same left-to-right fold as the expression
      cs.zipWithIndex.foldLeft(0.0) { case (a, (c, s)) => a + lut(s)(c) }
    }
    assert(got == want)
  }

  test("encode: m codes per vector, all within [0, k)") {
    val codes = Pq.encode(model, emb, "vec_id", "embedding")
    val rows = codes.select(col("codes")).collect()
      .map(_.getSeq[Int](0))
    assert(rows.nonEmpty)
    assert(rows.forall(_.length == 16))
    assert(rows.forall(_.forall(c => c >= 0 && c < 32)))
  }

  test("a centroid-assembled vector encodes to its own codes") {
    import spark.implicits._
    // build a vector whose subspace s equals centroid (s mod k) of
    // subspace s — its nearest centroid per subspace is itself (d=0)
    val picks = (0 until model.m).map(s => s % model.codebooks(s).length)
    val v = (0 until model.m).flatMap(s =>
      model.codebooks(s)(picks(s)).map(_.toFloat))
    val df = Seq((0L, v)).toDF("vec_id", "embedding")
    val got = Pq.encode(model, df, "vec_id", "embedding")
      .select(col("codes")).head().getSeq[Int](0)
    // distance 0 to the assembled centroid; a tie (duplicate centroid)
    // breaks to the lowest index, which must still have distance 0
    picks.indices.foreach { s =>
      val cGot = model.codebooks(s)(got(s))
      val cWant = model.codebooks(s)(picks(s))
      assert(cGot.toSeq == cWant.toSeq,
        s"subspace $s: code ${got(s)} is not a zero-distance centroid")
    }
  }

  test("ADC recall@10 vs exact L2 on the fixture is usable") {
    val codes = Pq.encode(model, emb, "vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val pq = Pq.searchAdc(model, codes, queries,
        "query_id", "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // exact L2 top-10 per query, driver-side over the small fixture
    val all = emb.select(col("vec_id"),
        graft.functions.VectorFns.toDoubles(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exact = all.filter(_._1 < 20).map { case (qid, qv) =>
      qid -> all.map { case (id, v) => (l2(qv, v), id) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap

    val recalls = exact.map { case (qid, want) =>
      pq(qid).intersect(want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4,
      f"mean ADC recall@10 $mean%.2f below 0.4 — codebooks degenerate?")
    // self-hit: every query's own vector has ADC distance equal to its
    // quantization error, which must rank it in the top-10
    assert(exact.keys.forall(qid => pq(qid).contains(qid)))
  }

  test("IVFPQ: k rows per query, probed-cell containment, usable recall") {
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val res = Pq.ivfPqTopK(emb, queries, "query_id", "vec_id", "embedding",
      k = 10, nlist = 8, nprobe = 4,
      cfg = Pq.Config(m = 16, k = 32, sampleN = 256, iters = 10))
    val rows = res.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 20 && byQ.values.forall(_.length == 10),
      "every query must return exactly k rows")
    // every returned neighbor must come from one of at most nprobe cells
    assert(byQ.values.forall(_.map(_.getInt(4)).toSet.size <= 4))

    // recall vs exact L2 — nprobe=4/8 cells scans half the corpus, so
    // the bar sits below the full-scan ADC test's
    val all = emb.select(col("vec_id"),
        graft.functions.VectorFns.toDoubles(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exact = all.filter(_._1 < 20).map { case (qid, qv) =>
      qid -> all.map { case (id, v) => (l2(qv, v), id) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap
    val got = byQ.view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val mean = exact.map { case (qid, want) =>
      got(qid).intersect(want).size.toDouble / want.size
    }.sum / exact.size
    assert(mean >= 0.25,
      f"mean IVFPQ recall@10 $mean%.2f below 0.25")
    graft.Caches.release()
  }
}
