package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force top-k orders by cosine with id tie-break") {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1f, 0f))).toDF("query_id", "embedding")
    val res = Similarity.bruteForceTopK(queries, corpus,
        "query_id", "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(res.toSeq == Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("IVF top-k achieves high recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val qs = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = asSet(Similarity.bruteForceTopK(qs, emb, "query_id", "vec_id",
      "embedding", k = 5))
    val approx = asSet(Similarity.ivfTopK(qs, emb, "query_id", "vec_id",
      "embedding", k = 5, nlist = 8, nprobe = 5))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8")
  }
}
