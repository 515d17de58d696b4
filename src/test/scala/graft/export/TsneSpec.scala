package graft.export

import graft.SparkSpec

/** Barnes–Hut t-SNE: deterministic under a fixed config, preserves
  * obvious cosine neighborhood structure, and emits the reference's
  * `(key, tsne_1, tsne_2)` schema (`ihop/visualizations.py:80-131`). */
class TsneSpec extends SparkSpec {
  import spark.implicits._

  // two cosine-separated direction clusters with deterministic jitter
  private def clusters(perSide: Int, dim: Int): Array[Array[Double]] = {
    def jitter(i: Int, j: Int): Double = (((i * 31 + j * 17) % 13) - 6) / 100.0
    val a = Array.tabulate(perSide)(i =>
      Array.tabulate(dim)(j => (if (j == 0) 1.0 else 0.0) + jitter(i, j)))
    val b = Array.tabulate(perSide)(i =>
      Array.tabulate(dim)(j => (if (j == 1) 1.0 else 0.0) + jitter(i + 7, j)))
    a ++ b
  }

  test("fitTransform is deterministic and separates cosine clusters") {
    val pts = clusters(30, 6)
    val cfg = Tsne.Config(perplexity = 5, maxIter = 300, earlyExagIter = 100)
    val y1 = Tsne.fitTransform(pts, cfg)
    val y2 = Tsne.fitTransform(pts, cfg)
    assert(y1.map(_.toSeq).toSeq == y2.map(_.toSeq).toSeq,
      "same input + config must reproduce the identical embedding")

    def dist(p: Array[Double], q: Array[Double]) =
      math.hypot(p(0) - q(0), p(1) - q(1))
    val (ca, cb) = y1.splitAt(30)
    def meanIntra(c: Array[Array[Double]]) = {
      val ds = for (i <- c.indices; j <- i + 1 until c.length) yield dist(c(i), c(j))
      ds.sum / ds.size
    }
    val inter = (for (p <- ca; q <- cb) yield dist(p, q)).sum / (30.0 * 30)
    assert(meanIntra(ca) < inter && meanIntra(cb) < inter,
      s"clusters must be tighter than their separation: " +
        s"${meanIntra(ca)}, ${meanIntra(cb)} vs $inter")
  }

  test("project emits the reference (key, tsne_1, tsne_2) schema; CSV round-trips") {
    val df = clusters(15, 5).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("subreddit", "vec")
    val out = Tsne.project(df, "subreddit", "vec",
      Tsne.Config(perplexity = 4, maxIter = 150, earlyExagIter = 50))
    assert(out.columns.toSeq == Seq("subreddit", "tsne_1", "tsne_2"))
    assert(out.count() == 30)
    // the key column keeps its input type (no silent cast to string)
    assert(out.schema.head.dataType ==
      org.apache.spark.sql.types.LongType)

    val dir = java.nio.file.Files.createTempDirectory("tsnecsv").toString
    Tsne.projectToCsv(df, "subreddit", "vec", s"$dir/t",
      Tsne.Config(perplexity = 4, maxIter = 150, earlyExagIter = 50))
    val back = spark.read.option("header", "true").csv(s"$dir/t")
    assert(back.columns.toSeq == Seq("subreddit", "tsne_1", "tsne_2"))
    assert(back.count() == 30)
  }
}
