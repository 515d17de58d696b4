package graft.cluster

import graft.functions.VectorFns
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering over embedding columns (SURVEY.md §2.10 X6–X8).
  *
  * KMeans on L2-normalized vectors ≈ cosine clustering (the reference
  * normalizes before sklearn KMeans — `ihop/clustering.py:450-499`,
  * defaults `n_clusters=250, random_state=100` at `:376`).
  * Internal metrics: silhouette via Spark's `ClusteringEvaluator`;
  * Calinski-Harabasz and Davies-Bouldin computed as Spark aggregations
  * over (vector, label) — only k×dim summaries ever reach the driver.
  */
object Clustering {

  final case class Config(
      k: Int = 250,
      seed: Long = 100L,
      maxIter: Int = 100,
      normalize: Boolean = true,
      vecCol: String = "embedding",
      predictionCol: String = "cluster")

  /** Attach `_features` (ml Vector, optionally L2-normalized). */
  def featurize(df: DataFrame, cfg: Config): DataFrame = {
    val arr = if (cfg.normalize) VectorFns.l2Normalize(col(cfg.vecCol))
              else VectorFns.toDoubles(col(cfg.vecCol))
    df.withColumn("_features", array_to_vector(arr))
  }

  def fit(df: DataFrame, cfg: Config = Config()): KMeansModel =
    new KMeans().setK(cfg.k).setSeed(cfg.seed).setMaxIter(cfg.maxIter)
      .setFeaturesCol("_features").setPredictionCol(cfg.predictionCol)
      .fit(featurize(df, cfg))

  def assign(model: KMeansModel, df: DataFrame, cfg: Config = Config()): DataFrame =
    model.transform(featurize(df, cfg))

  /** X8 metrics on an assigned DataFrame (must carry `_features` +
    * prediction). Returns (silhouette, calinskiHarabasz, daviesBouldin);
    * empty map semantics of the reference (single cluster → {}) is the
    * caller's concern. */
  def metrics(assigned: DataFrame, predictionCol: String = "cluster"): Map[String, Double] = {
    val k = assigned.select(predictionCol).distinct().count().toInt
    if (k <= 1) return Map.empty

    val silhouette = new ClusteringEvaluator()
      .setFeaturesCol("_features").setPredictionCol(predictionCol)
      .setMetricName("silhouette").setDistanceMeasure("squaredEuclidean")
      .evaluate(assigned)

    // per-cluster centroids & sizes: explode features → (cluster, pos) sums
    val arr = assigned.select(col(predictionCol).as("_c"),
      vector_to_array(col("_features")).as("_a"))
    val sums = arr
      .select(col("_c"), posexplode(col("_a")).as(Seq("_p", "_v")))
      .groupBy(col("_c"), col("_p"))
      .agg(sum(col("_v")).as("_s"), count(lit(1)).as("_n"))
      .collect()
    val n = arr.count()
    val dim = sums.map(_.getInt(1)).max + 1
    val byCluster = sums.groupBy(_.getInt(0))
    val centers: Map[Int, Array[Double]] = byCluster.map { case (c, rows) =>
      val v = new Array[Double](dim)
      rows.foreach(r => v(r.getInt(1)) = r.getDouble(2) / r.getLong(3))
      c -> v
    }
    val sizes: Map[Int, Long] = byCluster.map { case (c, rows) => c -> rows.head.getLong(3) }
    val global: Array[Double] = {
      val v = new Array[Double](dim)
      centers.foreach { case (c, ctr) =>
        val w = sizes(c).toDouble / n
        var i = 0; while (i < dim) { v(i) += ctr(i) * w; i += 1 }
      }
      v
    }

    // within-cluster distances: one distributed pass with a broadcast center table
    val spark = assigned.sparkSession
    import spark.implicits._
    val centersDf = broadcast(centers.toSeq.map { case (c, v) => (c, v) }
      .toDF("_c", "_ctr"))
    val dists = arr.join(centersDf, Seq("_c"))
      .select(col("_c"), VectorFns.sqDist(col("_a"), col("_ctr")).as("_d2"),
        sqrt(VectorFns.sqDist(col("_a"), col("_ctr"))).as("_d"))
      .groupBy(col("_c")).agg(sum(col("_d2")).as("w2"), avg(col("_d")).as("s"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    val w = dists.values.map(_._1).sum
    val b = centers.map { case (c, ctr) =>
      sizes(c) * sqDistArr(ctr, global)
    }.sum
    val ch = if (k == 1 || n == k) 0.0
             else (b / (k - 1)) / (w / (n - k))

    val db = {
      val cs = centers.keys.toSeq.sorted
      val ratios = cs.map { i =>
        cs.filter(_ != i).map { j =>
          val d = math.sqrt(sqDistArr(centers(i), centers(j)))
          if (d == 0) 0.0 else (dists(i)._2 + dists(j)._2) / d
        }.max
      }
      ratios.sum / k
    }

    Map("silhouette" -> silhouette, "calinski_harabasz" -> ch, "davies_bouldin" -> db)
  }

  /** S8: model persistence (MLWritable dirs). */
  def save(model: KMeansModel, dir: String): Unit = model.write.overwrite().save(dir)
  def load(dir: String): KMeansModel = KMeansModel.load(dir)

  private def sqDistArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }
}
