package graft.export

import graft.functions.VectorFns
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D projection of embeddings for visualization (SURVEY.md §2.10 X16).
  *
  * The reference uses sklearn t-SNE (`ihop/visualizations.py:80-115`);
  * no t-SNE exists in Spark ML or offline libraries here, so the
  * projection operator is PCA with the same output schema
  * `(key, c1, c2)` — a documented divergence (SURVEY.md §7.4.3): PCA is
  * deterministic, distributed, and preserves the "2-D coordinates per
  * key" contract, not t-SNE's neighborhood structure.
  */
object Projection {

  def pca2d(df: DataFrame, keyCol: String, vecCol: String,
            normalize: Boolean = true): DataFrame = {
    val arr = if (normalize) VectorFns.l2Normalize(col(vecCol))
              else VectorFns.toDoubles(col(vecCol))
    val feat = df.withColumn("_features", array_to_vector(arr))
    val model = new PCA().setK(2).setInputCol("_features").setOutputCol("_pca")
      .fit(feat)
    model.transform(feat)
      .select(col(keyCol),
        vector_to_array(col("_pca")).getItem(0).as("c1"),
        vector_to_array(col("_pca")).getItem(1).as("c2"))
  }
}
