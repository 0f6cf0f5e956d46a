package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MLlib interop: the bridge from this engine's plain-column data model
  * (`array<float>` embeddings, string labels) into `spark.ml` pipelines,
  * and the learned counterpart of the deterministic ANN operators.
  *
  * Everything stays a DataFrame transform: `Vector` columns are just
  * another column type, so sampling strategies, hooks, and batch slicing
  * compose with MLlib estimators unchanged.
  */
object MlOps {

  /** Numeric array column → MLlib dense `Vector` column. */
  def toVector(c: Column): Column = array_to_vector(c.cast("array<double>"))

  /** MLlib `Vector` column → `array<double>` (for parquet-friendly output). */
  def toArray(c: Column): Column = vector_to_array(c)

  /** Learned IVF coarse quantizer: fit seeded k-means over the embedding
    * column and return each vector's cluster id — the trained alternative
    * to [[SimilarityOps.ivfAssign]]'s fixed centroids.  Seeded and
    * deterministic for a fixed input/partitioning; at scale the cluster id
    * becomes the partition/bucketing key exactly like the LSH bucket. */
  def kmeansAssign(df: DataFrame, vec: Column, id: Column, k: Int,
      seed: Long, maxIter: Int = 10): DataFrame = {
    val data = df.select(id.as("vec_id"), toVector(vec).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(data)
    model.transform(data)
      .select(col("vec_id"), col("prediction").cast("long").as("cluster"))
  }
}
