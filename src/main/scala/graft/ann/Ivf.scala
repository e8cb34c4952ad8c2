package graft.ann

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer assigns every vector to its nearest centroid; a query
  * probes only the `nProbe` closest cells and exact-ranks inside them.
  *
  * Scale posture: training runs on a bounded sample; the centroid
  * table (k × dims doubles) broadcasts to every executor, assignment
  * is one map-side pass, and at rest the corpus is partitioned (or
  * clustered) by cell so a probe is a partition-pruned scan of
  * nProbe/k of the data. The seed is fixed — the index is
  * reproducible run to run.
  */
object Ivf {

  /** Train the quantizer and assign every vector its cell.
    * @return (indexed frame = input + `cell` column, centroids) */
  def build(embs: DataFrame, vec: String, nCells: Int,
      seed: Long = 42L, sampleFraction: Double = 1.0): (DataFrame, Array[Array[Double]]) = {
    val feat = embs.withColumn("__f", array_to_vector(col(vec).cast("array<double>")))
    val train = if (sampleFraction < 1.0) feat.sample(withReplacement = false, sampleFraction, seed) else feat
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("__f").setPredictionCol("cell")
      .fit(train)
    (model.transform(feat).drop("__f"), model.clusterCenters.map(_.toArray))
  }

  /** Probe the `nProbe` nearest cells (by L2 to centroid, the k-means
    * geometry) and exact-rank the survivors by cosine. */
  def topK(indexed: DataFrame, centers: Array[Array[Double]], id: String,
      vec: String, query: Seq[Double], k: Int, nProbe: Int,
      digits: Int = 6): DataFrame = {
    def l2(c: Array[Double]): Double =
      math.sqrt(c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum)
    val probes = centers.zipWithIndex.sortBy { case (c, i) => (l2(c), i) }
      .take(nProbe).map(_._2)
    val qCol = array(query.map(lit): _*)
    Ann.bruteForceTopK(
      indexed.filter(col("cell").isin(probes.map(Integer.valueOf): _*)),
      id, vec, qCol, k, digits)
  }
}
