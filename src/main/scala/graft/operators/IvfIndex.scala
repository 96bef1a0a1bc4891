package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: KMeans coarse quantizer + cell-pruned
  * exact search — the cluster-aware alternative to random-hyperplane LSH
  * (better recall when embeddings are actually clustered).
  *
  * Scale shape: `fit` trains on a bounded sample (driver holds only k
  * centroid vectors); `assign` is a map-only pass adding a cell id —
  * at 100 TB the table is written partitioned/bucketed by cell so a query
  * scans nProbe partitions, not the corpus.
  */
object IvfIndex {

  final case class Model(centroids: Seq[Seq[Double]]) {
    def nearestCells(query: Seq[Double], nProbe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) => (i, sqDist(c, query)) }
        .sortBy(_._2).take(nProbe).map(_._1)
  }

  private def sqDist(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Train the coarse quantizer on (a bounded sample of) the corpus. */
  def fit(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxSample: Int = 100000): Model = {
    val sample = df.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      .limit(maxSample)
    // 10 iterations: coarse-quantizer centroids only need rough cluster
    // structure (search recall is governed by nProbe, not centroid
    // convergence); recall is asserted against exact top-k in ScalaTest
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(sample)
    Model(km.clusterCenters.map(_.toArray.toSeq).toSeq)
  }

  /** Squared distance to one literal centroid (sequential double math). */
  private def sqDistCol(vec: Column, centroid: Seq[Double]): Column =
    aggregate(zip_with(vec, typedLit(centroid), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Map-only cell assignment: argmin over the centroid distances. */
  def cellOf(vec: Column, model: Model): Column = {
    val dists = array(model.centroids.map(c => sqDistCol(vec, c)): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("ivf_cell", cellOf(col(vecCol), model))

  /** ANN top-k: exact cosine within the query's nProbe nearest cells. */
  def search(
      df: DataFrame, idCol: String, vecCol: String, model: Model,
      query: Seq[Double], k: Int, nProbe: Int = 2): DataFrame = {
    val cells = model.nearestCells(query, nProbe)
    assign(df, vecCol, model)
      .filter(col("ivf_cell").isin(cells: _*))
      .select(col(idCol),
        round(Similarity.cosineNative(col(vecCol), typedLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
