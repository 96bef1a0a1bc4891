package graft.operators

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

  /** Train the coarse quantizer on (a bounded sample of) the corpus.
    *
    * The sample is BOUNDED BY DESIGN (maxSample rows × dim doubles — a
    * few MB), so Lloyd's iterations run driver-local: one Spark job to
    * collect the sample instead of one job per KMeans iteration. 10
    * iterations of rough structure are enough for a coarse quantizer —
    * search recall is governed by nProbe, not centroid convergence
    * (asserted against exact top-k in ScalaTest). */
  def fit(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxSample: Int = 100000, iters: Int = 10): Model = {
    val sample = df.select(col(vecCol).cast("array<double>").as("v"))
      .limit(maxSample)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "IvfIndex.fit: empty input")
    Model(localKMeans(sample, k, seed, iters).map(_.toSeq).toSeq)
  }

  /** Seeded Lloyd's algorithm over an in-memory sample: deterministic
    * distinct-point init; an empty cluster is re-seeded with a random
    * sample point (rare at coarse k; a re-seed on the final iteration
    * returns that raw point as a centroid — acceptable for a coarse
    * quantizer where recall comes from nProbe, not centroid quality). */
  private[operators] def localKMeans(
      points: Array[Array[Double]], k: Int, seed: Long, iters: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val n = points.length
    val kk = math.min(k, n)
    // init: k distinct (by content) seeded picks
    val centroids = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val seen = scala.collection.mutable.Set.empty[Seq[Double]]
    var guard = 0
    while (centroids.length < kk && guard < n * 4) {
      val c = points(rnd.nextInt(n))
      if (seen.add(c.toSeq)) centroids += c.clone()
      guard += 1
    }
    while (centroids.length < kk) centroids += points(rnd.nextInt(n)).clone()
    val dim = points(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      var i = 0
      while (i < n) {
        val p = points(i)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          var d = 0.0
          val cen = centroids(c)
          var j = 0
          while (j < dim) { val t = p(j) - cen(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      var c = 0
      while (c < centroids.length) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        } else {
          centroids(c) = points(rnd.nextInt(n)).clone() // re-seed empty cell
        }
        c += 1
      }
      it += 1
    }
    centroids.toArray
  }

  /** Map-only cell assignment: argmin over the centroid distances,
    * routed through the fused [[graft.expressions.KMeansAssignF64]]
    * kernel. The former declarative form (one `aggregate(zip_with(…))`
    * fold per centroid inside an `array_position(array_min(…))`) paid
    * k×d interpreted lambda evals + k array allocations PER ROW — the
    * repo's measured HOF cliff — and at 100 TB this assignment is the
    * corpus-sized pass that builds the partitioned index
    * ([[writeIndex]]). Semantics are bit-identical (same IEEE
    * accumulation order, earliest centroid wins exact distance ties —
    * spec-pinned against the declarative fold). */
  def cellOf(vec: Column, model: Model): Column =
    call_function("graft_kmeans_assign_f64", vec.cast("array<double>"),
      typedLit(model.centroids.indices.toArray),
      typedLit(model.centroids.flatten.toArray))("j")

  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("ivf_cell", cellOf(col(vecCol), model))

  /** Persist the corpus as a CELL-PARTITIONED parquet layout — the IVF
    * "inverted file" realized as Spark partition directories. This is the
    * scale path the header describes: after this one map-only pass plus
    * write, every probe of c cells is a partition-pruned scan of c
    * directories (asserted in PlanAuditSpec), so query cost is
    * O(corpus × c / k_cells), not O(corpus). */
  def writeIndex(df: DataFrame, vecCol: String, model: Model, path: String): Unit =
    assign(df, vecCol, model).write.partitionBy("ivf_cell")
      .mode("overwrite").parquet(path)

  /** ANN top-k over a [[writeIndex]] layout: the cell predicate is a
    * PartitionFilter (directory pruning at planning time), never a
    * row-level scan filter. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, model: Model,
      query: Seq[Double], k: Int, nProbe: Int = 2): DataFrame = {
    val cells = model.nearestCells(query, nProbe)
    spark.read.parquet(path)
      .filter(col("ivf_cell").isin(cells: _*))
      .select(col(idCol),
        round(Similarity.cosineNative(col(vecCol).cast("array<double>"), typedLit(query)), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

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
