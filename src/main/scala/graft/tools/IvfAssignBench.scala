package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: IVF cell-assignment cost — the fused
  * graft_kmeans_assign_f64 kernel vs the declarative
  * `aggregate(zip_with(…))` HOF argmin it replaced — over the
  * embeddings table at a given sf dir and centroid count. The
  * assignment is the corpus-sized pass of IvfIndex.writeIndex, so this
  * ratio is the 100 TB index-build ratio.
  *
  * Usage: runMain graft.tools.IvfAssignBench <sfDir> [k=64] [reps=3]
  */
object IvfAssignBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfAssignBench <sfDir> [k] [reps]")
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 64
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.IvfIndex
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    emb.count()
    val model = IvfIndex.fit(emb, "v", k)
    def sqDistCol(vec: org.apache.spark.sql.Column, c: Seq[Double]) =
      aggregate(zip_with(vec, typedLit(c), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    val dists = array(model.centroids.map(c => sqDistCol(col("v"), c)): _*)
    val declarative = (array_position(dists, array_min(dists)) - 1).cast("int")
    def time(label: String, colExpr: org.apache.spark.sql.Column): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        emb.select(colExpr.as("cell")).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = ts.min
      println(f"[ivf-assign] $label: min-of-$reps ${best}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
      best
    }
    val fused = time("fused kernel ", IvfIndex.cellOf(col("v"), model))
    val hof = time("HOF argmin   ", declarative)
    println(f"[ivf-assign] k=$k ratio HOF/fused = ${hof / fused}%.1f x")
    spark.stop()
  }
}
