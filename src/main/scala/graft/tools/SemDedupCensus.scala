package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: SemDeDup cluster-size occupancy at a given sf
  * dir — is the within-cluster pair volume Σc² bounded by the k=⌊√N⌋
  * ladder, or does Lloyd concentration produce fat clusters that the
  * quadratic member search then pays for? Prints the top sizes, Σc²,
  * and the balanced-ideal Σc² = N²/k for comparison.
  *
  * Usage: runMain graft.tools.SemDedupCensus <sfDir> [rounds=2] [kFactor=1] [mode=flat]
  * (kFactor scales the k = ⌊√N⌋ ladder — the imbalance lever A/B;
  * mode=2l fits the TWO-LEVEL hierarchy at the same total k — the
  * fit-cost/occupancy side of the flat-vs-hierarchical A/B; mode=2lmp
  * adds the coarse top-2 MULTI-PROBE union membership and prints its
  * Σc² next to the primary's — the verify-mass side of the recall
  * recovery.)
  */
object SemDedupCensus {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SemDedupCensus <sfDir> [rounds] [kFactor] [mode]")
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
    val kFactor = if (args.length > 2) args(2).toInt else 1
    val mode = if (args.length > 3) args(3) else "flat"
    val twoLevel = mode == "2l" || mode == "2lmp"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Caches, FixedPointKMeans}
    val (corpus, _, _) = graft.analytics.DocQueries.plantedEmbeddings(spark, dir)
    val q = Caches.register(corpus.select($"vec_id",
      FixedPointKMeans.quantize($"embedding").as("v")))
    val n = q.count()
    val k = (math.max(8L, math.floor(math.sqrt(n.toDouble)).toLong) * kFactor).toInt
    if (twoLevel) {
      val kc = math.max(4L, math.floor(math.sqrt(k.toDouble)).toLong).toInt
      val kf = (k + kc - 1) / kc
      val t0 = System.nanoTime()
      val tl = FixedPointKMeans.fitTwoLevel(q, "vec_id", "v", kc, kf, rounds)
      val tFit = (System.nanoTime() - t0) / 1e9
      val ta0 = System.nanoTime()
      val nAsg = FixedPointKMeans.assignTwoLevel(q, "v", tl)
        .filter($"cluster" >= 0).count()
      val tAsg = (System.nanoTime() - ta0) / 1e9
      val sizes = FixedPointKMeans.assignTwoLevel(q, "v", tl)
        .groupBy($"cluster").agg(count(lit(1)).as("c"))
        .select($"c").as[Long].collect().sorted.reverse
      val sumSq = sizes.map(c => c * c).sum
      println(s"[census-2l] n=$n k=$k kc=$kc kf=$kf rounds=$rounds " +
        s"fit=${f"$tFit%.1f"}s assign=${f"$tAsg%.1f"}s ($nAsg rows) " +
        s"nonempty=${sizes.length}")
      println(s"[census-2l] top sizes: ${sizes.take(15).mkString(", ")}")
      println(s"[census-2l] sum c^2 = $sumSq  (balanced ideal N^2/k = ${n * n / k}); " +
        s"top-1 share of pair mass = ${f"${sizes.head * sizes.head * 100.0 / sumSq}%.1f"}%")
      if (mode == "2lmp") {
        // the union membership the multi-probe pair search runs over:
        // primary fine cell + (where the runner-up coarse cell is
        // seeded) the secondary fine cell
        val tm0 = System.nanoTime()
        val t2 = Caches.register(FixedPointKMeans.assignTop2(q, "v", tl.coarse)
          .select($"vec_id", $"v", $"cluster".as("cc1"), $"cluster2".as("cc2")))
        val prim = FixedPointKMeans.assignFine(
          t2.select($"vec_id", $"v", $"cc1".as("cc")), "v", "cc", kf, tl.fine)
          .select($"vec_id", $"fj")
        val sec = FixedPointKMeans.assignFine(
          t2.filter($"cc2" =!= -1).select($"vec_id", $"v", $"cc2".as("cc")),
          "v", "cc", kf, tl.fine, requireSeeded = false)
          .select($"vec_id", $"fj")
        val pSizes = prim.groupBy($"fj").agg(count(lit(1)).as("pc"))
        val uSizes = prim.unionByName(sec)
          .groupBy($"fj").agg(count(lit(1)).as("uc"))
        val agg = uSizes.join(pSizes, Seq("fj"), "left")
          .agg(sum($"uc").as("rows"),
            sum($"uc" * $"uc").as("usq"),
            sum($"uc" * coalesce($"pc", lit(0L))).as("asym"))
          .head()
        val tMp = (System.nanoTime() - tm0) / 1e9
        val (mRows, mSumSq, asym) =
          (agg.getLong(0), agg.getLong(1), agg.getLong(2))
        println(s"[census-2lmp] union membership rows = $mRows " +
          s"(of $n primary) in ${f"$tMp%.1f"}s")
        println(s"[census-2lmp] symmetric union sum c^2 = $mSumSq " +
          s"(${f"${mSumSq.toDouble / sumSq}%.2f"}x the primary's $sumSq); " +
          s"ASYMMETRIC sum u*p = $asym " +
          s"(${f"${asym.toDouble / sumSq}%.2f"}x — the shipped surface)")
      }
      spark.stop()
      return
    }
    val t0 = System.nanoTime()
    val cents = FixedPointKMeans.fit(q, "vec_id", "v", k, rounds)
    val tFit = (System.nanoTime() - t0) / 1e9
    if (sys.env.contains("SEMDEDUP_CENSUS_EXPLAIN"))
      println(FixedPointKMeans.assign(q, "v", cents)
        .filter($"cluster" >= 0).queryExecution.executedPlan.toString)
    // phase split: one assignment-only pass vs one full update round
    val ta0 = System.nanoTime()
    val nAsg = FixedPointKMeans.assign(q, "v", cents)
      .filter($"cluster" >= 0).count()
    val tAsg = (System.nanoTime() - ta0) / 1e9
    val tu0 = System.nanoTime()
    val nUpd = FixedPointKMeans.assign(q, "v", cents)
      .select($"cluster", org.apache.spark.sql.functions.posexplode($"v"))
      .toDF("cluster", "pos", "x")
      .groupBy($"cluster", $"pos")
      .agg(org.apache.spark.sql.functions.expr("sum(x) DIV count(1)").as("m"))
      .count()
    val tUpd = (System.nanoTime() - tu0) / 1e9
    println(s"[census] phase split: one assignment pass ${f"$tAsg%.1f"}s " +
      s"($nAsg rows), one update rollup ${f"$tUpd%.1f"}s ($nUpd cells)")
    val sizes = FixedPointKMeans.assign(q, "v", cents)
      .groupBy($"cluster").agg(count(lit(1)).as("c"))
      .select($"c").as[Long].collect().sorted.reverse
    val sumSq = sizes.map(c => c * c).sum
    println(s"[census] n=$n k=$k rounds=$rounds fit=${f"$tFit%.1f"}s " +
      s"nonempty=${sizes.length}")
    println(s"[census] top sizes: ${sizes.take(15).mkString(", ")}")
    println(s"[census] sum c^2 = $sumSq  (balanced ideal N^2/k = ${n * n / k}); " +
      s"top-1 share of pair mass = ${f"${sizes.head * sizes.head * 100.0 / sumSq}%.1f"}%")
    spark.stop()
  }
}
