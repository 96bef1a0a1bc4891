package graft.tools

import graft.Tables
import graft.operators.{Dedup, Graphs}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the connected-components closure paths on the REAL
  * dedup pair graph (VERDICT r10 item 5): the same df-capped 3-gram
  * Jaccard pairs q_dedup_components consumes, closed three ways —
  * driver union-find (the ≤ driverMaxEdges fast path), the distributed
  * min-label loop (driverMaxEdges = 0), and star-contraction bigStar.
  * Prints pair-generation time, per-path min-of-3 closure times, and a
  * label-distribution checksum per path (count + component-size
  * histogram hash) so a timing win can't hide a wrong answer.
  *
  * Usage: runMain graft.tools.CcBench <sfDir>
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: CcBench <sfDir>")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-cc-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val t0 = System.nanoTime()
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, dir),
        "doc_id", "text", k = 3, minJaccard = 0.5, maxDf = 100)
        .select("id_a", "id_b").localCheckpoint()
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      println(f"[ccbench] pairs=$nPairs%d pairGenSec=$tPairs%.2f")

      def checksum(labels: org.apache.spark.sql.DataFrame): (Long, String) = {
        // hash-sum widened through DECIMAL(38,0): xxhash64 spans the full
        // long range, so a raw long SUM overflows under ANSI mode
        val r = labels.groupBy(col("label")).count()
          .agg(count(lit(1)),
            sum(xxhash64(col("label"), col("count")).cast("decimal(38,0)")))
          .head()
        (r.getLong(0), r.getDecimal(1).toBigInteger.toString)
      }
      def bench(name: String)(run: => org.apache.spark.sql.DataFrame): Unit = {
        val times = (1 to 3).map { _ =>
          val s = System.nanoTime()
          run.count() // force the closure
          (System.nanoTime() - s) / 1e9
        }
        val (nComp, h) = checksum(run)
        println(f"[ccbench] $name%s minSec=${times.min}%.2f runs=${
          times.map(t => f"$t%.2f").mkString(",")} components=$nComp%d hash=$h%s")
      }
      bench("driver-union-find") {
        Dedup.connectedComponents(pairs)
      }
      bench("distributed-loop") {
        Dedup.connectedComponents(pairs, driverMaxEdges = 0L)
      }
      bench("big-star") {
        Graphs.bigStarComponents(pairs)
      }
    } finally spark.stop()
  }
}
