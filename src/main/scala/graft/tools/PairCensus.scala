package graft.tools

import graft.Tables
import graft.functions.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-probe census of the blocked pair family's df-cap (VERDICT r11
  * item 4): does the 10k stop-shingle cap BIND at sf10, and how much of
  * the candidate-pair mass sits near it?
  *
  * For the 3-gram shingle blocking key (q_jaccard_pairs /
  * q_containment_pairs / q_dedup_components / q_dup_cluster_sizes,
  * maxDf = 100), a shingle of document frequency f contributes ~f²/2
  * candidate pairs, so the decision variable for the IDF-key
  * alternative is the df² MASS profile, not the df counts: if the top
  * df bands carry most of the mass but stay under the cap, the cap is
  * not the binding control and an IDF-weighted key (rarest shingle per
  * window) would re-block the same volume at extra passes — measure,
  * don't guess.
  *
  * Prints one line per df band: shingles, Σdf (occurrence mass), Σdf²
  * (candidate mass ×2), plus the capped tail (df > 100) whose pairs
  * the generators DROP today.
  *
  * Usage: PairCensus <sfDir>
  */
object PairCensus {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    val df = docs.select(explode(TextAnalysis.shingleHashes(col("text"), 3)).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
    val banded = df.withColumn("band",
        when(col("df") === 1, "1 unique")
          .when(col("df") <= 10, "2-10")
          .when(col("df") <= 50, "11-50")
          .when(col("df") <= 100, "51-100 (cap)")
          .otherwise(">100 CAPPED"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("shingles"),
        sum(col("df")).as("occ_mass"),
        sum(col("df") * col("df")).as("cand_mass"))
      .orderBy(col("cand_mass").desc)
    val rows = banded.collect()
    val totalCand = rows.map(_.getLong(3)).sum.toDouble
    println(f"[census] $dir docs=${docs.count()}")
    rows.foreach { r =>
      println(f"[census] band=${r.getString(0)}%-14s shingles=${r.getLong(1)}%10d " +
        f"occ=${r.getLong(2)}%12d cand=${r.getLong(3)}%16d (${r.getLong(3) / totalCand * 100}%5.1f%% of pair mass)")
    }
    val top = df.orderBy(col("df").desc).limit(10).collect()
    println("[census] top-10 dfs: " + top.map(_.getLong(1)).mkString(", "))
    spark.stop()
  }
}
