package graft.tools

import graft.Tables
import graft.functions.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val docs = Tables.documents(spark, dir)
    for (i <- 1 to 2) {
      time(s"tokens-$i") {
        docs.select(TextAnalysis.tokens(col("text")).as("t"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"shingles-$i") {
        docs.select(TextAnalysis.shingles(col("text"), 3).as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"shingleHashes-$i") {
        docs.select(TextAnalysis.shingleHashes(col("text"), 3).as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"explode-$i") {
        docs.select(col("doc_id"), explode(TextAnalysis.shingleHashes(col("text"), 3)).as("sh"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"fulljaccard-$i") {
        graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
          .write.format("noop").mode("overwrite").save()
        graft.operators.Caches.unpersistAll()
      }
      time(s"simhash-sketch-$i") {
        docs.select(col("doc_id"), graft.operators.Dedup.simhashChunks(col("text")).as("sk"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"fullsimhash-$i") {
        graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 3)
          .write.format("noop").mode("overwrite").save()
        graft.operators.Caches.unpersistAll()
      }
      val orders = Tables.orders(spark, dir)
      time(s"topk-window-$i") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"topk-operator-$i") {
        graft.plans.TopKPerKey.perKey(orders, Seq("o_custkey"),
            Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
