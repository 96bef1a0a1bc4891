package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR, forcing full computation through the noop sink
  * (count() would let Catalyst prune the work; noop executes the complete
  * physical plan and discards rows executor-side — no driver collect).
  * Prints ONE JSON line in the driver's expected shape. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()

    // two timed runs per query: run 1 includes one-time whole-stage
    // codegen compilation (a fixed per-plan Janino cost, ~seconds for the
    // widest expression trees); run 2 is the steady-state per-batch cost —
    // the number that scales with data volume.
    val results = SparkEntry.registry.map { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (q.name, once(), once())
    }
    def fmt(f: ((String, Double, Double)) => Double) =
      results.map(r => "\"" + r._1 + f"""":${f(r)}%.3f""").mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val steady = results.map(_._3).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${fmt(_._2)},"value_steady":$steady%.3f,"queries_steady":${fmt(_._3)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
