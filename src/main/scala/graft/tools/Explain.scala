package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Perf-loop helper: print the formatted physical plan and timed runs of
  * one or more registered queries (comma-separated), in ONE JVM/session —
  * the per-query timings then measure plans, not session startup.
  *
  * Usage: runMain graft.tools.Explain <q1[,q2,...]> [sfDir] [reps]
  *
  * SPARK_GRAFT_PLAN_DIR=<dir> (+ optional SPARK_GRAFT_PLAN_SUFFIX, e.g.
  * `_before`) persists each formatted plan to <dir>/<name><suffix>.txt —
  * the plans/rNN evidence files the optimization rounds commit. Timed
  * reps use the noop sink and clear operator caches between runs,
  * mirroring the Bench steady methodology (optimization guide 1.4).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions) // SQL fns + top-k strategy, as Bench/Verify
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planSuffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    names.foreach { name =>
      val q = SparkEntry.registry.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name; have: ${SparkEntry.registry.map(_.name).mkString(", ")}"))
      spark.sparkContext.setJobDescription(s"explain:$name")
      val df = q.run(spark, sfDir)
      val planText = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"==== $name ====")
      println(planText)
      planDir.foreach { d =>
        val p = java.nio.file.Paths.get(d, s"$name$planSuffix.txt")
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(p,
          planText.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      }
      for (i <- 1 to reps) {
        // fresh plan per rep + cache clear between runs: the timing is
        // the recompute cost, exactly as Bench measures steady runs
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[explain] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        graft.operators.Caches.unpersistAll()
        spark.catalog.clearCache()
        System.gc()
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
