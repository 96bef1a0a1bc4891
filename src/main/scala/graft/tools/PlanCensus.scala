package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Audit helper: one-line physical-plan census (exchange/join/window
  * operator counts) for a comma-separated list of registered queries —
  * the raw material for PlanAuditSpec assertions.
  *
  * Usage: runMain graft.tools.PlanCensus <q1,q2,...> [sfDir]
  */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val q = SparkEntry.registry.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      val p = q.run(spark, sfDir).queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(p).length
      val rp = "Exchange rangepartitioning".r.findAllIn(p).length
      val bhj = "BroadcastHashJoin".r.findAllIn(p).length
      val smj = "SortMergeJoin".r.findAllIn(p).length
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
      val cart = p.contains("CartesianProduct")
      val win = p.contains("windowspecdefinition")
      println(s"PLAN $name exch=$ex range=$rp bhj=$bhj smj=$smj bnl=$bnl cart=$cart win=$win")
    }
    spark.stop()
  }
}
