package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compactParquet collapses a many-small-file dir with row parity") {
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString
    spark.range(10000).select($"id", md5($"id".cast("string")).as("payload"))
      .repartition(40)
      .write.mode("overwrite").parquet(out)
    val before = spark.read.parquet(out)
    val expected = before.orderBy($"id").collect()

    val (nBefore, nAfter) = Maintenance.compactParquet(spark, out, targetFileBytes = 1L << 30)
    assert(nBefore == 40)
    assert(nAfter == 1, s"expected 1 compacted file, got $nAfter")
    val after = spark.read.parquet(out)
    assert(after.orderBy($"id").collect().sameElements(expected))
  }

  test("compactParquet is a no-op when the layout already meets the target") {
    val out = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    spark.range(100).repartition(2).write.mode("overwrite").parquet(out)
    val (b, a) = Maintenance.compactParquet(spark, out, targetFileBytes = 1L)
    assert(b == 2 && a == 2) // target smaller than files: nothing to gain
  }

  test("compactPartitioned compacts each leaf, preserving partition values") {
    val out = java.nio.file.Files.createTempDirectory("graft_compact_part").toString
    spark.range(3000)
      .select($"id", ($"id" % 3).cast("string").as("part"), md5($"id".cast("string")).as("payload"))
      .repartition(8)
      .write.mode("overwrite").partitionBy("part").parquet(out)
    val expected = spark.read.parquet(out).orderBy($"id").collect()

    val (visited, rewritten) = Maintenance.compactPartitioned(spark, out, targetFileBytes = 1L << 30)
    assert(visited == 3 && rewritten == 3, s"visited=$visited rewritten=$rewritten")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    for (p <- Seq("0", "1", "2")) {
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/part=$p"))
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      assert(files.length == 1, s"part=$p has ${files.length} files after compaction")
    }
    // rows AND partition-column values survive (partition value lives in
    // the directory name, which the swap preserves)
    assert(spark.read.parquet(out).orderBy($"id").collect().sameElements(expected))
  }

  test("readEvolved unions evolved schemas, padding old files with null") {
    val out = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$out/f1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$out/f2")
    val df = Maintenance.readEvolved(spark, s"$out/f*")
    assert(df.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = df.orderBy($"id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }
}
