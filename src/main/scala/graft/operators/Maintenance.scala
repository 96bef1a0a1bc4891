package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table-maintenance operators: the operational half of the 100 TB
  * story. Streaming ingest and per-keyword appends (the reference's
  * accumulation pattern) produce many small files; scan throughput
  * collapses when file count dominates (per-file open/footer cost,
  * tiny row groups, starved vectorized reads). Compaction rewrites a
  * directory to size-targeted files — run it behind the ingest
  * watermark, partition by partition.
  */
object Maintenance {

  /** Rewrite the parquet directory at `path` into ~`targetFileBytes`
    * files (estimated from the CURRENT compressed on-disk size, which
    * already reflects this data's encoding — not raw row width).
    * Two-phase for crash safety: write to a sibling temp dir, then
    * atomically swap via rename — a reader never sees a half-compacted
    * directory. Returns (filesBefore, filesAfter). */
  def compactParquet(
      spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes=$targetFileBytes must be positive")
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val before = dataFiles.length
    val totalBytes = dataFiles.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (targetFiles >= before) return (before, before) // already compact

    val tmp = new org.apache.hadoop.fs.Path(path + "_compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale crash leftover
    // repartition (not coalesce): coalesce would fuse the READ tasks and
    // lose scan parallelism; compaction is I/O bound, keep the scan wide
    spark.read.parquet(path)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(path + "_compact_old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(dir, bak)) throw new java.io.IOException(s"rename $dir -> $bak failed")
    if (!fs.rename(tmp, dir)) {
      fs.rename(bak, dir) // roll back — original intact
      throw new java.io.IOException(s"rename $tmp -> $dir failed; original restored")
    }
    fs.delete(bak, true)
    val after = fs.listStatus(dir).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    (before, after)
  }

  /** Read a parquet directory whose files have EVOLVED schemas (columns
    * added over time) as the union schema, older files padding the new
    * columns with null — the append-only ingest reality at scale.
    * mergeSchema costs a footer read per file; production pins the
    * result schema in a catalog instead of re-merging per query, which
    * is why this is explicit and not the default reader. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
