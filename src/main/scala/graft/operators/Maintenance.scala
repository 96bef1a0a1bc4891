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
    * Two-phase: write to a sibling temp dir, then swap via two renames.
    * The swap is NOT atomic (plain filesystems have no atomic directory
    * replace): a crash between the renames leaves the data intact at
    * `<path>_compact_old`, and the next compactParquet call on the same
    * path RECOVERS it automatically before proceeding. Readers racing
    * the swap window can fail with path-not-found and should retry —
    * run compaction behind the ingest watermark; true reader isolation
    * needs a transactional table format on top. Returns
    * (filesBefore, filesAfter).
    *
    * Flat directories only: a PARTITIONED layout must be compacted per
    * partition directory (compact the leaves, not the root) — passing a
    * partitioned root throws rather than silently reporting
    * "already compact". */
  def compactParquet(
      spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes=$targetFileBytes must be positive")
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bakEarly = new org.apache.hadoop.fs.Path(path + "_compact_old")
    // crash recovery: a previous run that died between its two renames
    // left the original at _compact_old and nothing at path
    if (!fs.exists(dir) && fs.exists(bakEarly)) {
      if (!fs.rename(bakEarly, dir))
        throw new java.io.IOException(s"recovery rename $bakEarly -> $dir failed")
      System.err.println(s"[maintenance] recovered $dir from interrupted compaction")
    }
    val children = fs.listStatus(dir).filterNot { st =>
      val n = st.getPath.getName
      n.startsWith("_") || n.startsWith(".")
    }
    val subDirs = children.filter(_.isDirectory)
    require(subDirs.isEmpty,
      s"$path contains subdirectories (${subDirs.take(3).map(_.getPath.getName).mkString(", ")}...) — " +
        "compact each partition directory individually, not the partitioned root")
    val dataFiles = children.filter(_.isFile)
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

  /** Compact every leaf partition directory under a partitionBy root
    * (`k=v` path segments, arbitrarily nested). Each leaf compacts
    * independently — the unit of both the write and any crash recovery
    * is one partition, so a failure mid-sweep leaves every other
    * partition untouched and the sweep is safely re-runnable. Returns
    * (leaves visited, leaves actually rewritten). */
  def compactPartitioned(
      spark: SparkSession, root: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val subDirs = fs.listStatus(p).filter(st =>
        st.isDirectory && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      if (subDirs.isEmpty) Seq(p) else subDirs.toSeq.flatMap(st => leaves(st.getPath))
    }
    val leafDirs = leaves(rootPath).filterNot(_ == rootPath)
    var rewritten = 0
    leafDirs.foreach { leaf =>
      val (before, after) = compactParquet(spark, leaf.toString, targetFileBytes)
      if (after < before) rewritten += 1
    }
    (leafDirs.size, rewritten)
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
