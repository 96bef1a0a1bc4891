package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

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
    * Two-phase: write to a temp dir, then swap via two renames. Helper
    * dirs live under `scratch` when given (REQUIRED when `path` is a
    * partition leaf — siblings of a leaf are inside the dataset root
    * and would be read as bogus partitions); default is the
    * `<path>_compact_*` siblings, fine for flat standalone dirs.
    * The swap is NOT atomic (plain filesystems have no atomic directory
    * replace): a crash between the renames leaves the data intact at
    * the backup location, and the next compactParquet call on the same
    * path + scratch RECOVERS it automatically before proceeding.
    * Readers racing the swap window can fail with path-not-found and
    * should retry — run compaction behind the ingest watermark; true
    * reader isolation needs a transactional table format on top.
    * Returns (filesBefore, filesAfter).
    *
    * Flat directories only: a PARTITIONED layout must go through
    * [[compactPartitioned]] — passing a partitioned root here throws
    * rather than silently reporting "already compact". */
  def compactParquet(
      spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      scratch: Option[String] = None): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes=$targetFileBytes must be positive")
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = scratch.getOrElse(path + "_compact")
    val bak = new Path(base + "_old")
    val tmp = new Path(base + "_tmp")
    // crash recovery: a previous run that died between its two renames
    // left the original at the backup location and nothing at path
    if (!fs.exists(dir) && fs.exists(bak)) {
      if (!fs.rename(bak, dir))
        throw new java.io.IOException(s"recovery rename $bak -> $dir failed")
      System.err.println(s"[maintenance] recovered $dir from interrupted compaction")
    } else if (fs.exists(dir) && fs.exists(bak)) {
      // prior run crashed after the tmp->dir rename but before delete(bak):
      // dir holds the committed result and the backup is a stale full copy.
      // Without this, a now-compact dir takes the early return below and the
      // duplicate lives forever.
      fs.delete(bak, true)
      System.err.println(s"[maintenance] removed stale backup $bak from completed compaction")
    }
    val children = fs.listStatus(dir).filterNot { st =>
      val n = st.getPath.getName
      n.startsWith("_") || n.startsWith(".")
    }
    val subDirs = children.filter(_.isDirectory)
    require(subDirs.isEmpty,
      s"$path contains subdirectories (${subDirs.take(3).map(_.getPath.getName).mkString(", ")}...) — " +
        "use compactPartitioned on the partitioned root")
    val dataFiles = children.filter(_.isFile)
    val before = dataFiles.length
    val totalBytes = dataFiles.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (targetFiles >= before) return (before, before) // already compact

    if (fs.exists(tmp)) fs.delete(tmp, true) // stale crash leftover
    fs.mkdirs(tmp.getParent)
    // repartition (not coalesce): coalesce would fuse the READ tasks and
    // lose scan parallelism; compaction is I/O bound, keep the scan wide
    spark.read.parquet(path)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
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
    * (`k=v` path segments, arbitrarily nested), or a flat directory
    * (delegates to [[compactParquet]]). Each leaf compacts
    * independently — the unit of both the write and crash recovery is
    * one partition, so a failure mid-sweep leaves every other partition
    * untouched and the sweep is safely re-runnable.
    *
    * All helper state lives under `<root>_compact_scratch` — a SIBLING
    * of the root, never inside it, so concurrent readers of the root
    * can never discover temp/backup data as extra partitions (they can
    * only see a leaf briefly missing during its swap window). Each
    * leaf's scratch area is keyed by the hex of its root-relative path
    * and carries a LEAF marker recording that path, which the recovery
    * sweep at the start of every run uses to restore interrupted leaves
    * before compacting further. Returns
    * (leaves visited, leaves actually rewritten). */
  def compactPartitioned(
      spark: SparkSession, root: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratchRoot = new Path(root.stripSuffix("/") + "_compact_scratch")
    recoverInterrupted(fs, rootPath, scratchRoot)
    def leaves(p: Path): Seq[Path] = {
      val subDirs = fs.listStatus(p).filter(st =>
        st.isDirectory && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      if (subDirs.isEmpty) Seq(p) else subDirs.toSeq.flatMap(st => leaves(st.getPath))
    }
    val leafDirs = leaves(rootPath)
    if (leafDirs == Seq(rootPath)) { // flat dir: no partitions — delegate
      val (b, a) = compactParquet(spark, root, targetFileBytes)
      return (1, if (a < b) 1 else 0)
    }
    var rewritten = 0
    leafDirs.foreach { leaf =>
      val rel = rootPath.toUri.relativize(leaf.toUri).getPath
      val key = rel.getBytes("UTF-8").map(b => f"$b%02x").mkString
      val leafScratch = new Path(scratchRoot, key)
      fs.mkdirs(leafScratch)
      writeMarker(fs, new Path(leafScratch, "LEAF"), rel)
      val (before, after) = compactParquet(spark, leaf.toString, targetFileBytes,
        scratch = Some(new Path(leafScratch, "swap").toString))
      fs.delete(leafScratch, true)
      if (after < before) rewritten += 1
    }
    // empty scratch root left behind only if every leaf cleaned up
    if (fs.exists(scratchRoot) && fs.listStatus(scratchRoot).isEmpty)
      fs.delete(scratchRoot, false)
    (leafDirs.size, rewritten)
  }

  /** Restore any leaf whose previous compaction died mid-swap: its
    * scratch area still holds `swap_old` (the original data) and the
    * LEAF marker naming where it belongs. Partial new output at the
    * leaf path (no swap_old consumed → the write never committed its
    * rename) is discarded in favor of the original. */
  private def recoverInterrupted(fs: FileSystem, rootPath: Path, scratchRoot: Path): Unit = {
    if (!fs.exists(scratchRoot)) return
    fs.listStatus(scratchRoot).filter(_.isDirectory).foreach { st =>
      val old = new Path(st.getPath, "swap_old")
      val marker = new Path(st.getPath, "LEAF")
      if (fs.exists(old) && fs.exists(marker)) {
        val rel = readMarker(fs, marker)
        val leaf = new Path(rootPath, rel)
        if (fs.exists(leaf)) fs.delete(leaf, true) // incomplete replacement
        if (!fs.rename(old, leaf))
          throw new java.io.IOException(s"recovery rename $old -> $leaf failed")
        System.err.println(s"[maintenance] recovered partition $rel from interrupted sweep")
      }
      fs.delete(st.getPath, true)
    }
  }

  private def writeMarker(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def readMarker(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Z-ORDER clustered rewrite: lay the table out along a Morton
    * (bit-interleaved) curve over `cols` so range predicates on ANY of
    * the clustered columns touch few files / row groups — the
    * multi-column generalization of sort-by-one-key, and the standard
    * data-clustering lever for 100 TB scan pruning (parquet min/max
    * stats do the skipping at read time; this write makes those stats
    * selective for every clustered column at once, where a plain sort
    * makes them selective for the FIRST column only).
    *
    * Column values map to `2^bits` rank buckets via approx-quantile
    * boundaries (one bounded driver collect of 2^bits doubles per
    * column — never a global sort of the data), the bucket indices
    * bit-interleave into the Morton code as a pure Column expression,
    * and `repartitionByRange(numFiles, morton)` + an in-partition sort
    * write the curve order. NULLs rank in bucket 0 (they cluster
    * together at the curve start). Returns the written file count. */
  def writeZOrdered(
      spark: SparkSession, df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 8): Int = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2, "z-ordering one column is just a sort — use sortWithinPartitions")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits=$bits x ${cols.size} cols must fit a long")
    val nb = 1 << bits
    // approx-quantile bucket boundaries per column: (nb - 1) inner cuts.
    // relativeError 1/(4·nb) keeps bucket occupancy near-uniform; the
    // collect is 2^bits doubles per column of DRIVER state, nothing more.
    val bounds: Map[String, Array[Double]] = cols.map { c =>
      val ps = (1 until nb).map(_.toDouble / nb).toArray
      c -> df.stat.approxQuantile(c, ps, 1.0 / (4 * nb))
    }.toMap
    def bucket(c: String): org.apache.spark.sql.Column = {
      // binary-search-free rank: a chain of <= comparisons summed — nb-1
      // codegen'd integer adds per row, no UDF
      val x = col(c).cast("double")
      bounds(c).foldLeft(lit(0)) { (acc, b) =>
        acc + when(x.isNotNull && x > lit(b), 1).otherwise(0)
      }
    }
    val morton = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, ci)) =>
        a.bitwiseOR(shiftleft(
          shiftright(bucket(c).cast("long"), i).bitwiseAND(lit(1L)),
          i * cols.size + ci))
      }
    }
    df.withColumn("_z", morton)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(path)).count(_.getPath.getName.endsWith(".parquet"))
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
