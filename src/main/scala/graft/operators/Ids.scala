package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable row enumeration for corpus assembly: assign every row a
  * CONTIGUOUS global id (0..N-1) in a declared sort order — the "give
  * each training example a stable index" step that precedes sharding,
  * sequence packing, and resumable iteration.
  *
  * Why an operator at all — the two obvious formulations both fail at
  * scale:
  *  - `row_number() OVER (ORDER BY ...)` collapses the corpus onto ONE
  *    partition (a global window has a single partition by definition) —
  *    the 100 TB anti-pattern;
  *  - `monotonically_increasing_id()` is distributed but NOT contiguous
  *    (ids jump by 2³³ between partitions), so downstream arithmetic on
  *    id ranges (shard = id / shardSize, resume offsets) breaks.
  *
  * The scalable shape is range-partition + per-partition offsets:
  * `repartitionByRange` puts partition p strictly before partition p+1
  * in sort order, `sortWithinPartitions` orders within, and RDD
  * `zipWithIndex` then numbers rows with one lightweight count job
  * (O(partitions) longs to the driver — the per-partition counts, i.e.
  * the offset table) followed by one map. Total cost: one range shuffle
  * + one extra pass; no global sort bottleneck, no driver data
  * collection beyond the offset table.
  */
object Ids {

  /** Append a contiguous 0-based `idName` column assigning each row its
    * rank under `sortCols`. `sortCols` must be a TOTAL order (unique,
    * non-null) — under ties the ids remain contiguous and deterministic
    * per run but tie order is partition-internal, not a semantic rank.
    *
    * The range-partitioned sort is materialized through [[Caches]] so
    * zipWithIndex's two passes (count job + map job) sort only once.
    * `numPartitions <= 0` uses the session shuffle-partition setting. */
  def contiguousRowIds(
      df: DataFrame, sortCols: Seq[Column],
      idName: String = "row_id", numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "contiguousRowIds needs at least one sort column")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = Caches.register(
      df.repartitionByRange(parts, sortCols: _*).sortWithinPartitions(sortCols: _*))
    val schema = StructType(
      StructField(idName, LongType, nullable = false) +: sorted.schema.fields)
    val withIds = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(idx +: row.toSeq)
    }
    spark.createDataFrame(withIds, schema)
  }
}
