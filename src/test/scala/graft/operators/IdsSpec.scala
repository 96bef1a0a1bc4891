package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contiguity, ordering, and determinism of the distributed row
  * enumeration — specifically ACROSS partition boundaries, which is the
  * part a global-window formulation gets for free and the distributed
  * one must earn via the offset table. */
class IdsSpec extends SparkSpec {

  private def table(n: Int) = {
    import spark.implicits._
    // keys deliberately NOT in insertion order, with gaps — ids must
    // follow key order, not input order or key arithmetic
    (0 until n).map(i => ((i * 131) % n * 10 + 3, s"v$i")).toDF("k", "v")
  }

  test("ids are contiguous 0..N-1 and follow sort order across partitions") {
    val n = 1000
    val out = Ids.contiguousRowIds(table(n), Seq(col("k")), numPartitions = 7)
    val rows = out.orderBy("row_id").collect()
    assert(rows.length === n)
    assert(rows.map(_.getLong(0)).toSeq === (0L until n.toLong))
    val keysInIdOrder = rows.map(_.getInt(1)).toSeq
    assert(keysInIdOrder === keysInIdOrder.sorted,
      "id order must equal key order across all partition boundaries")
  }

  test("enumeration is deterministic across runs and partition counts") {
    val df = table(500)
    def run(parts: Int) =
      Ids.contiguousRowIds(df, Seq(col("k")), numPartitions = parts)
        .select("row_id", "k").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = run(3)
    val b = run(3)
    val c = run(11)
    assert(a === b, "same partitioning must reproduce identical ids")
    assert(a === c, "ids are a property of the sort order, not the partition count")
  }

  test("single row and more partitions than rows degrade gracefully") {
    import spark.implicits._
    val one = Seq((42, "x")).toDF("k", "v")
    val out = Ids.contiguousRowIds(one, Seq(col("k")), numPartitions = 8).collect()
    assert(out.length === 1 && out(0).getLong(0) === 0L)
  }
}
