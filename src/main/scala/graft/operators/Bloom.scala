package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcast-Bloom semi-join: the 100 TB decontamination pattern.
  *
  * A plain semi-join against a small "forbidden" set (eval-benchmark
  * shingles, blocklists) already broadcasts the small side — but every
  * corpus row still runs the hash-probe inside the join operator, and in
  * a multi-stage pipeline the big side may have been shuffled to get
  * here. A Bloom filter of the small side pushes a cheap bitset probe
  * AHEAD of the join: ~all non-members are discarded map-side at
  * ~1.2 bytes/member of broadcast cost (vs the full key set), and only
  * the ~fpp false-positive survivors reach the exact confirm join.
  *
  * CORRECTNESS IS NOT PROBABILISTIC: a Bloom filter has no false
  * negatives, so prefilter + exact confirm ≡ the plain semi-join,
  * row-for-row (the DuckDB oracle of q_bloom_decontaminate checks
  * exactly that). The fpp knob trades broadcast size against confirm
  * work only.
  *
  * This mirrors what Spark's own runtime-filter optimization
  * (spark.sql.optimizer.runtime.bloomFilter.enabled) injects for shuffle
  * joins — exposed as an explicit operator so pipelines can apply it to
  * joins the optimizer won't see through (e.g. across a cache boundary
  * or a UDF-opaque stage).
  */
object Bloom {

  /** Exact semi-join of `big` on `keyCol` against `small.smallKey`,
    * Bloom-prefiltered. `expectedItems` sizes the filter (overestimate =
    * more broadcast bytes, underestimate = more confirm work — never
    * wrong results). The single action on the SMALL side builds the
    * filter; the big side stays lazy/distributed. */
  def semiJoinLong(
      big: DataFrame, keyCol: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1 << 20, fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    // the probe is a native codegen'd expression over the SERIALIZED
    // filter (graft.expressions.BloomMightContainLong): the bytes ride
    // the stage's broadcast task binary, and the per-row probe runs
    // unboxed inside WholeStageCodegen (the previous ScalaUDF boxed
    // every key). PREFILTER only — the confirm join below restores
    // exactness, so a probe quirk could only cost speed, never rows.
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.expressions.BloomMightContainLong(
        org.apache.spark.sql.graftshim.ColumnShim.expression(col(keyCol).cast("long")),
        bos.toByteArray))
    // no .distinct() on the build side: left-semi ignores build-side
    // duplicates, so deduplicating here would only add an exchange
    big.filter(probe)
      .join(broadcast(small.select(col(smallKey).as(keyCol))),
        Seq(keyCol), "left_semi")
  }
}
