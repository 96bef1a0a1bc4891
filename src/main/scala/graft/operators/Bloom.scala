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
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    // the one UDF in the repo that earns its keep: the probe needs the
    // broadcast sketch object, which no Column expression can reach.
    // It is a PREFILTER only — the confirm join below restores exactness,
    // so a UDF-evaluation quirk could only cost speed, never correctness.
    val mightContain = udf((x: java.lang.Long) =>
      x != null && bcast.value.mightContainLong(x))
    // no .distinct() on the build side: left-semi ignores build-side
    // duplicates, so deduplicating here would only add an exchange
    big.filter(mightContain(col(keyCol)))
      .join(broadcast(small.select(col(smallKey).as(keyCol))),
        Seq(keyCol), "left_semi")
  }
}
