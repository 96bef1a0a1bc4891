package graft.operators

import graft.expressions.KmvSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-join output-size estimation from KMV sketches — the planning
  * utility behind "should this join broadcast / can we afford it":
  * one cheap aggregate per side (count + a k-min hash set, both
  * partial-aggregated), then pure driver-side arithmetic on 2·k longs.
  * Nothing joins, nothing shuffles beyond the two tiny aggregates —
  * at 100 TB this answers in the time of two column scans.
  *
  * Model: |A ⋈ B| ≈ |keys(A) ∩ keys(B)| · mult(A) · mult(B), where
  * mult = rows / distinct-keys (uniform-multiplicity assumption — the
  * estimate degrades on skewed multiplicity, which is exactly when you
  * should also be running [[Skew]] mitigations). The distinct
  * intersection comes from the classic KMV combination: take the k
  * smallest of the union of the two k-min sets; the fraction of those
  * present in BOTH sketches times the union-cardinality estimate is the
  * intersection estimate (Beyer et al., SIGMOD'07). Standard error
  * ~1/sqrt(k).
  */
object JoinSizeEstimator {

  /** Per-side sketch: row count, KMV k-min set, distinct estimate. */
  final case class SideSketch(rows: Long, kminSet: Array[Long], k: Int) {
    def distinctEstimate: Long = KmvSketch.estimateFromSortedKeys(kminSet, k)
  }

  /** One pass over `df`: total rows + the k-min set of `keyCol`. */
  def sketchSide(df: DataFrame, keyCol: String, k: Int = 1024): SideSketch = {
    val row = df.agg(
      count(col(keyCol)).as("n"),
      KmvSketch.kmvSet(col(keyCol), k).as("s")).first()
    SideSketch(row.getLong(0), row.getSeq[Long](1).toArray, k)
  }

  /** Distinct-key INTERSECTION estimate from two same-k sketches. */
  def intersectionEstimate(a: SideSketch, b: SideSketch): Long = {
    require(a.k == b.k, s"sketches built with different k: ${a.k} vs ${b.k}")
    val aSet = a.kminSet.toSet
    val bSet = b.kminSet.toSet
    val union = (a.kminSet ++ b.kminSet).distinct.sorted.take(a.k)
    if (union.isEmpty) return 0L
    val inBoth = union.count(x => aSet.contains(x) && bSet.contains(x))
    // union-cardinality estimate from the combined sketch (exact when
    // the union fits under k), scaled by the both-fraction
    val unionEst = KmvSketch.estimateFromSortedKeys(union, a.k)
    math.round(unionEst * (inBoth.toDouble / union.length))
  }

  /** Estimated |A ⋈ B| on aKey = bKey. The key COLUMNS must share one
    * data type: XxHash64 hashes an int and a long of equal value to
    * UNRELATED hashes, so a type mismatch would estimate ~0 for a join
    * Spark would happily coerce and execute large — the utility whose
    * job is that decision must refuse rather than mislead. */
  def estimateJoinRows(
      a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      k: Int = 1024): Long = {
    val at = a.schema(aKey).dataType
    val bt = b.schema(bKey).dataType
    require(at == bt,
      s"join key types differ ($aKey: ${at.simpleString} vs $bKey: ${bt.simpleString}) — " +
        "hashes of equal values diverge across types; cast one side explicitly first")
    val sa = sketchSide(a, aKey, k)
    val sb = sketchSide(b, bKey, k)
    val inter = intersectionEstimate(sa, sb)
    val multA = sa.rows.toDouble / math.max(1L, sa.distinctEstimate)
    val multB = sb.rows.toDouble / math.max(1L, sb.distinctEstimate)
    math.round(inter * multA * multB)
  }

  /** The estimator made ACTIONABLE: refuse to launch a join whose
    * estimated output explodes past `maxBlowup` × the larger input.
    * At 100 TB an unnoticed many-to-many key (a "both sides keyed by
    * country" mistake) turns a 1-hour job into a cluster-filling
    * incident; this guard costs two sketch aggregates and fails in
    * seconds instead. The estimate carries ~1/sqrt(k) error and
    * degrades on skewed multiplicity, so `maxBlowup` is a safety rail
    * (an order of magnitude), not a precision budget — legitimate
    * fan-out joins pass a higher threshold explicitly. */
  def guardedJoin(
      a: DataFrame, b: DataFrame, aKey: String, bKey: String,
      maxBlowup: Double = 4.0, k: Int = 1024): DataFrame = {
    require(maxBlowup > 0, s"maxBlowup=$maxBlowup must be positive")
    val est = estimateJoinRows(a, aKey, b, bKey, k)
    val bigger = math.max(
      a.select(aKey).count(), b.select(bKey).count())
    require(est <= maxBlowup * math.max(1L, bigger),
      f"guardedJoin: estimated output $est%,d rows exceeds $maxBlowup%.1fx the " +
        f"larger input ($bigger%,d) — a many-to-many key explosion. " +
        "Pre-aggregate a side, join on a finer key, or raise maxBlowup explicitly.")
    a.join(b, col(aKey) === col(bKey))
  }
}
