package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as primitives — built from
  * exchange/window built-ins with the scalable shapes:
  *
  *  - **as-of join**: one shuffle on the key (union both sides, window
  *    last_value) instead of an inequality join's O(n·m) explosion;
  *  - **range join**: time-bucketing bounds the candidate cross product
  *    to adjacent buckets (the standard interval-join decomposition).
  */
object TemporalJoins {

  /** For each left row (key, ts), attach the latest right row with
    * rightTs <= ts (inner semantics: unmatched left rows dropped).
    *
    * Implementation: tag right rows 0 / left rows 1, union, and take the
    * running last non-null right payload per key ordered by (ts, tag) —
    * right rows sort before left rows at equal timestamps so `<=` holds.
    * ONE shuffle on the key; state per row is one payload struct. Right
    * side must be unique per (key, rightTs) for deterministic output —
    * pre-aggregate if needed.
    *
    * NULL keys never match (standard equality-join / ASOF semantics):
    * both inputs are filtered to non-null keys up front — without the
    * filter, SQL null-grouping would co-partition NULL-key left rows with
    * NULL-key right rows and fabricate matches. */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val pay = struct(payloadCols.map(col): _*)
    val r = right.filter(col(rightKey).isNotNull)
      .select(col(rightKey).as("_k"), col(rightTs).cast("timestamp").as("_t"),
        pay.as("_pay"), lit(0).as("_tag"))
    val leftCols = left.columns.toSeq
    val l = left.filter(col(leftKey).isNotNull)
      .select((Seq(col(leftKey).as("_k"), col(leftTs).cast("timestamp").as("_t"),
      lit(null).cast(r.schema("_pay").dataType).as("_pay"), lit(1).as("_tag")) ++
      leftCols.map(col)): _*)
    val unioned = r.select((r.columns.map(col) ++
      leftCols.map(c => lit(null).cast(l.schema(c).dataType).as(c))).toSeq: _*)
      .unionByName(l)
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_matched", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1 && col("_matched").isNotNull)
      .select(leftCols.map(col) :+ col("_matched"): _*)
  }

  /** All pairs (a, b) with equal keys and tsB within (tsA, tsA + window]:
    * bucketize time by `window`, join each row to its own and the next
    * bucket, filter exactly. Candidates are bounded by bucket occupancy —
    * never the full per-key cross product. */
  def rangeJoinForward(
      df: DataFrame, key: String, ts: String, idCol: String,
      windowSeconds: Long): DataFrame = {
    val us = windowSeconds * 1000000L
    val withBucket = df.select(col(key).as("k"), col(idCol).as("id"),
      unix_micros(col(ts)).as("t"))
      .withColumn("bucket", (col("t") / us).cast("long"))
    // b.t > a.t ⇒ b.bucket ∈ {a.bucket, a.bucket+1}; probe b at
    // {bucket, bucket-1} so a.bucket == pbucket covers exactly those
    val probes = withBucket.withColumn("pbucket",
      explode(array(col("bucket"), col("bucket") - 1)))
    withBucket.as("a").join(probes.as("b"),
        col("a.k") === col("b.k") && col("a.bucket") === col("b.pbucket") &&
          col("b.t") > col("a.t") && col("b.t") <= col("a.t") + us &&
          col("a.id") =!= col("b.id"))
      .select(col("a.k").as("key"), col("a.id").as("id_a"), col("b.id").as("id_b"))
  }
}
