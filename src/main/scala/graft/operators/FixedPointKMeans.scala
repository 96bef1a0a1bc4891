package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd KMeans in SHIFTED-INTEGER fixed point — every
  * quantity an exact integer, every step replayable in any SQL engine:
  *
  *  - coordinates quantize to `floor(x·1e6 + 0.5) + 16e6` (the shift
  *    keeps every value, and therefore every per-cluster coordinate
  *    SUM, non-negative — where Spark's truncating `DIV` and DuckDB's
  *    flooring `//` agree);
  *  - init is the k smallest ids' vectors (deterministic, samplable);
  *  - assignment is argmin of integer squared distance with (distance,
  *    cluster) tie-break;
  *  - the update is the truncating-division per-dimension mean.
  *
  * Scale shape: assignment is a MAP-SIDE fold over a k×d centroid
  * literal (nested higher-order aggregates — no explode, no
  * per-candidate shuffle); the update is one partial-aggregated
  * (cluster, dim) rollup; the driver holds k×d longs per round, and
  * rounds are independent plans over the cached quantized relation —
  * lineage does not grow (the BPE-merge collect discipline). Integer
  * bounds: per-dim diffs ≤ 3.2e7 → per-vector distance ≤ ~6.5e16;
  * per-cluster coordinate sums overflow past ~5e11 members (widen to
  * Decimal there).
  *
  * [[graft.analytics.CorpusStatsQueries.qKmeans]] runs this under a
  * full unrolled-CTE DuckDB oracle; [[graft.analytics.DocQueries]]'
  * q_ivf_topk uses it as the IVF coarse quantizer, which is what makes
  * the ACTUAL probe result rows oracle-replayable. */
object FixedPointKMeans {

  val QScale = 1000000L
  val QShift = 16000000L

  /** Map-side quantization of a double vector column.
    *
    * Coordinates outside [−16, 16] FAIL LOUDLY: the +16e6 shift is what
    * keeps every per-cluster coordinate sum non-negative — the regime
    * where Spark's truncating DIV equals DuckDB's flooring `//`. A
    * silent out-of-range coordinate would instead surface rounds later
    * as a one-off centroid disagreement in the hash gate with no hint
    * of the cause (embeddings are unit-ish scaled; ±16 is far outside
    * any normalized encoder's range, so the guard never fires on valid
    * input). */
  def quantize(vec: Column): Column =
    transform(vec.cast("array<double>"), { x =>
      // NOT(x in range) rather than (x out of range): both orderings are
      // false for NaN, so `x < -16 || x > 16` would wave a NaN through to
      // a silent long cast — the negated form routes NaN to raise_error,
      // matching quantizeLocal's rejection exactly
      val guarded = when(!(x >= -16.0 && x <= 16.0),
        raise_error(concat(
          lit("FixedPointKMeans.quantize: coordinate out of [-16, 16] ("),
          x.cast("string"),
          lit(") — the non-negativity shift no longer holds; rescale the vectors first")))
          .cast("double"))
        .otherwise(x)
      floor(guarded * QScale + 0.5).cast("long") + QShift
    })

  /** Driver-side quantization — bit-identical to [[quantize]] (same
    * IEEE multiply/add/floor sequence, same range guard). */
  def quantizeLocal(v: Seq[Double]): Seq[Long] =
    v.map { x =>
      require(x >= -16.0 && x <= 16.0,
        s"FixedPointKMeans.quantizeLocal: coordinate out of [-16, 16] ($x) — " +
          "the non-negativity shift no longer holds; rescale the vectors first")
      math.floor(x * QScale + 0.5).toLong + QShift
    }

  /** Integer squared distance, driver-side. */
  def sqDistLocal(a: Seq[Long], b: Seq[Long]): Long =
    a.iterator.zip(b.iterator).map { case (x, y) => (x - y) * (x - y) }.sum

  /** struct(j, d): argmin cluster and its integer squared distance,
    * computed map-side against the centroid matrix. Routed through the
    * fused native kernel [[graft.expressions.KMeansAssignExpr]]
    * (`graft_kmeans_assign`): the former declarative nested-HOF fold
    * paid an interpreted lambda + a zip_with allocation PER CANDIDATE,
    * which measured ~100× slower than raw long arithmetic once k grew
    * to the q_semdedup ⌊√N⌋ ladder (68 s of fit at sf1 → sub-second).
    * Semantics are bit-identical: strict `<` keeps the earliest
    * candidate on distance ties (cents arrive in ascending-j order),
    * and the empty-centroid accumulator is (j = −1, d = Long.MaxValue). */
  def bestOf(v: Column, cents: Seq[(Int, Seq[Long])]): Column =
    call_function("graft_kmeans_assign", v,
      typedLit(cents.map(_._1).toArray),
      typedLit(cents.flatMap(_._2).toArray))

  /** Add (cluster, dist) to an already-quantized relation. */
  def assign(quantized: DataFrame, vCol: String,
      cents: Seq[(Int, Seq[Long])]): DataFrame =
    quantized.withColumn("best", bestOf(col(vCol), cents))
      .withColumn("cluster", col("best.j"))
      .withColumn("dist", col("best.d"))
      .drop("best")

  /** `rounds` Lloyd updates over the quantized relation (cache it —
    * every round scans it). Returns the final centroids ordered by
    * cluster id. */
  def fit(quantized: DataFrame, idCol: String, vCol: String,
      k: Int, rounds: Int): Seq[(Int, Seq[Long])] = {
    require(k >= 1 && rounds >= 0, s"k=$k rounds=$rounds")
    var cents: Seq[(Int, Seq[Long])] = quantized.orderBy(col(idCol)).limit(k)
      .select(col(vCol)).collect().zipWithIndex
      .map { case (r, j) => (j, r.getSeq[Long](0)) }.toSeq
    for (_ <- 1 to rounds) {
      cents = assign(quantized, vCol, cents)
        .select(col("cluster"), posexplode(col(vCol)))
        .toDF("cluster", "pos", "x")
        .groupBy(col("cluster"), col("pos"))
        .agg(expr("sum(x) DIV count(1)").as("m"))
        .groupBy(col("cluster"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cluster"), transform(col("pm"), p => p("m")).as("c"))
        .collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toSeq
        .sortBy(_._1)
    }
    cents
  }
}
