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

  /** Residual shift for PQ-over-residuals pipelines: coarse residuals
    * v − c are SIGNED (each component bounded by ±2·QShift), and a
    * signed coordinate would re-open the floor-vs-truncate divergence
    * between DuckDB's `//` and Spark's `DIV` that QShift exists to
    * close. Adding 2·QShift returns every residual component — and
    * therefore every per-cluster coordinate SUM in a residual-space
    * codebook fit — to the non-negative regime where the two
    * divisions agree. Distances are invariant under a common shift,
    * so the quantization geometry is unchanged. Shared by
    * [[graft.analytics.CorpusStatsQueries]]' q_ivfpq_search oracle
    * replay and the [[IvfPq]] persisted index, which must encode
    * identical codes. */
  val RShift = 2L * QShift

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

  /** struct(j, d, j2, d2): the argmin AND the runner-up, one fused
    * sweep ([[graft.expressions.KMeansAssign2Expr]]). The pair equals
    * the rk ≤ 2 rows of `row_number() over (order by distance,
    * candidate order)` — the oracle's replay shape. */
  def best2Of(v: Column, cents: Seq[(Int, Seq[Long])]): Column =
    call_function("graft_kmeans_assign2", v,
      typedLit(cents.map(_._1).toArray),
      typedLit(cents.flatMap(_._2).toArray))

  /** Add (cluster, cluster2) — the two nearest candidates — to an
    * already-quantized relation; cluster2 is −1 when fewer than two
    * candidates exist. Coarse-cell MULTI-PROBE: the two-level SemDeDup
    * generates dedup candidates from BOTH cells so a pair split by one
    * coarse boundary still meets, while the fit (and the stats-side
    * primary assignment) stays single-cell. */
  def assignTop2(quantized: DataFrame, vCol: String,
      cents: Seq[(Int, Seq[Long])]): DataFrame =
    quantized.withColumn("best", best2Of(col(vCol), cents))
      .withColumn("cluster", col("best.j"))
      .withColumn("cluster2", col("best.j2"))
      .drop("best")

  // ---- two-level (hierarchical) fit ------------------------------------
  //
  // The flat fit's assignment cost is N·k·d per round; at the SemDeDup
  // ladder k = ⌊√N⌋ that term grows as fast as the intra-cluster pair
  // mass shrinks, which is exactly why √N measured as the flat optimum
  // (SCALING.md's k-lever A/B). The two-level fit changes the equation:
  // a COARSE Lloyd over kc = ⌈√k⌉ cells (N·√k·d), then an independent
  // FINE Lloyd per cell over kf = ⌈k/kc⌉ centroids, run for ALL cells in
  // one distributed job per round — each vector only ever scored against
  // its own cell's fine centroids (broadcast join on the cell id + the
  // per-row-candidate kernel graft_kmeans_assign_dyn), so a fine round
  // is N·(k/kc)·d ≈ N·√k·d. Total Θ(N·√k·d) against the flat Θ(N·k·d),
  // with the same exact-integer arithmetic, the same deterministic
  // init/tie-breaks per cell, and therefore the same full SQL
  // replayability (the fine rounds are the flat oracle CTEs with the
  // join keyed by cell).
  //
  // The trade is quality-shaped, not correctness-shaped: fine centroids
  // never cross a coarse boundary, so the partition differs from (and is
  // usually slightly more imbalanced than) the flat k-means partition —
  // the caller's pair-mass/recall measurements decide whether the fit
  // saving is worth it at their N (see q_semdedup vs q_semdedup_2l).

  /** Two-level centroid state: the coarse cells plus every cell's fine
    * centroids under GLOBAL fine ids fj = cc·kf + (seed rank), so
    * cc = fj / kf recovers the cell. `fine` is ascending by fj and only
    * contains centroids that survived their rounds (a fine cluster that
    * empties out vanishes, exactly like the flat fit's). */
  final case class TwoLevelCentroids(
      coarse: Seq[(Int, Seq[Long])],
      kf: Int,
      fine: Seq[(Int, Seq[Long])])

  /** Per-cell candidate table (cc, fids, fflat) for the dyn kernel —
    * fids ascending so the kernel's strict-< argmin keeps the smallest
    * fine id on distance ties, mirroring the flat kernel's contract. */
  private def fineByCell(df: DataFrame, kf: Int,
      fine: Seq[(Int, Seq[Long])]): DataFrame = {
    val rows = fine.groupBy(_._1 / kf).toSeq.map { case (cc, cents) =>
      val sorted = cents.sortBy(_._1)
      (cc, sorted.map(_._1).toArray, sorted.flatMap(_._2).toArray)
    }
    df.sparkSession.createDataFrame(rows).toDF("cc", "fids", "fflat")
  }

  /** Add (fj, fdist) — the within-cell fine argmin — to a relation
    * already carrying a coarse cell id in `ccCol`. Broadcast join on
    * the cell id (the fine matrix is k×d longs — driver/broadcast
    * scale), then one fused per-row argmin over that cell's candidates
    * only. Cells from the fit's own relation always have fine
    * centroids (each member re-assigns within its cell, so cells
    * never empty out), but vectors from OUTSIDE the fit — or assigned
    * with different coarse centroids — can land in an unseeded cell;
    * that is a contract breach and FAILS LOUDLY (left join + guard)
    * rather than silently dropping the row the way an inner join
    * would.
    *
    * `requireSeeded = false` opts INTO the inner-join semantics for the
    * one caller where an unseeded cell is legitimate: the multi-probe
    * RUNNER-UP cell (a centroid can be somebody's second-closest while
    * being nobody's closest, so it may have no members and therefore no
    * fine centroids). There the probe is candidate-generation only — an
    * empty cell simply contributes no candidates. */
  def assignFine(df: DataFrame, vCol: String, ccCol: String,
      kf: Int, fine: Seq[(Int, Seq[Long])],
      requireSeeded: Boolean = true): DataFrame = {
    val cells = broadcast(fineByCell(df, kf, fine)
      .withColumnRenamed("cc", ccCol))
    if (!requireSeeded) {
      df.join(cells, Seq(ccCol))
        .withColumn("bestf", call_function("graft_kmeans_assign_dyn",
          col(vCol), col("fids"), col("fflat")))
        .withColumn("fj", col("bestf.j"))
        .withColumn("fdist", col("bestf.d"))
        .drop("bestf", "fids", "fflat")
    } else
    df.join(cells, Seq(ccCol), "left")
      .withColumn("bestf", when(col("fids").isNull,
          raise_error(concat(
            lit("FixedPointKMeans.assignFine: coarse cell "),
            col(ccCol).cast("string"),
            lit(" has no fine centroids — assign out-of-fit vectors with " +
              "the fit's own coarse centroids")))
            .cast("struct<j:int,d:bigint>"))
        .otherwise(call_function("graft_kmeans_assign_dyn",
          col(vCol), col("fids"), col("fflat"))))
      .withColumn("fj", col("bestf.j"))
      .withColumn("fdist", col("bestf.d"))
      .drop("bestf", "fids", "fflat")
  }

  /** The fine-init seed relation (fj, c): each coarse cell's kf
    * smallest ids, numbered fj = cc·kf + rank. Selection rides the
    * bounded-heap [[graft.plans.TopKPerKey]] operator (exposed
    * separately so the spec can assert the plan); the row_number that
    * ranks the seeds runs over the ≤kc·kf survivors only. */
  private[operators] def fineInit(asg: DataFrame, idCol: String,
      vCol: String, kf: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cc")).orderBy(col(idCol))
    graft.plans.TopKPerKey.perKey(asg, Seq("cc"), Seq((idCol, true)), kf)
      .withColumn("rn", row_number().over(w))
      .select((col("cc") * kf + col("rn") - 1).cast("int").as("fj"),
        col(vCol).as("c"))
  }

  /** Two-level fit: coarse Lloyd (kc, `rounds`), final coarse
    * assignment, then per-cell fine Lloyd (kf seeds per cell, `rounds`)
    * with every cell fitting concurrently in the same jobs. Fine init
    * mirrors the flat init per cell: the kf smallest ids IN the cell
    * seed fj = cc·kf + rank. The per-cell selection rides the repo's
    * bounded-heap [[graft.plans.TopKPerKey]] operator — O(N log kf)
    * with the map-side phase pruning each partition to ≤kf rows per
    * cell BEFORE the shuffle, so no full sort of the cell's id
    * relation ever materializes (the former row_number window paid one
    * sorted partition of N/kc rows per cell — the only
    * super-linear-memory step in this fit); the rank that numbers the
    * seeds then runs over the ≤kc·kf surviving rows only. Driver
    * state is k×d longs per round (the flat fit's collect discipline);
    * the coarse-assigned relation is cached for the fine rounds and
    * unpersisted before returning. */
  def fitTwoLevel(quantized: DataFrame, idCol: String, vCol: String,
      kCoarse: Int, kf: Int, rounds: Int): TwoLevelCentroids = {
    require(kCoarse >= 1 && kf >= 1 && rounds >= 0,
      s"kCoarse=$kCoarse kf=$kf rounds=$rounds")
    val coarse = fit(quantized, idCol, vCol, kCoarse, rounds)
    val asg = assign(quantized, vCol, coarse)
      .select(col(idCol), col(vCol), col("cluster").as("cc")).cache()
    try {
      var fine: Seq[(Int, Seq[Long])] = fineInit(asg, idCol, vCol, kf)
        .collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
      for (_ <- 1 to rounds) {
        fine = assignFine(asg, vCol, "cc", kf, fine)
          .select(col("fj"), posexplode(col(vCol)))
          .toDF("fj", "pos", "x")
          .groupBy(col("fj"), col("pos"))
          .agg(expr("sum(x) DIV count(1)").as("m"))
          .groupBy(col("fj"))
          .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
          .select(col("fj"), transform(col("pm"), p => p("m")).as("c"))
          .collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toSeq
          .sortBy(_._1)
      }
      TwoLevelCentroids(coarse, kf, fine)
    } finally { asg.unpersist(); () }
  }

  /** Full two-level assignment of an (already-quantized) relation that
    * was part of the fit: coarse argmin (flat kernel, kc literal) then
    * the within-cell fine argmin. Adds `cluster` (the GLOBAL fine id)
    * and `dist` — the same contract as [[assign]], so [[SemDeDup]] and
    * the IVF family consume either interchangeably. */
  def assignTwoLevel(quantized: DataFrame, vCol: String,
      tl: TwoLevelCentroids): DataFrame = {
    val withCc = assign(quantized, vCol, tl.coarse)
      .withColumnRenamed("cluster", "cc").drop("dist")
    assignFine(withCc, vCol, "cc", tl.kf, tl.fine)
      .withColumnRenamed("fj", "cluster")
      .withColumnRenamed("fdist", "dist")
      .drop("cc")
  }

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
