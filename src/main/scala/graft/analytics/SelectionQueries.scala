package graft.analytics

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Multiple-testing, conformal-prediction and sequential-decision
  * queries — the statistical release gates a data/experimentation team
  * runs AFTER the per-cell metrics exist (reference scope: the AB-test
  * and KPI surface of `analysis.py` / `dashboard`, extended to the
  * decision procedures that control error rates when MANY cells are
  * tested at once, when an interval needs finite-sample validity, and
  * when the test is sequential over an event stream).
  *
  * Determinism: every decision boundary is compared in INTEGER ppm /
  * milli-cent space (floor(x·1e6+0.5) of values derived from exact
  * integer moments), so the accept/reject step — the discontinuous part
  * — can never be flipped by a last-ulp difference between engines.
  * The only transcendental is the logistic p-value surrogate in
  * q_bh_fdr, quantized to ppm before any comparison.
  *
  * Scale shape: all three queries aggregate the fact table down to a
  * bounded panel (cells × 1, priorities × 1, buckets × 1) with map-side
  * combine before any window runs; the windows order cells/ranks, never
  * raw facts — except q_sprt, whose per-bucket cumulative LLR is the
  * operator itself (a hash-partitioned running sum, the same shape as
  * q_cusum, and exactly what it would be on a 1000-executor cluster).
  */
object SelectionQueries {

  private val P = 1000000007L // portable modulus shared with TextHashKernels

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  // -------------------------------------------------------------------
  // Benjamini-Hochberg FDR over the segment × nation panel

  /** BH step-up FDR control (α = 0.05) over one z-test per
    * (mktsegment, nationkey) cell: "is this cell's mean account balance
    * different from the global mean?" — the multiple-comparisons gate
    * the reference's per-category KPI tables need before anyone reads
    * 125 cells as 125 independent findings. Balances go to exact integer
    * cents; z comes from exact decimal moments (n·Q − S² form); the
    * two-sided p-value uses the logistic surrogate Φ(z) ≈ 1/(1+e^(−1.702z))
    * (shared formula both engines) and is quantized to ppm BEFORE the
    * step-up comparison, which then runs entirely on integers:
    * reject i ⟺ i ≤ max{j : p_ppm(j)·m ≤ j·α_ppm}. */
  val qBhFdr = GraftQuery(
    "q_bh_fdr",
    (s, dir) => {
      import s.implicits._
      val cents = floor($"c_acctbal" * 100 + 0.5).cast(LongType)
      val cust = Tables.customer(s, dir)
        .select($"c_mktsegment", $"c_nationkey", cents.as("b"))
      val g = cust.agg(
        count(lit(1)).as("n"),
        dec38(sum(dec38($"b"))).as("s"),
        dec38(sum(dec38($"b") * dec38($"b"))).as("q"))
      val cells = cust.groupBy($"c_mktsegment", $"c_nationkey")
        .agg(count(lit(1)).as("nc"), dec38(sum(dec38($"b"))).as("sc"))
      val z = (dec38($"sc") * $"n" - $"s" * $"nc").cast(DoubleType) *
        sqrt($"nc".cast(DoubleType)) /
        ($"nc".cast(DoubleType) * sqrt((dec38($"n") * $"q" - $"s" * $"s").cast(DoubleType)))
      val withP = cells.crossJoin(broadcast(g))
        .withColumn("z", z)
        .withColumn("p_ppm",
          floor(lit(2e6) / (lit(1.0) + exp(lit(1.702) * abs($"z"))) + 0.5).cast(LongType))
      val m = count(lit(1)).over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
      val i = row_number().over(Window.orderBy($"p_ppm", $"c_mktsegment", $"c_nationkey"))
      val ranked = withP
        .withColumn("i", i).withColumn("m", m)
        .withColumn("pass", when($"p_ppm" * $"m" <= $"i" * 50000L, $"i").otherwise(lit(0L)))
      val istar = max($"pass").over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
      ranked.withColumn("istar", istar)
        .select($"c_mktsegment", $"c_nationkey", $"nc".as("n_cell"),
          round($"z", 6).as("z_score"), $"p_ppm",
          when($"i" <= $"istar", lit(1L)).otherwise(lit(0L)).as("rejected"))
        .orderBy($"p_ppm", $"c_mktsegment", $"c_nationkey")
    },
    Some("""WITH c AS (SELECT c_mktsegment, c_nationkey,
        CAST(FLOOR(c_acctbal * 100 + 0.5) AS HUGEINT) AS b FROM customer),
      g AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(b) AS s, SUM(b * b) AS q FROM c),
      cell AS (SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS HUGEINT) AS nc,
        SUM(b) AS sc FROM c GROUP BY 1, 2),
      zc AS (SELECT c_mktsegment, c_nationkey, nc,
        CAST(sc * n - s * nc AS DOUBLE) * SQRT(CAST(nc AS DOUBLE)) /
          (CAST(nc AS DOUBLE) * SQRT(CAST(n * q - s * s AS DOUBLE))) AS z
        FROM cell, g),
      pp AS (SELECT *, CAST(FLOOR(2e6 / (1.0 + EXP(1.702 * ABS(z))) + 0.5) AS BIGINT) AS p_ppm
        FROM zc),
      rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p_ppm, c_mktsegment, c_nationkey) AS i,
        COUNT(*) OVER () AS m FROM pp),
      st AS (SELECT *, MAX(CASE WHEN p_ppm * m <= i * 50000 THEN i ELSE 0 END) OVER () AS istar
        FROM rk)
      SELECT c_mktsegment, c_nationkey, CAST(nc AS BIGINT) AS n_cell,
        ROUND(z, 6) AS z_score, p_ppm,
        CASE WHEN i <= istar THEN 1 ELSE 0 END AS rejected
      FROM st ORDER BY p_ppm, c_mktsegment, c_nationkey""")
  )

  // -------------------------------------------------------------------
  // Mondrian split-conformal prediction interval

  /** Split-conformal 90% prediction interval for o_totalprice,
    * Mondrian-stratified by order priority: a keyed-PRF 4-way split
    * (2 train : 1 calibration : 1 test), per-priority train-mean model,
    * nonconformity = |y − ŷ| in exact milli-cents (|y·C − S|/C from
    * integer sums — +,−,×,÷ only, all IEEE-exact), q̂ = the
    * ⌈(n_cal+1)·0.9⌉-th smallest calibration score (an explicit order
    * statistic, no interpolation), and empirical coverage on the held-out
    * test split. Finite-sample validity (coverage ≥ 90% in expectation)
    * holds per stratum by exchangeability — the certificate a price
    * predictor ships with. */
  val qConformal = GraftQuery(
    "q_conformal",
    (s, dir) => {
      import s.implicits._
      val u = (lit(48271L) * ((lit(48271L) * (($"o_orderkey" % P) + 1L)) % P)) % P
      val ord = Tables.orders(s, dir).select(
        $"o_orderkey", $"o_orderpriority",
        floor($"o_totalprice" * 100 + 0.5).cast(LongType).as("y"),
        (u % 4).as("split"))
      val model = ord.filter($"split" <= 1).groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_train"), dec38(sum(dec38($"y"))).as("s_train"))
      val scored = ord.filter($"split" >= 2)
        .join(broadcast(model), "o_orderpriority")
        .withColumn("sc_mc",
          floor(abs(dec38($"y") * $"n_train" - $"s_train").cast(DoubleType) /
            $"n_train".cast(DoubleType) * 1000 + 0.5).cast(LongType))
      val cal = scored.filter($"split" === 2)
      val kth = cal.groupBy($"o_orderpriority").agg(count(lit(1)).as("n_cal"))
        .withColumn("k", expr("(9 * (n_cal + 1) + 9) DIV 10"))
      val qhat = cal
        .withColumn("rn", row_number().over(
          Window.partitionBy($"o_orderpriority").orderBy($"sc_mc", $"o_orderkey")))
        .join(broadcast(kth), "o_orderpriority")
        .filter($"rn" === least($"k", $"n_cal"))
        .select($"o_orderpriority", $"n_cal", $"sc_mc".as("qhat_mc"))
      scored.filter($"split" === 3)
        .join(broadcast(qhat), "o_orderpriority")
        .groupBy($"o_orderpriority", $"n_cal", $"qhat_mc")
        .agg(count(lit(1)).as("n_test"),
          sum(when($"sc_mc" <= $"qhat_mc", 1L).otherwise(0L)).as("covered"))
        .select($"o_orderpriority", $"n_cal", $"n_test", $"covered",
          round($"qhat_mc".cast(DoubleType) / 100000.0, 6).as("halfwidth_usd"),
          round($"covered".cast(DoubleType) * 100.0 / $"n_test".cast(DoubleType), 6)
            .as("coverage_pct"))
        .orderBy($"o_orderpriority")
    },
    Some("""WITH o AS (SELECT o_orderkey, o_orderpriority,
        CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS y,
        ((48271 * ((48271 * ((o_orderkey % 1000000007) + 1)) % 1000000007)) % 1000000007) % 4 AS split
      FROM orders),
      model AS (SELECT o_orderpriority, CAST(COUNT(*) AS HUGEINT) AS n_train,
        SUM(CAST(y AS HUGEINT)) AS s_train FROM o WHERE split <= 1 GROUP BY 1),
      scored AS (SELECT o.o_orderkey, o.o_orderpriority, o.split,
        CAST(FLOOR(CAST(ABS(CAST(y AS HUGEINT) * n_train - s_train) AS DOUBLE) /
          CAST(n_train AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS sc_mc
        FROM o JOIN model ON o.o_orderpriority = model.o_orderpriority
        WHERE split >= 2),
      kth AS (SELECT o_orderpriority, COUNT(*) AS n_cal,
        (9 * (COUNT(*) + 1) + 9) // 10 AS k
        FROM scored WHERE split = 2 GROUP BY 1),
      qh AS (SELECT r.o_orderpriority, kth.n_cal, r.sc_mc AS qhat_mc
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
            ORDER BY sc_mc, o_orderkey) AS rn FROM scored WHERE split = 2) r
        JOIN kth ON r.o_orderpriority = kth.o_orderpriority
        WHERE r.rn = LEAST(kth.k, kth.n_cal))
      SELECT t.o_orderpriority, qh.n_cal, COUNT(*) AS n_test,
        CAST(SUM(CASE WHEN t.sc_mc <= qh.qhat_mc THEN 1 ELSE 0 END) AS BIGINT) AS covered,
        ROUND(CAST(qh.qhat_mc AS DOUBLE) / 100000.0, 6) AS halfwidth_usd,
        ROUND(CAST(SUM(CASE WHEN t.sc_mc <= qh.qhat_mc THEN 1 ELSE 0 END) AS DOUBLE)
          * 100.0 / COUNT(*), 6) AS coverage_pct
      FROM scored t JOIN qh ON t.o_orderpriority = qh.o_orderpriority
      WHERE t.split = 3
      GROUP BY t.o_orderpriority, qh.n_cal, qh.qhat_mc
      ORDER BY t.o_orderpriority""")
  )

  // -------------------------------------------------------------------
  // Sequential probability ratio test over the event stream

  /** Wald SPRT on purchase rate, run in 8 parallel PRF-hashed user
    * buckets: H₀ p=0.18 vs H₁ p=0.22, α=0.05, β=0.10. The
    * log-likelihood-ratio walk is an integer cumsum — the two per-event
    * increments (ln(p₁/p₀), ln((1−p₁)/(1−p₀))) and the two Wald
    * boundaries (ln((1−β)/α), ln(β/(1−α))) are HARDCODED ppm constants,
    * identical literals in both engines, so there is no transcendental
    * anywhere in the run. Each bucket reports the first boundary
    * crossing (decision + sample size at decision) or 'undecided' with
    * its final LLR — the early-stopping experiment monitor that replaces
    * a fixed-horizon test at stream scale. */
  val qSprt = GraftQuery(
    "q_sprt",
    (s, dir) => {
      import s.implicits._
      val bucket = (((lit(48271L) * ((lit(48271L) * (($"user_id" % P) + 1L)) % P)) % P) % 8).as("bucket")
      val ev = Tables.events(s, dir)
        .select(bucket, $"ts", $"event_id",
          when($"event_type" === "purchase", 1L).otherwise(0L).as("x"))
      val w = Window.partitionBy($"bucket").orderBy($"ts", $"event_id")
      val walked = ev
        .withColumn("n", row_number().over(w).cast(LongType))
        .withColumn("np", sum($"x").over(w))
        .withColumn("llr_ppm", $"np" * 200671L + ($"n" - $"np") * -50010L)
        .withColumn("crossed", $"llr_ppm" >= 2890372L || $"llr_ppm" <= -2251292L)
      val firstStop = walked.groupBy($"bucket").agg(
        count(lit(1)).as("n_total"),
        min(when($"crossed", $"n")).as("n_first"))
      firstStop
        .withColumn("n_decision", coalesce($"n_first", $"n_total"))
        .join(walked.select($"bucket", $"n", $"llr_ppm"),
          Seq("bucket"), "inner")
        .filter($"n" === $"n_decision")
        .select($"bucket", $"n_total", $"n_decision",
          when($"n_first".isNull, lit("undecided"))
            .when($"llr_ppm" >= 2890372L, lit("accept_h1"))
            .otherwise(lit("accept_h0")).as("decision"),
          $"llr_ppm".as("llr_ppm_at_stop"))
        .orderBy($"bucket")
    },
    Some("""WITH ev AS (SELECT
        ((48271 * ((48271 * ((user_id % 1000000007) + 1)) % 1000000007)) % 1000000007) % 8 AS bucket,
        ts, event_id, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
      FROM events),
      walked AS (SELECT bucket,
        CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ts, event_id) AS BIGINT) AS n,
        SUM(x) OVER (PARTITION BY bucket ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS np
      FROM ev),
      llr AS (SELECT bucket, n, np * 200671 + (n - np) * -50010 AS llr_ppm FROM walked),
      st AS (SELECT bucket, COUNT(*) AS n_total,
        MIN(CASE WHEN llr_ppm >= 2890372 OR llr_ppm <= -2251292 THEN n END) AS n_first
      FROM llr GROUP BY 1)
      SELECT st.bucket, st.n_total,
        COALESCE(st.n_first, st.n_total) AS n_decision,
        CASE WHEN st.n_first IS NULL THEN 'undecided'
             WHEN l.llr_ppm >= 2890372 THEN 'accept_h1'
             ELSE 'accept_h0' END AS decision,
        CAST(l.llr_ppm AS BIGINT) AS llr_ppm_at_stop
      FROM st JOIN llr l ON l.bucket = st.bucket
        AND l.n = COALESCE(st.n_first, st.n_total)
      ORDER BY st.bucket""")
  )

  // -------------------------------------------------------------------
  // Isotonic regression (PAVA) calibration curve

  /** Isotonic calibration of purchase rate against the event-value
    * ventile — monotone regression via the CLOSED FORM of the pool-
    * adjacent-violators solution: fitted(k) = max_{i≤k} min_{j≥k}
    * mean(y, buckets i..j). PAVA itself is a sequential merge loop; the
    * minimax identity turns it into pure relational algebra over the
    * 20-bucket prefix sums (210 interval means, ~1.5k (k,i,j) triples),
    * which is both embarrassingly parallel and exactly replayable.
    * Interval means are rationals of exact integer prefix sums; the only
    * doubles are IEEE-exact single divisions, compared with (value,
    * index) tie-breaks so the argmin/argmax picks are deterministic.
    * Scale shape: the fact table collapses to the DISTINCT-VALUE
    * relation (bounded by value precision — 17.8k rows here at every
    * SF) in one map-side-combined rollup carrying the outcome sums; the
    * ventile boundary is an integer prefix-count formula over that
    * bounded relation (value ties stay together), so NOTHING ever sorts
    * or re-shuffles the fact table — the measured sf0.1→sf1 slope of
    * the first global-ntile draft was 50×, this shape is ~1×. */
  val qIsotonic = GraftQuery(
    "q_isotonic",
    (s, dir) => {
      import s.implicits._
      val dv = Tables.events(s, dir)
        .select($"value",
          when($"event_type" === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy($"value").agg(count(lit(1)).as("c"), sum($"y").as("sy"))
      val tot = dv.agg(sum($"c").as("n"))
      val agg = dv
        .withColumn("cum", sum($"c").over(Window.orderBy($"value")))
        .crossJoin(broadcast(tot))
        .withColumn("bk", expr("((cum - c) * 20) DIV n") + 1L)
        .groupBy($"bk")
        .agg(sum($"c").as("c"), sum($"sy").as("sy"))
      val pref = agg
        .withColumn("cs", sum($"sy").over(Window.orderBy($"bk")))
        .withColumn("cc", sum($"c").over(Window.orderBy($"bk")))
      val zero = s.range(1).select(lit(0L).as("bk"), lit(0L).as("cs"), lit(0L).as("cc"))
      val prefAll = pref.select($"bk", $"cs", $"cc").union(zero)
      val pairs = prefAll.as("a").join(prefAll.as("b"), col("b.bk") > col("a.bk"))
        .select((col("a.bk") + 1L).as("i"), col("b.bk").as("j"),
          (col("b.cs") - col("a.cs")).as("num"), (col("b.cc") - col("a.cc")).as("den"))
      val cand = agg.select($"bk".as("k"), $"c", $"sy")
        .join(pairs, $"i" <= $"k" && $"k" <= $"j")
        .withColumn("v", $"num".cast(DoubleType) / $"den".cast(DoubleType))
      val innerMin = cand
        .withColumn("rn", row_number().over(
          Window.partitionBy($"k", $"i").orderBy($"v", $"j")))
        .filter($"rn" === 1)
      val outerMax = innerMin
        .withColumn("rm", row_number().over(
          Window.partitionBy($"k").orderBy($"v".desc, $"i")))
        .filter($"rm" === 1)
      outerMax.select($"k".as("ventile"), $"c".as("n"),
          round($"sy".cast(DoubleType) / $"c".cast(DoubleType), 6).as("raw_rate"),
          round($"v", 6).as("fitted_rate"))
        .orderBy($"ventile")
    },
    Some("""WITH dv AS (SELECT value, COUNT(*) AS c,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS sy
      FROM events GROUP BY 1),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM dv),
      bkt AS (SELECT CAST(((cum - c) * 20) // n AS BIGINT) + 1 AS bk, c, sy FROM
        (SELECT value, c, sy, SUM(c) OVER (ORDER BY value) AS cum FROM dv), tot),
      agg AS (SELECT bk, CAST(SUM(c) AS BIGINT) AS c, CAST(SUM(sy) AS BIGINT) AS sy
        FROM bkt GROUP BY 1),
      pref AS (SELECT bk, SUM(sy) OVER (ORDER BY bk) AS cs, SUM(c) OVER (ORDER BY bk) AS cc
        FROM agg),
      prefall AS (SELECT bk, cs, cc FROM pref UNION ALL SELECT 0, 0, 0),
      pairs AS (SELECT a.bk + 1 AS i, b.bk AS j,
          CAST(b.cs - a.cs AS BIGINT) AS num, CAST(b.cc - a.cc AS BIGINT) AS den
        FROM prefall a JOIN prefall b ON b.bk > a.bk),
      cand AS (SELECT g.bk AS k, g.c, g.sy, p.i, p.j,
          CAST(p.num AS DOUBLE) / CAST(p.den AS DOUBLE) AS v
        FROM agg g JOIN pairs p ON p.i <= g.bk AND g.bk <= p.j),
      imin AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k, i
          ORDER BY v, j) AS rn FROM cand) WHERE rn = 1),
      omax AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k
          ORDER BY v DESC, i) AS rm FROM imin) WHERE rm = 1)
      SELECT k AS ventile, c AS n,
        ROUND(CAST(sy AS DOUBLE) / CAST(c AS DOUBLE), 6) AS raw_rate,
        ROUND(v, 6) AS fitted_rate
      FROM omax ORDER BY ventile""")
  )

  // -------------------------------------------------------------------
  // Brier score with Murphy decomposition

  /** Brier score of an hour-of-day purchase-probability predictor with
    * the Murphy reliability/resolution/uncertainty decomposition — the
    * proper-scoring-rule evaluation a calibrated classifier ships with
    * (and the quantitative counterpart of q_isotonic's calibration
    * curve). Predictor: train-split purchase rate per hour-of-day (24
    * buckets, keyed-PRF even/odd split); evaluation on the held-out
    * split. Every rate is a rational of integer counts; each bucket's
    * score term is quantized to ppm independently and the totals are
    * integer sums — so REL − RES + UNC reproduces the Brier score up to
    * quantization, and the oracle replays every term bit-for-bit. Scale
    * shape: two 24-row rollups; no per-event state. */
  val qBrierDecomp = GraftQuery(
    "q_brier_decomp",
    (s, dir) => {
      import s.implicits._
      val u = (lit(48271L) * ((lit(48271L) * (($"event_id" % P) + 1L)) % P)) % P
      val ev = Tables.events(s, dir).select(
        hour($"ts").cast(LongType).as("hb"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("y"),
        (u % 2).as("split"))
      val train = ev.filter($"split" === 0L).groupBy($"hb")
        .agg(count(lit(1)).as("nt"), sum($"y").as("yt"))
      val test = ev.filter($"split" === 1L).groupBy($"hb")
        .agg(count(lit(1)).as("nb"), sum($"y").as("yb"))
      val g = test.agg(sum($"nb").as("n"), sum($"yb").as("ypos"))
      val terms = test.join(train, "hb").crossJoin(broadcast(g))
        .withColumn("p", $"yt".cast(DoubleType) / $"nt".cast(DoubleType))
        .withColumn("o", $"yb".cast(DoubleType) / $"nb".cast(DoubleType))
        .withColumn("gy", $"ypos".cast(DoubleType) / $"n".cast(DoubleType))
        .select($"n", $"ypos",
          floor($"nb" * (($"p" - $"o") * ($"p" - $"o")) * 1e6 / $"n" + 0.5)
            .cast(LongType).as("rel_t"),
          floor($"nb" * (($"o" - $"gy") * ($"o" - $"gy")) * 1e6 / $"n" + 0.5)
            .cast(LongType).as("res_t"),
          floor($"nb" * (($"p" - $"o") * ($"p" - $"o") + $"o" * (lit(1.0) - $"o"))
            * 1e6 / $"n" + 0.5).cast(LongType).as("bri_t"))
      terms.groupBy($"n", $"ypos")
        .agg(sum($"rel_t").as("rel_ppm"), sum($"res_t").as("res_ppm"),
          sum($"bri_t").as("brier_ppm"))
        .select($"n".as("n_test"),
          round($"brier_ppm".cast(DoubleType) / 1e6, 6).as("brier"),
          round($"rel_ppm".cast(DoubleType) / 1e6, 6).as("reliability"),
          round($"res_ppm".cast(DoubleType) / 1e6, 6).as("resolution"),
          round(($"ypos".cast(DoubleType) / $"n".cast(DoubleType)) *
            (lit(1.0) - $"ypos".cast(DoubleType) / $"n".cast(DoubleType)), 6)
            .as("uncertainty"))
    },
    Some("""WITH ev AS (SELECT
        CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hb,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
        ((48271 * ((48271 * ((event_id % 1000000007) + 1)) % 1000000007)) % 1000000007) % 2
          AS split
      FROM events),
      train AS (SELECT hb, COUNT(*) AS nt, CAST(SUM(y) AS BIGINT) AS yt
        FROM ev WHERE split = 0 GROUP BY 1),
      test AS (SELECT hb, COUNT(*) AS nb, CAST(SUM(y) AS BIGINT) AS yb
        FROM ev WHERE split = 1 GROUP BY 1),
      g AS (SELECT CAST(SUM(nb) AS BIGINT) AS n, CAST(SUM(yb) AS BIGINT) AS ypos
        FROM test),
      terms AS (SELECT g.n, g.ypos,
          CAST(FLOOR(nb * ((CAST(yt AS DOUBLE) / nt - CAST(yb AS DOUBLE) / nb) *
            (CAST(yt AS DOUBLE) / nt - CAST(yb AS DOUBLE) / nb)) * 1e6 / g.n + 0.5)
            AS BIGINT) AS rel_t,
          CAST(FLOOR(nb * ((CAST(yb AS DOUBLE) / nb - CAST(ypos AS DOUBLE) / g.n) *
            (CAST(yb AS DOUBLE) / nb - CAST(ypos AS DOUBLE) / g.n)) * 1e6 / g.n + 0.5)
            AS BIGINT) AS res_t,
          CAST(FLOOR(nb * ((CAST(yt AS DOUBLE) / nt - CAST(yb AS DOUBLE) / nb) *
            (CAST(yt AS DOUBLE) / nt - CAST(yb AS DOUBLE) / nb) +
            (CAST(yb AS DOUBLE) / nb) * (1.0 - CAST(yb AS DOUBLE) / nb))
            * 1e6 / g.n + 0.5) AS BIGINT) AS bri_t
        FROM test JOIN train USING (hb) CROSS JOIN g)
      SELECT n AS n_test,
        ROUND(CAST(SUM(bri_t) AS DOUBLE) / 1e6, 6) AS brier,
        ROUND(CAST(SUM(rel_t) AS DOUBLE) / 1e6, 6) AS reliability,
        ROUND(CAST(SUM(res_t) AS DOUBLE) / 1e6, 6) AS resolution,
        ROUND((CAST(ypos AS DOUBLE) / n) * (1.0 - CAST(ypos AS DOUBLE) / n), 6)
          AS uncertainty
      FROM terms GROUP BY n, ypos""")
  )

  def all: Seq[GraftQuery] =
    Seq(qBhFdr, qConformal, qSprt, qIsotonic, qBrierDecomp)
}
