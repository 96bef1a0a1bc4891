package graft.analytics

import graft.{GraftQuery, Tables}
import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Rank-based statistics and privacy-aware release queries — the
  * nonparametric evaluation layer of the curation pipeline (reference
  * scope: the EDA correlation/AB-test surface of `analysis.py` extended
  * to the rank statistics a data-quality team actually ships on skewed,
  * outlier-heavy corpus metrics, where Pearson/t-tests mislead).
  *
  * Every query here is built on one shared kernel: the DOUBLED average
  * rank (`2·avgRank = 2·cntLess + cntEq + 1`, always an integer), which
  * keeps the whole rank algebra in exact integer/decimal arithmetic
  * until a single final double expression — the property that lets
  * Spearman, Mann-Whitney and AUC carry bit-exact DuckDB oracles.
  *
  * Scale shape: ranks are computed on the DISTINCT-VALUE relation
  * (groupBy value → prefix sum → join back), never by sorting the fact
  * table. The prefix-sum window runs over |distinct values| pre-
  * aggregated rows; at 100 TB you'd swap that single window for a
  * two-pass range-partitioned prefix sum — the join-back and all the
  * moment algebra are unchanged. The moment aggregates are plain
  * map-side-combined sums.
  */
object RankStatQueries {

  private val P = 1000000007L // TextHashKernels.PortableMod

  /** Join back per-row doubled average ranks of numeric column `v`.
    * rank2 = 2·cntLess + cntEq + 1 (an integer), from the distinct-value
    * relation: one shuffle to group, a prefix sum over the (already
    * aggregated) distinct values, one equi-join back on the value. */
  private def withRank2(df: DataFrame, v: String, out: String): DataFrame = {
    val ranks = df.groupBy(col(v)).agg(count(lit(1)).as("_cnt"))
      .withColumn("_cum", sum(col("_cnt")).over(Window.orderBy(col(v))))
      .select(col(v),
        (lit(2L) * (col("_cum") - col("_cnt")) + col("_cnt") + lit(1L)).as(out))
    df.join(ranks, v)
  }

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  // -------------------------------------------------------------------
  // Spearman rank correlation

  /** Spearman's rho between quantity and price: Pearson on average ranks,
    * with ALL moments (Σr, Σr², Σrxry on doubled ranks) summed exactly in
    * DECIMAL(38,0) and the numerator/denominators formed as exact integer
    * differences — only the final divide/sqrt is floating point. The
    * doubling factors cancel in the correlation, so rho on rank2 equals
    * rho on avg ranks. Oracle runs the identical algebra in HUGEINT. */
  val qSpearman = GraftQuery(
    "q_spearman",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir).select($"l_quantity", $"l_extendedprice")
      val ranked = withRank2(withRank2(li, "l_quantity", "rx"),
        "l_extendedprice", "ry")
      ranked.agg(
          count(lit(1)).as("n"),
          dec38(sum(dec38($"rx"))).as("sx"),
          dec38(sum(dec38($"ry"))).as("sy"),
          dec38(sum(dec38($"rx" * $"rx"))).as("sxx"),
          dec38(sum(dec38($"ry" * $"ry"))).as("syy"),
          dec38(sum(dec38($"rx" * $"ry"))).as("sxy"))
        .select($"n",
          round((dec38($"n") * $"sxy" - $"sx" * $"sy").cast(DoubleType) /
            sqrt((dec38($"n") * $"sxx" - $"sx" * $"sx").cast(DoubleType) *
                 (dec38($"n") * $"syy" - $"sy" * $"sy").cast(DoubleType)), 6)
            .as("spearman_qty_price"))
    },
    Some("""WITH dx AS (SELECT l_quantity AS v, COUNT(*) AS c FROM lineitem GROUP BY 1),
      rx AS (SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS r2 FROM dx),
      dy AS (SELECT l_extendedprice AS v, COUNT(*) AS c FROM lineitem GROUP BY 1),
      ry AS (SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS r2 FROM dy),
      j AS (SELECT CAST(rx.r2 AS HUGEINT) AS rx, CAST(ry.r2 AS HUGEINT) AS ry
            FROM lineitem l
            JOIN rx ON l.l_quantity = rx.v
            JOIN ry ON l.l_extendedprice = ry.v),
      m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nd, COUNT(*) AS n,
              CAST(SUM(rx) AS HUGEINT) AS sx, CAST(SUM(ry) AS HUGEINT) AS sy,
              CAST(SUM(rx * rx) AS HUGEINT) AS sxx,
              CAST(SUM(ry * ry) AS HUGEINT) AS syy,
              CAST(SUM(rx * ry) AS HUGEINT) AS sxy
            FROM j)
      SELECT n,
        ROUND(CAST(nd * sxy - sx * sy AS DOUBLE) /
          SQRT(CAST(nd * sxx - sx * sx AS DOUBLE) *
               CAST(nd * syy - sy * sy AS DOUBLE)), 6) AS spearman_qty_price
      FROM m""")
  )

  // -------------------------------------------------------------------
  // Mann-Whitney U

  /** Mann-Whitney U (Wilcoxon rank-sum) comparing `value` between the
    * purchase and click event populations — the nonparametric companion
    * to q_ab_test for heavy-tailed spend metrics. Doubled-rank identity:
    * 2·(U1−μ) = Σ2R₁ − n1(n1+1) − n1·n2, exact in decimal; the z-score
    * uses the tie-corrected variance with Σ(t³−t) summed exactly. */
  val qMannWhitney = GraftQuery(
    "q_mannwhitney",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .filter($"event_type".isin("purchase", "click"))
        .select($"event_type", $"value")
      val ranked = withRank2(ev, "value", "r2")
      val ties = ev.groupBy($"value").agg(count(lit(1)).as("c"))
        .agg(dec38(sum(dec38($"c" * $"c" * $"c" - $"c"))).as("t"))
      val m = ranked.agg(
          dec38(sum(when($"event_type" === "purchase", 1L).otherwise(0L))).as("n1"),
          dec38(sum(when($"event_type" === "click", 1L).otherwise(0L))).as("n2"),
          dec38(sum(when($"event_type" === "purchase", dec38($"r2"))
            .otherwise(dec38(lit(0L))))).as("r2sum1"))
        .crossJoin(ties)
        .withColumn("a2", $"r2sum1" - $"n1" * ($"n1" + lit(1L)) - $"n1" * $"n2")
      m.select(
        $"n1".cast(LongType).as("n1"),
        $"n2".cast(LongType).as("n2"),
        (($"r2sum1" - $"n1" * ($"n1" + lit(1L))).cast(DoubleType) / lit(2.0)).as("u1"),
        round($"a2".cast(DoubleType) /
          (lit(2.0) * sqrt(
            $"n1".cast(DoubleType) * $"n2".cast(DoubleType) / lit(12.0) *
              (($"n1" + $"n2" + lit(1L)).cast(DoubleType) -
                $"t".cast(DoubleType) /
                  (($"n1" + $"n2").cast(DoubleType) *
                   ($"n1" + $"n2" - lit(1L)).cast(DoubleType))))), 6).as("z"))
    },
    Some("""WITH ev AS (SELECT event_type, value FROM events
              WHERE event_type IN ('purchase', 'click')),
      dv AS (SELECT value AS v, COUNT(*) AS c FROM ev GROUP BY 1),
      rv AS (SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS r2 FROM dv),
      t AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS t FROM dv),
      j AS (SELECT ev.event_type, CAST(rv.r2 AS HUGEINT) AS r2
            FROM ev JOIN rv ON ev.value = rv.v),
      m AS (SELECT
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN r2 ELSE 0 END) AS HUGEINT) AS r2sum1
            FROM j)
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        CAST(r2sum1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
        ROUND(CAST(r2sum1 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE) /
          (2.0 * SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
            (CAST(n1 + n2 + 1 AS DOUBLE) -
             CAST(t AS DOUBLE) /
               (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))))), 6) AS z
      FROM m, t""")
  )

  // -------------------------------------------------------------------
  // ROC AUC of the quality score

  /** ROC AUC of the composite quality score as a predictor of the
    * declared-English label — the standard acceptance gate for a learned
    * or heuristic quality filter before it's allowed to drop corpus
    * mass. AUC ≡ Mann-Whitney: (ΣR⁺ − n⁺(n⁺+1)/2)/(n⁺n⁻); with doubled
    * ranks the numerator Σ2R⁺ − n⁺(n⁺+1) is an exact integer. Ties in
    * the (6-decimal-rounded) score get average-rank treatment — the
    * trapezoidal convention. The score formula is the one already
    * hash-certified by q_quality_score. */
  val qAuc = GraftQuery(
    "q_auc",
    (s, dir) => {
      import s.implicits._
      val scored = Tables.documents(s, dir)
        .select(($"lang" === "en").cast("int").as("pos"),
          TextAnalysis.qualityScore($"text").as("q"))
      val ranked = withRank2(scored, "q", "r2")
      ranked.agg(
          dec38(sum($"pos".cast(LongType))).as("npos"),
          dec38(sum(lit(1L) - $"pos".cast(LongType))).as("nneg"),
          dec38(sum(when($"pos" === 1, dec38($"r2")).otherwise(dec38(lit(0L)))))
            .as("r2pos"))
        .select(
          $"npos".cast(LongType).as("n_pos"),
          $"nneg".cast(LongType).as("n_neg"),
          round(($"r2pos" - $"npos" * ($"npos" + lit(1L))).cast(DoubleType) /
            (lit(2.0) * $"npos".cast(DoubleType) * $"nneg".cast(DoubleType)), 6)
            .as("auc"))
    },
    Some("""WITH t AS (SELECT lang, text,
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents),
      m AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        CAST(LENGTH(text) AS DOUBLE) AS len,
        CAST(LEN(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for','on','with','as','was','at'))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS stop_ratio,
        CAST(LEN(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) / GREATEST(LENGTH(text), 1) AS punct_ratio
      FROM t),
      sc AS (SELECT pos,
        ROUND(LEAST(len / 50.0, 1.0) * (CASE WHEN len > 10000 THEN 0.5 ELSE 1.0 END) * 0.4
              + LEAST(stop_ratio * 4.0, 1.0) * 0.3
              + GREATEST(0.0, 1.0 - punct_ratio * 4.0) * 0.3, 6) AS q
      FROM m),
      dv AS (SELECT q AS v, COUNT(*) AS c FROM sc GROUP BY 1),
      rv AS (SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS r2 FROM dv),
      j AS (SELECT sc.pos, CAST(rv.r2 AS HUGEINT) AS r2 FROM sc JOIN rv ON sc.q = rv.v),
      a AS (SELECT CAST(SUM(pos) AS HUGEINT) AS npos,
              CAST(SUM(1 - pos) AS HUGEINT) AS nneg,
              CAST(SUM(CASE WHEN pos = 1 THEN r2 ELSE 0 END) AS HUGEINT) AS r2pos
            FROM j)
      SELECT CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
        ROUND(CAST(r2pos - npos * (npos + 1) AS DOUBLE) /
          (2.0 * CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)), 6) AS auc
      FROM a""")
  )

  // -------------------------------------------------------------------
  // Differentially-private release

  /** ε-DP noisy histogram of event counts (Laplace mechanism, ε = 1,
    * sensitivity 1): the shape every external data release goes through.
    * The Laplace draw is the inverse-CDF of a DETERMINISTIC uniform from
    * the portable hash of the group key — a keyed-PRF noise source, which
    * is exactly how production DP systems derandomize for replayability
    * (and what makes the mechanism certifiable here: the oracle replays
    * hash → uniform → inverse CDF bit-for-bit). `n_true` is emitted for
    * the correctness gate only — a production release ships the noisy
    * column alone. Map-side combine to |event types| rows, then pure
    * per-row scalar math. */
  val qDpCounts = GraftQuery(
    "q_dp_counts",
    (s, dir) => {
      import s.implicits._
      val fold = (acc: Column, v: Column) => (acc * lit(31L) + v) % lit(P)
      val poly = aggregate(
        transform(filter(split($"event_type", ""), c => length(c) > 0),
          c => ascii(c).cast(LongType)),
        lit(0L), fold)
      val hv = (lit(48271L) * ((lit(48271L) * ((poly + 1L) % P)) % P)) % P
      Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_true"))
        .withColumn("u", hv.cast(DoubleType) / lit(P.toDouble))
        .select($"event_type", $"n_true", lit(1.0).as("epsilon"),
          round(greatest(lit(0.0),
            $"n_true".cast(DoubleType) +
              lit(-1.0) * signum($"u" - 0.5) *
                log(lit(1.0) - lit(2.0) * abs($"u" - 0.5))), 6).as("n_noisy"))
        .orderBy($"event_type")
    },
    Some("""WITH g AS (SELECT event_type, COUNT(*) AS n_true FROM events GROUP BY 1),
      h AS (SELECT event_type, n_true,
        CAST((48271 * ((48271 * ((list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(regexp_extract_all(event_type, '.'), c -> CAST(ord(c) AS BIGINT))),
          (acc, x) -> (acc * 31 + x) % 1000000007) + 1) % 1000000007)) % 1000000007)) % 1000000007 AS DOUBLE)
          / 1000000007.0 AS u
      FROM g)
      SELECT event_type, n_true, 1.0 AS epsilon,
        ROUND(GREATEST(0.0, CAST(n_true AS DOUBLE) +
          -1.0 * SIGN(u - 0.5) * LN(1.0 - 2.0 * ABS(u - 0.5))), 6) AS n_noisy
      FROM h ORDER BY event_type""")
  )

  /** Poisson(1) CDF boundaries for the deterministic bootstrap weights:
    * P(X<=k) = e^{-1}·Σ 1/i!. Shared literal-for-literal with the oracle
    * SQL — the CASE ladder must be the same bit pattern in both engines. */
  private val PoissonCdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119)

  /** Bootstrap 95% CI for mean(l_extendedprice) via the POISSON
    * bootstrap — the resampling scheme that actually works at 100 TB:
    * instead of drawing n rows with replacement (a global shuffle per
    * replicate), every row independently receives a Poisson(1) weight
    * per replicate, so all B replicates stream in ONE pass with map-side
    * partial aggregation to B rows. Weights come from the inverse CDF of
    * a keyed-PRF uniform (portable hash of row key × replicate), making
    * the whole procedure deterministic and DuckDB-replayable. The CI is
    * explicit order statistics of the B=64 replicate means (2nd / 63rd)
    * — no quantile interpolation to diverge across engines. */
  val qBootstrapCi = GraftQuery(
    "q_bootstrap_ci",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      val b = 64
      val base = ((($"l_orderkey" % P) * 1000003L + $"l_linenumber" * 131L + $"b") % P + 1L) % P
      val hv = (lit(48271L) * ((lit(48271L) * base) % P)) % P
      val u = hv.cast(DoubleType) / lit(P.toDouble)
      // ascending CASE ladder: first threshold that exceeds u wins
      val w = PoissonCdf.zipWithIndex.foldRight(lit(7L)) { case ((t, k), acc) =>
        when(u < t, lit(k.toLong)).otherwise(acc)
      }
      // one pass: the 64 replicate ids ride as a CONSTANT array literal
      // exploded in the same codegen stage (a broadcast join would drop
      // to BroadcastNestedLoopJoin's row-at-a-time copies; a
      // sequence() call would build the array per row). Prices convert
      // to exact integer CENTS once per INPUT row (before the 64x
      // fan-out), so the hot replicate loop is pure long arithmetic in
      // whole-stage codegen — no per-row decimal boxing. Long-sum
      // headroom: w<=7, cents<~1e7 -> overflow needs >1e11 rows; past
      // that, salt the rollup (b, hash%k) and decimal-merge the k
      // partials.
      val cents = li.withColumn("cents",
        ($"l_extendedprice".cast(DecimalType(18, 2)) * 100).cast(LongType))
      val reps = cents
        .withColumn("b", explode(typedLit((0 until b).toArray)))
        .withColumn("w", w)
        .groupBy($"b")
        .agg(sum($"w").as("nw"), sum($"w" * $"cents").as("sw"))
        .select($"b",
          ($"sw".cast(DoubleType) / $"nw".cast(DoubleType) / lit(100.0)).as("m"))
      val ordered = reps.withColumn("rn",
        row_number().over(Window.orderBy($"m", $"b")))
      val ci = ordered.agg(
        round(min(when($"rn" === 2, $"m")), 6).as("ci_lo"),
        round(min(when($"rn" === b - 1, $"m")), 6).as("ci_hi"))
      val point = li.agg(
        round(sum($"l_extendedprice".cast(DecimalType(18, 2))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("mean_price"),
        count(lit(1)).as("n"))
      point.crossJoin(ci).select($"n", $"mean_price", $"ci_lo", $"ci_hi",
        lit(b).cast(LongType).as("n_replicates"))
    },
    Some(s"""WITH reps AS (
        SELECT t.b,
          CAST(SUM(w) AS BIGINT) AS nw,
          CAST(SUM(w * cents) AS BIGINT) AS sw
        FROM (
          SELECT b, cents,
            CASE
              WHEN u < 0.36787944117144233 THEN 0
              WHEN u < 0.7357588823428847 THEN 1
              WHEN u < 0.9196986029286058 THEN 2
              WHEN u < 0.9810118431238462 THEN 3
              WHEN u < 0.9963401531726563 THEN 4
              WHEN u < 0.9994058151824183 THEN 5
              WHEN u < 0.9999167588507119 THEN 6
              ELSE 7 END AS w
          FROM (
            SELECT b,
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
              CAST((48271 * ((48271 * (((l_orderkey % 1000000007) * 1000003
                + l_linenumber * 131 + b) % 1000000007 + 1) % 1000000007)) % 1000000007)
                % 1000000007 AS DOUBLE) / 1000000007.0 AS u
            FROM lineitem CROSS JOIN (SELECT unnest(range(64)) AS b) bb) h) t
        GROUP BY t.b),
      m AS (SELECT b, CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE) / 100.0 AS m FROM reps),
      o AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM m),
      ci AS (SELECT ROUND(MIN(CASE WHEN rn = 2 THEN m END), 6) AS ci_lo,
                    ROUND(MIN(CASE WHEN rn = 63 THEN m END), 6) AS ci_hi FROM o),
      pt AS (SELECT COUNT(*) AS n,
          ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 6) AS mean_price
        FROM lineitem)
      SELECT n, mean_price, ci_lo, ci_hi, CAST(64 AS BIGINT) AS n_replicates
      FROM pt, ci""")
  )

  /** One-way ANOVA F-test of `value` across the five event types — does
    * the spend metric differ by event type at all (the k-group
    * generalization the pairwise q_ab_test / q_mannwhitney can't give).
    * Determinism: the five groups are KNOWN literals, so every group
    * moment (n, Σcents, Σcents²) is its own conditional-sum column over
    * exact integer cents — one map-side-combined pass, no unordered
    * float accumulation — and the F/η² expression combines the 15 exact
    * integers in one fixed left-associative IEEE tree. Long-sum
    * headroom: cents² < 2.5e9 → overflow needs >3.7e9 rows per type;
    * past that widen the three sums to DECIMAL(38,0). */
  val qAnova = GraftQuery(
    "q_anova",
    (s, dir) => {
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cents = ($"value".cast(DecimalType(18, 2)) * 100).cast(LongType)
      val aggs = types.flatMap { t =>
        Seq(
          sum(when($"event_type" === t, 1L).otherwise(0L)).as(s"n_$t"),
          sum(when($"event_type" === t, cents).otherwise(0L)).as(s"s_$t"),
          sum(when($"event_type" === t, cents * cents).otherwise(0L)).as(s"ss_$t"))
      }
      val m = Tables.events(s, dir).agg(aggs.head, aggs.tail: _*)
      val n = types.map(t => col(s"n_$t")).reduceLeft(_ + _)
      val sTot = types.map(t => col(s"s_$t")).reduceLeft(_ + _)
      val ssTot = types.map(t => col(s"ss_$t")).reduceLeft(_ + _)
      val grand = sTot.cast(DoubleType) * sTot.cast(DoubleType) / n.cast(DoubleType)
      val ssb = types.map(t =>
          col(s"s_$t").cast(DoubleType) * col(s"s_$t").cast(DoubleType) /
            col(s"n_$t").cast(DoubleType))
        .reduceLeft(_ + _) - grand
      val sst = ssTot.cast(DoubleType) - grand
      m.select(
        n.as("n"),
        round((ssb / lit(4.0)) / ((sst - ssb) / (n - lit(5L)).cast(DoubleType)), 6)
          .as("f_stat"),
        round(ssb / sst, 6).as("eta_sq"))
    },
    Some {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cents = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
      val aggs = types.map { t =>
        s"""CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t,
          CAST(SUM(CASE WHEN event_type = '$t' THEN $cents ELSE 0 END) AS BIGINT) AS s_$t,
          CAST(SUM(CASE WHEN event_type = '$t' THEN $cents * $cents ELSE 0 END) AS BIGINT) AS ss_$t"""
      }.mkString(",\n          ")
      val n = types.map(t => s"n_$t").mkString(" + ")
      val sTot = types.map(t => s"s_$t").mkString(" + ")
      val ssTot = types.map(t => s"ss_$t").mkString(" + ")
      val grand = s"CAST($sTot AS DOUBLE) * CAST($sTot AS DOUBLE) / CAST($n AS DOUBLE)"
      val ssb = types.map(t =>
          s"CAST(s_$t AS DOUBLE) * CAST(s_$t AS DOUBLE) / CAST(n_$t AS DOUBLE)")
        .mkString(" + ") + s" - ($grand)"
      val sst = s"CAST($ssTot AS DOUBLE) - ($grand)"
      s"""WITH m AS (SELECT $aggs FROM events)
      SELECT $n AS n,
        ROUND((($ssb) / 4.0) / ((($sst) - ($ssb)) / CAST($n - 5 AS DOUBLE)), 6) AS f_stat,
        ROUND(($ssb) / ($sst), 6) AS eta_sq
      FROM m"""
    }
  )

  /** HUBER robust mean of purchase spend — the M-estimator between the
    * outlier-fragile mean and the inefficiency of the median, via 3
    * fixed IRLS rounds (clip at μ±c, re-average). Engine-exactness
    * comes from INTEGER STATE: observations live in exact micro-dollar
    * longs, the clip width c (1.345·1.4826·MAD, the textbook 95%-
    * efficiency constant) quantizes once to micro-dollars, and each
    * round's new μ is floor(mean-of-clipped + 0.5) back to integer
    * micro-dollars — so every round's sum is an exact integer sum and
    * the whole fixed point unrolls into three oracle CTEs. Start point
    * is the exact median (ExactQuantiles ↔ QUANTILE_CONT parity,
    * established by the quantile family). */
  val qHuberMean = GraftQuery(
    "q_huber_mean",
    (s, dir) => {
      import s.implicits._
      import graft.expressions.ExactQuantiles
      val ev = graft.operators.Caches.register(
        Tables.events(s, dir).filter($"event_type" === "purchase")
          .select((($"value".cast(DecimalType(18, 2)) * 100).cast(LongType) *
            lit(10000L)).as("xm"), $"value"))
      val med = ev.agg(element_at(
        ExactQuantiles.quantiles($"value", Seq(0.5)), 1).as("med"))
      val mad = ev.crossJoin(broadcast(med))
        .agg(element_at(
          ExactQuantiles.quantiles(abs($"value" - $"med"), Seq(0.5)), 1).as("mad"))
      val params = med.crossJoin(mad)
        .select($"med",
          floor($"med" * lit(1000000.0) + lit(0.5)).cast(LongType).as("mu"),
          floor(lit(1.345) * lit(1.4826) * $"mad" * lit(1000000.0) + lit(0.5))
            .cast(LongType).as("c"))
      var state = params.select($"mu", $"c")
      for (_ <- 1 to 3) {
        state = ev.crossJoin(broadcast(state))
          .agg(
            floor(sum(least(greatest($"xm", $"mu" - $"c"), $"mu" + $"c"))
              .cast(DoubleType) / count(lit(1)).cast(DoubleType) + lit(0.5))
              .cast(LongType).as("mu"),
            max($"c").as("c"))
      }
      val st = ev.agg(count(lit(1)).as("n"), sum($"xm").as("sx"))
      st.crossJoin(broadcast(params.select($"med", $"c")))
        .crossJoin(broadcast(state.select($"mu")))
        .select($"n",
          round($"med", 6).as("median"),
          round($"c".cast(DoubleType) / lit(1000000.0), 6).as("clip_width"),
          round($"mu".cast(DoubleType) / lit(1000000.0), 6).as("mu_huber"),
          round($"sx".cast(DoubleType) / $"n".cast(DoubleType) / lit(1000000.0), 6)
            .as("mean_plain"))
    },
    Some("""WITH ev AS (SELECT
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000 AS xm, value
      FROM events WHERE event_type = 'purchase'),
      med AS (SELECT QUANTILE_CONT(value, 0.5) AS med FROM ev),
      mad AS (SELECT QUANTILE_CONT(ABS(value - med), 0.5) AS mad FROM ev, med),
      par AS (SELECT med.med,
          CAST(FLOOR(med.med * 1000000.0 + 0.5) AS BIGINT) AS mu,
          CAST(FLOOR(1.345 * 1.4826 * mad.mad * 1000000.0 + 0.5) AS BIGINT) AS c
        FROM med, mad),
      r1 AS (SELECT CAST(FLOOR(CAST(SUM(LEAST(GREATEST(xm, mu - c), mu + c)) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS mu, MAX(c) AS c
        FROM ev, par),
      r2 AS (SELECT CAST(FLOOR(CAST(SUM(LEAST(GREATEST(xm, mu - c), mu + c)) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS mu, MAX(c) AS c
        FROM ev, r1),
      r3 AS (SELECT CAST(FLOOR(CAST(SUM(LEAST(GREATEST(xm, mu - c), mu + c)) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS mu, MAX(c) AS c
        FROM ev, r2),
      st AS (SELECT COUNT(*) AS n, CAST(SUM(xm) AS BIGINT) AS sx FROM ev)
      SELECT st.n, ROUND(par.med, 6) AS median,
        ROUND(CAST(par.c AS DOUBLE) / 1000000.0, 6) AS clip_width,
        ROUND(CAST(r3.mu AS DOUBLE) / 1000000.0, 6) AS mu_huber,
        ROUND(CAST(st.sx AS DOUBLE) / CAST(st.n AS DOUBLE) / 1000000.0, 6)
          AS mean_plain
      FROM st, par, r3""")
  )

  /** Kendall's τ-b between quantity and the price VENTILE, computed
    * from the 50×20 contingency grid instead of row pairs: concordant /
    * discordant counts are Σ n₁·n₂ over ordered cell pairs — a self-join
    * of the ~1000-cell grid, constant work at any corpus size — and the
    * tie corrections come from the grid marginals. Everything through
    * the doubled identity 2(C−D)/√((m₀−m₁)(m₀−m₂)) (m = doubled pair
    * counts) stays exact integer/decimal; one final sqrt+divide.
    * The τ-b companion to q_spearman: τ is the statistic of choice when
    * the data are heavily tied — which bucketing makes explicit. */
  val qKendallTau = GraftQuery(
    "q_kendall_tau",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .select($"l_quantity", $"l_extendedprice", $"l_orderkey", $"l_linenumber")
        .withColumn("yb", ntile(20).over(
          Window.orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber",
            $"l_quantity")).cast(LongType))
      val grid = li.groupBy($"l_quantity".as("x"), $"yb".as("y"))
        .agg(count(lit(1)).as("cnt"))
      val cd = grid.as("a").join(grid.as("b"), col("a.x") < col("b.x"))
        .agg(
          dec38(sum(when(col("a.y") < col("b.y"),
            dec38(col("a.cnt")) * dec38(col("b.cnt"))).otherwise(dec38(lit(0L))))).as("c"),
          dec38(sum(when(col("a.y") > col("b.y"),
            dec38(col("a.cnt")) * dec38(col("b.cnt"))).otherwise(dec38(lit(0L))))).as("d"))
      val n = grid.agg(dec38(sum($"cnt")).as("n"))
      val m1 = grid.groupBy($"x").agg(sum($"cnt").as("t"))
        .agg(dec38(sum(dec38($"t") * (dec38($"t") - 1))).as("m1"))
      val m2 = grid.groupBy($"y").agg(sum($"cnt").as("t"))
        .agg(dec38(sum(dec38($"t") * (dec38($"t") - 1))).as("m2"))
      cd.crossJoin(n).crossJoin(m1).crossJoin(m2)
        .withColumn("m0", $"n" * ($"n" - 1))
        .select($"n".cast(LongType).as("n"),
          $"c".cast(LongType).as("concordant"), $"d".cast(LongType).as("discordant"),
          round(lit(2.0) * ($"c" - $"d").cast(DoubleType) /
            sqrt(($"m0" - $"m1").cast(DoubleType) * ($"m0" - $"m2").cast(DoubleType)), 6)
            .as("tau_b"))
    },
    Some("""WITH li AS (SELECT l_quantity AS x,
        CAST(NTILE(20) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber,
          l_quantity) AS BIGINT) AS y
      FROM lineitem),
      grid AS (SELECT x, y, CAST(COUNT(*) AS HUGEINT) AS cnt FROM li GROUP BY 1, 2),
      cd AS (SELECT
          SUM(CASE WHEN a.y < b.y THEN a.cnt * b.cnt ELSE 0 END) AS c,
          SUM(CASE WHEN a.y > b.y THEN a.cnt * b.cnt ELSE 0 END) AS d
        FROM grid a JOIN grid b ON a.x < b.x),
      nn AS (SELECT SUM(cnt) AS n FROM grid),
      mm1 AS (SELECT SUM(t * (t - 1)) AS m1 FROM
        (SELECT SUM(cnt) AS t FROM grid GROUP BY x)),
      mm2 AS (SELECT SUM(t * (t - 1)) AS m2 FROM
        (SELECT SUM(cnt) AS t FROM grid GROUP BY y))
      SELECT CAST(n AS BIGINT) AS n, CAST(c AS BIGINT) AS concordant,
        CAST(d AS BIGINT) AS discordant,
        ROUND(2.0 * CAST(c - d AS DOUBLE) /
          SQRT(CAST(n * (n - 1) - m1 AS DOUBLE) * CAST(n * (n - 1) - m2 AS DOUBLE)), 6)
          AS tau_b
      FROM cd, nn, mm1, mm2""")
  )

  /** Paired sign-flip permutation test for the within-user
    * purchase-vs-click value difference — exact finite-sample inference
    * with ZERO transcendentals: per-user mean difference quantized to
    * integer deci-cents (⌊cents·10+½⌋, i.e. thousandths of a currency
    * unit), 64 deterministic sign-flip replicates from
    * the keyed-PRF parity (user × replicate, the q_bootstrap_ci
    * machinery), each replicate statistic an order-independent integer
    * sum, and p = (#{|T_b| ≥ |T₀|} + 1)/(B+1) — integer comparisons all
    * the way to the final divide. The 64 replicate ids ride the same
    * constant-array explode that made q_bootstrap_ci codegen-hot.
    * Scale shape: one user-keyed rollup, then a 64× map-side fan-out
    * into B partial-aggregated sums. */
  val qPermutationTest = GraftQuery(
    "q_permutation_test",
    (s, dir) => {
      import s.implicits._
      val vc = ($"value".cast(DecimalType(18, 2)) * 100).cast(LongType)
      val ev = Tables.events(s, dir)
        .filter($"event_type".isin("purchase", "click"))
        .select($"user_id", $"event_type", vc.as("vc"))
        .groupBy($"user_id").agg(
          sum(when($"event_type" === "purchase", $"vc")).as("sp"),
          count(when($"event_type" === "purchase", lit(1))).as("np"),
          sum(when($"event_type" === "click", $"vc")).as("sc"),
          count(when($"event_type" === "click", lit(1))).as("nc"))
        .filter($"np" > 0 && $"nc" > 0)
        .select($"user_id",
          floor(($"sp".cast(DoubleType) / $"np" - $"sc".cast(DoubleType) / $"nc") * 10 + 0.5)
            .cast(LongType).as("d"))
      val base = ev.crossJoin(
        s.range(1).select(explode(typedLit((0 until 64).map(_.toLong))).as("b")))
      val h = (lit(48271L) * ((lit(48271L) *
        ((($"user_id" % P) * 1000003L + $"b" * 131L) % P + 1L)) % P)) % P
      val reps = base
        .withColumn("sgn", when(h % 2 === 0L, lit(1L)).otherwise(lit(-1L)))
        .groupBy($"b").agg(sum($"sgn" * $"d").as("t"))
      val t0 = ev.agg(sum($"d").as("t0"), count(lit(1)).as("n_users"))
      reps.crossJoin(broadcast(t0))
        .agg(max($"n_users").as("n_users"), max($"t0").as("t0_decicents"),
          sum(when(abs($"t") >= abs($"t0"), 1L).otherwise(0L)).as("n_extreme"))
        .select($"n_users", $"t0_decicents", $"n_extreme",
          round(($"n_extreme" + 1).cast(DoubleType) / 65.0, 6).as("p_value"))
    },
    Some("""WITH u AS (SELECT user_id,
        SUM(CASE WHEN event_type = 'purchase'
          THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS sp,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS np,
        SUM(CASE WHEN event_type = 'click'
          THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS sc,
        COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS nc
      FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1),
      d AS (SELECT user_id,
          CAST(FLOOR((CAST(sp AS DOUBLE) / np - CAST(sc AS DOUBLE) / nc) * 10 + 0.5)
            AS BIGINT) AS d
        FROM u WHERE np > 0 AND nc > 0),
      reps AS (SELECT g.b,
          CAST(SUM(CASE WHEN ((48271 * ((48271 *
            (((user_id % 1000000007) * 1000003 + g.b * 131) % 1000000007 + 1))
            % 1000000007)) % 1000000007) % 2 = 0 THEN d ELSE -d END) AS BIGINT) AS t
        FROM d CROSS JOIN UNNEST(range(64)) AS g(b) GROUP BY 1),
      t0 AS (SELECT CAST(SUM(d) AS BIGINT) AS t0, COUNT(*) AS n_users FROM d)
      SELECT t0.n_users, t0.t0 AS t0_decicents,
        CAST(SUM(CASE WHEN ABS(t) >= ABS(t0.t0) THEN 1 ELSE 0 END) AS BIGINT)
          AS n_extreme,
        ROUND(CAST(SUM(CASE WHEN ABS(t) >= ABS(t0.t0) THEN 1 ELSE 0 END) + 1 AS DOUBLE)
          / 65.0, 6) AS p_value
      FROM reps, t0 GROUP BY t0.n_users, t0.t0""")
  )

  /** k-anonymity audit of the (event_type, hour-of-day) release grid —
    * the OTHER half of the privacy panel next to q_dp_counts: before a
    * cell table ships, every cell with fewer than k=25 contributors must
    * be suppressed, and the release owner needs the damage report. Pure
    * integer counting: per event_type, how many of its 24 hour cells
    * fall under k, how many rows that suppresses, and the suppressed
    * share (one exact divide). Scale shape: one map-side-combined
    * rollup to the 120-cell grid; everything after is panel-sized. */
  val qKAnonymity = GraftQuery(
    "q_k_anonymity",
    (s, dir) => {
      import s.implicits._
      val cells = Tables.events(s, dir)
        .groupBy($"event_type", hour($"ts").as("hb"))
        .agg(count(lit(1)).as("c"))
      cells.groupBy($"event_type").agg(
          count(lit(1)).as("n_cells"),
          sum(when($"c" < 25L, 1L).otherwise(0L)).as("n_suppressed_cells"),
          sum(when($"c" < 25L, $"c").otherwise(0L)).as("n_suppressed_rows"),
          sum($"c").as("n_rows"))
        .select($"event_type", $"n_cells", $"n_suppressed_cells",
          $"n_suppressed_rows",
          round($"n_suppressed_rows".cast(DoubleType) * 100.0 /
            $"n_rows".cast(DoubleType), 6).as("suppressed_pct"))
        .orderBy($"event_type")
    },
    Some("""WITH cells AS (SELECT event_type, EXTRACT(hour FROM ts) AS hb,
        COUNT(*) AS c FROM events GROUP BY 1, 2)
      SELECT event_type, COUNT(*) AS n_cells,
        CAST(SUM(CASE WHEN c < 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed_cells,
        CAST(SUM(CASE WHEN c < 25 THEN c ELSE 0 END) AS BIGINT) AS n_suppressed_rows,
        ROUND(CAST(SUM(CASE WHEN c < 25 THEN c ELSE 0 END) AS DOUBLE) * 100.0 /
          CAST(SUM(c) AS DOUBLE), 6) AS suppressed_pct
      FROM cells GROUP BY 1 ORDER BY event_type""")
  )

  /** l-diversity audit — the companion to [[qKAnonymity]]: k-anonymity
    * bounds group SIZE but a uniform-sensitive group still leaks, so this
    * measures, per quasi-identifier cell (event_type × hour, the same
    * cells as q_k_anonymity), the diversity of a sensitive attribute
    * (user_id mod 8, a deterministic stand-in class since the synthetic
    * schema carries no real sensitive column). Reports per event type:
    * distinct-l minimum, the count/share of cells below l=3, and the
    * minimum cell ENTROPY-l (exp of cell entropy — the stricter
    * criterion). Entropy terms are ppm-fixed-pointed per sensitive value
    * before the per-cell integer sum; exp/ln are single identical double
    * expressions. Scale shape: one (type, hour, class) rollup — cells ×
    * 8 rows of post-shuffle work. */
  val qLDiversity = GraftQuery(
    "q_l_diversity",
    (s, dir) => {
      import s.implicits._
      val sv = Tables.events(s, dir)
        .groupBy($"event_type", hour($"ts").as("hb"), ($"user_id" % 8).as("sens"))
        .agg(count(lit(1)).as("c"))
      val cellTot = sv.groupBy($"event_type", $"hb")
        .agg(sum($"c").as("t"), count(lit(1)).cast(LongType).as("l"))
      val cells = sv.join(cellTot, Seq("event_type", "hb"))
        .withColumn("term_ppm",
          floor(-($"c".cast(DoubleType) / $"t".cast(DoubleType)) *
            log($"c".cast(DoubleType) / $"t".cast(DoubleType)) * 1000000.0 + 0.5)
            .cast(LongType))
        .groupBy($"event_type", $"hb", $"l")
        .agg(sum($"term_ppm").cast(LongType).as("ent_ppm"))
      cells.groupBy($"event_type")
        .agg(count(lit(1)).as("n_cells"),
          min($"l").as("min_l"),
          sum(when($"l" < 3L, 1L).otherwise(0L)).as("n_cells_l_lt_3"),
          round(exp(min($"ent_ppm") / 1000000.0), 6).as("min_entropy_l"))
        .orderBy($"event_type")
    },
    Some("""WITH sv AS (SELECT event_type, EXTRACT(hour FROM ts) AS hb,
        user_id % 8 AS sens, COUNT(*) AS c FROM events GROUP BY 1, 2, 3),
      ct AS (SELECT event_type, hb, CAST(SUM(c) AS BIGINT) AS t,
          CAST(COUNT(*) AS BIGINT) AS l FROM sv GROUP BY 1, 2),
      cells AS (SELECT sv.event_type, sv.hb, ct.l,
          CAST(SUM(CAST(FLOOR(-(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) *
            LN(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT))
            AS BIGINT) AS ent_ppm
        FROM sv JOIN ct USING (event_type, hb) GROUP BY 1, 2, 3)
      SELECT event_type, COUNT(*) AS n_cells, MIN(l) AS min_l,
        CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_cells_l_lt_3,
        ROUND(EXP(MIN(ent_ppm) / 1000000.0), 6) AS min_entropy_l
      FROM cells GROUP BY 1 ORDER BY event_type""")
  )

  /** Brown–Forsythe test (Levene with median centers) for variance
    * homogeneity of l_quantity across the three return flags — the
    * robust precondition check behind q_anova (classic ANOVA assumes
    * equal variances; this is the test that says whether that holds).
    * Exactness: l_quantity is integral and the group median of an
    * integral column is a multiple of 0.5, so every |x−med| deviation is
    * a multiple of 0.5 and every z/z² sum is exactly representable —
    * order-independent without quantization. The three cross-group
    * between/within terms ARE ppm-fixed-pointed (they involve divisions)
    * before the final 3-row integer sum. One fact-table pass per side of
    * the median join; everything after is |groups|-sized. */
  val qLevene = GraftQuery(
    "q_levene",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .select($"l_returnflag".as("flag"), $"l_quantity".as("x"))
      val med = li.groupBy($"flag").agg(percentile($"x", lit(0.5)).as("med"))
      val g = li.join(broadcast(med), "flag")
        .select($"flag", abs($"x" - $"med").as("z"))
        .groupBy($"flag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum($"z").as("sz"), sum($"z" * $"z").as("szz"))
      val tot = g.agg(sum($"n").cast(LongType).as("nt"),
        count(lit(1)).cast(LongType).as("k"), sum($"sz").as("szt"))
      g.crossJoin(broadcast(tot))
        .select($"nt", $"k",
          ($"sz" / $"n".cast(DoubleType)).as("zbar"),
          floor($"n".cast(DoubleType) *
            ($"sz" / $"n".cast(DoubleType) - $"szt" / $"nt".cast(DoubleType)) *
            ($"sz" / $"n".cast(DoubleType) - $"szt" / $"nt".cast(DoubleType)) *
            1000000.0 + 0.5).cast(LongType).as("tb_ppm"),
          floor(($"szz" - $"sz" * $"sz" / $"n".cast(DoubleType)) * 1000000.0 + 0.5)
            .cast(LongType).as("tw_ppm"))
        .groupBy($"nt", $"k")
        .agg(sum($"tb_ppm").cast(LongType).as("ssb_ppm"),
          sum($"tw_ppm").cast(LongType).as("ssw_ppm"),
          round(max($"zbar"), 6).as("max_group_mad"),
          round(min($"zbar"), 6).as("min_group_mad"))
        .select($"nt".as("n"), $"k",
          ($"k" - 1L).as("dof1"), ($"nt" - $"k").as("dof2"),
          round(($"nt" - $"k").cast(DoubleType) / ($"k" - 1L).cast(DoubleType) *
            ($"ssb_ppm".cast(DoubleType) / $"ssw_ppm".cast(DoubleType)), 6)
            .as("bf_stat"),
          $"max_group_mad", $"min_group_mad")
    },
    Some("""WITH li AS (SELECT l_returnflag AS flag, l_quantity AS x FROM lineitem),
      med AS (SELECT flag, quantile_cont(x, 0.5) AS med FROM li GROUP BY 1),
      g AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(ABS(x - med)) AS sz, SUM(ABS(x - med) * ABS(x - med)) AS szz
        FROM li JOIN med USING (flag) GROUP BY 1),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(COUNT(*) AS BIGINT) AS k,
          SUM(sz) AS szt FROM g),
      terms AS (SELECT nt, k, sz / CAST(n AS DOUBLE) AS zbar,
          CAST(FLOOR(CAST(n AS DOUBLE) *
            (sz / CAST(n AS DOUBLE) - szt / CAST(nt AS DOUBLE)) *
            (sz / CAST(n AS DOUBLE) - szt / CAST(nt AS DOUBLE)) *
            1000000.0 + 0.5) AS BIGINT) AS tb_ppm,
          CAST(FLOOR((szz - sz * sz / CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
            AS BIGINT) AS tw_ppm
        FROM g, tot),
      agg AS (SELECT nt, k, CAST(SUM(tb_ppm) AS BIGINT) AS ssb_ppm,
          CAST(SUM(tw_ppm) AS BIGINT) AS ssw_ppm,
          ROUND(MAX(zbar), 6) AS max_group_mad, ROUND(MIN(zbar), 6) AS min_group_mad
        FROM terms GROUP BY 1, 2)
      SELECT nt AS n, k, k - 1 AS dof1, nt - k AS dof2,
        ROUND(CAST(nt - k AS DOUBLE) / CAST(k - 1 AS DOUBLE) *
          (CAST(ssb_ppm AS DOUBLE) / CAST(ssw_ppm AS DOUBLE)), 6) AS bf_stat,
        max_group_mad, min_group_mad
      FROM agg""")
  )

  /** COHEN'S KAPPA inter-annotator agreement (Cohen 1960) between two
    * deterministic document raters — the acceptance statistic for any
    * labeling/filter pipeline: rater A = composite quality score ≥ 0.5
    * (the q_quality_score formula), rater B = the Gopher rule
    * conjunction (the q_gopher_filter keep bit). κ = (p_o − p_e)/(1 − p_e)
    * corrects raw agreement for chance agreement from the raters'
    * marginals — the difference between "they agree 80% of the time"
    * and "they agree more than coin-flipping their own base rates
    * would". All four cell counts are exact integers; p_o/p_e are
    * fixed-order trees of integer-derived doubles, one ROUND at the
    * end. Scale: one map-side pass over documents to the 2×2 table —
    * nothing after is corpus-sized. */
  val qCohensKappa = GraftQuery(
    "q_cohens_kappa",
    (s, dir) => {
      import s.implicits._
      val scored = Tables.documents(s, dir)
        .select(
          (TextAnalysis.qualityScore($"text") >= 0.5).cast(LongType).as("a"),
          TextAnalysis.gopherKeepBit($"text").cast(LongType).as("b"))
      scored.agg(
          count(lit(1)).as("n"),
          sum($"a" * $"b").as("n11"),
          sum($"a" * (lit(1L) - $"b")).as("n10"),
          sum((lit(1L) - $"a") * $"b").as("n01"),
          sum((lit(1L) - $"a") * (lit(1L) - $"b")).as("n00"))
        .select($"n", $"n11", $"n10", $"n01", $"n00",
          round(($"n11" + $"n00").cast(DoubleType) / $"n".cast(DoubleType), 6)
            .as("p_o"),
          round(
            (($"n11" + $"n10").cast(DoubleType) / $"n".cast(DoubleType)) *
              (($"n11" + $"n01").cast(DoubleType) / $"n".cast(DoubleType)) +
            (($"n01" + $"n00").cast(DoubleType) / $"n".cast(DoubleType)) *
              (($"n10" + $"n00").cast(DoubleType) / $"n".cast(DoubleType)), 6)
            .as("p_e"),
          round(
            ((($"n11" + $"n00").cast(DoubleType) / $"n".cast(DoubleType)) -
             ((($"n11" + $"n10").cast(DoubleType) / $"n".cast(DoubleType)) *
                (($"n11" + $"n01").cast(DoubleType) / $"n".cast(DoubleType)) +
              (($"n01" + $"n00").cast(DoubleType) / $"n".cast(DoubleType)) *
                (($"n10" + $"n00").cast(DoubleType) / $"n".cast(DoubleType)))) /
            (lit(1.0) -
             ((($"n11" + $"n10").cast(DoubleType) / $"n".cast(DoubleType)) *
                (($"n11" + $"n01").cast(DoubleType) / $"n".cast(DoubleType)) +
              (($"n01" + $"n00").cast(DoubleType) / $"n".cast(DoubleType)) *
                (($"n10" + $"n00").cast(DoubleType) / $"n".cast(DoubleType)))), 6)
            .as("kappa"))
    },
    Some("""WITH t AS (SELECT text,
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents),
      m AS (SELECT text, toks,
        CASE WHEN TRIM(text) = '' THEN 0 ELSE LEN(string_split_regex(TRIM(text), '\s+')) END AS ws,
        CAST(LENGTH(text) AS DOUBLE) AS len,
        CAST(COALESCE(list_sum(list_transform(toks, x -> LENGTH(x))), 0) AS DOUBLE) / GREATEST(LEN(toks), 1) AS mean_len,
        CAST(LEN(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for','on','with','as','was','at'))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS stop_ratio,
        CAST(LEN(list_distinct(CASE WHEN LEN(toks) < 5 THEN [array_to_string(toks, ' ')]
          ELSE [array_to_string(toks[i+1:i+5], ' ') FOR i IN range(0, LEN(toks)-4)] END)) AS DOUBLE)
          / (CASE WHEN LEN(toks) < 5 THEN 1 ELSE LEN(toks) - 4 END) AS uniq_ratio,
        CAST(LEN(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) / GREATEST(LENGTH(text), 1) AS punct_ratio
      FROM t),
      ab AS (SELECT
        CASE WHEN ROUND(LEAST(len / 50.0, 1.0) * (CASE WHEN len > 10000 THEN 0.5 ELSE 1.0 END) * 0.4
              + LEAST(stop_ratio * 4.0, 1.0) * 0.3
              + GREATEST(0.0, 1.0 - punct_ratio * 4.0) * 0.3, 6) >= 0.5
          THEN 1 ELSE 0 END AS a,
        (CAST(ws >= 30 AND ws <= 50000 AS INT) *
         CAST(mean_len >= 2.0 AND mean_len <= 12.0 AS INT) *
         CAST(stop_ratio >= 0.02 AS INT) *
         CAST(uniq_ratio >= 0.3 AS INT) *
         CAST(punct_ratio <= 0.1 AS INT)) AS b
      FROM m),
      c AS (SELECT COUNT(*) AS n,
        CAST(SUM(a * b) AS BIGINT) AS n11,
        CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
        CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
        CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM ab)
      SELECT n, n11, n10, n01, n00,
        ROUND(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_o,
        ROUND((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
            (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
          (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) *
            (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS p_e,
        ROUND(((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) -
           ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
              (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
            (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) *
              (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)))) /
          (1.0 -
           ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
              (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
            (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) *
              (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS kappa
      FROM c""")
  )

  /** PRECISION-RECALL operating-curve panel of the quality score
    * against the declared-English label — the threshold-sweep companion
    * of q_auc (AUC summarizes ranking; a filter DEPLOYMENT needs the
    * table of operating points to pick its cut). 21 fixed thresholds at
    * 0.05 steps over the ppm-quantized score; per threshold: exact
    * integer tp/fp/fn/tn and the derived precision/recall/F1 (single
    * fixed-order double division each, NULL-guarded at the degenerate
    * ends — never a divide-by-zero).
    *
    * Scale: the corpus reduces FIRST to the (pos, score_ppm) panel
    * (≤ 2·10⁶+2 rows by construction since scores are 6-dec rounded in
    * [0,1]); the 21-threshold sweep is a broadcast cross join against
    * that panel, never against the corpus — the q_isotonic lesson
    * (no global sort, no per-row windows). */
  val qPrCurve = GraftQuery(
    "q_pr_curve",
    (s, dir) => {
      import s.implicits._
      val panel = Tables.documents(s, dir)
        .select(($"lang" === "en").cast(LongType).as("pos"),
          floor(TextAnalysis.qualityScore($"text") * 1000000.0 + 0.5)
            .cast(LongType).as("qm"))
        .groupBy($"pos", $"qm").agg(count(lit(1)).as("c"))
      panel
        .withColumn("thr", explode(typedLit((0 to 20).map(_ * 50000L).toList)))
        .groupBy($"thr")
        .agg(
          sum(when($"pos" === 1L && $"qm" >= $"thr", $"c").otherwise(0L)).as("tp"),
          sum(when($"pos" === 0L && $"qm" >= $"thr", $"c").otherwise(0L)).as("fp"),
          sum(when($"pos" === 1L && $"qm" < $"thr", $"c").otherwise(0L)).as("fn"),
          sum(when($"pos" === 0L && $"qm" < $"thr", $"c").otherwise(0L)).as("tn"))
        .select($"thr".as("thr_ppm"), $"tp", $"fp", $"fn", $"tn",
          when($"tp" + $"fp" > 0L,
            round($"tp".cast(DoubleType) / ($"tp" + $"fp").cast(DoubleType), 6))
            .as("precision_"),
          when($"tp" + $"fn" > 0L,
            round($"tp".cast(DoubleType) / ($"tp" + $"fn").cast(DoubleType), 6))
            .as("recall_"),
          when($"tp" > 0L,
            round(lit(2.0) * $"tp".cast(DoubleType) /
              (lit(2.0) * $"tp".cast(DoubleType) +
                $"fp".cast(DoubleType) + $"fn".cast(DoubleType)), 6))
            .when($"fp" + $"fn" > 0L, lit(0.0))
            .as("f1"))
        .orderBy($"thr_ppm")
    },
    Some("""WITH t AS (SELECT lang, text,
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents),
      m AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        CAST(LENGTH(text) AS DOUBLE) AS len,
        CAST(LEN(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for','on','with','as','was','at'))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS stop_ratio,
        CAST(LEN(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) / GREATEST(LENGTH(text), 1) AS punct_ratio
      FROM t),
      sc AS (SELECT pos, CAST(FLOOR(
          ROUND(LEAST(len / 50.0, 1.0) * (CASE WHEN len > 10000 THEN 0.5 ELSE 1.0 END) * 0.4
              + LEAST(stop_ratio * 4.0, 1.0) * 0.3
              + GREATEST(0.0, 1.0 - punct_ratio * 4.0) * 0.3, 6) * 1000000.0 + 0.5)
          AS BIGINT) AS qm
      FROM m),
      panel AS (SELECT pos, qm, COUNT(*) AS c FROM sc GROUP BY 1, 2),
      sw AS (SELECT th.thr, panel.* FROM panel
        CROSS JOIN (SELECT unnest(range(21)) * 50000 AS thr) th),
      a AS (SELECT thr,
          CAST(SUM(CASE WHEN pos = 1 AND qm >= thr THEN c ELSE 0 END) AS BIGINT) AS tp,
          CAST(SUM(CASE WHEN pos = 0 AND qm >= thr THEN c ELSE 0 END) AS BIGINT) AS fp,
          CAST(SUM(CASE WHEN pos = 1 AND qm < thr THEN c ELSE 0 END) AS BIGINT) AS fn,
          CAST(SUM(CASE WHEN pos = 0 AND qm < thr THEN c ELSE 0 END) AS BIGINT) AS tn
        FROM sw GROUP BY 1)
      SELECT thr AS thr_ppm, tp, fp, fn, tn,
        CASE WHEN tp + fp > 0
          THEN ROUND(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END
          AS precision_,
        CASE WHEN tp + fn > 0
          THEN ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END
          AS recall_,
        CASE WHEN tp > 0
          THEN ROUND(2.0 * CAST(tp AS DOUBLE) /
            (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)), 6)
          WHEN fp + fn > 0 THEN 0.0 END AS f1
      FROM a ORDER BY thr_ppm""")
  )

  /** 1-D WASSERSTEIN (earth-mover) distance between the purchase-value
    * distributions of the two experiment arms (user-parity split) —
    * the drift/effect metric that, unlike the KS statistic's single
    * worst point (q_ks_drift), integrates the WHOLE CDF gap:
    * W₁ = ∫|F₀−F₁|dx = Σᵢ |F₀(vᵢ)−F₁(vᵢ)|·(vᵢ₊₁−vᵢ) over the sorted
    * distinct values. The CDF gap at each value is the EXACT integer
    * |cum₀·n₁ − cum₁·n₀| (cross-multiplied — no per-row division), the
    * value gap is a difference of raw input doubles, and each term's
    * single division is one fixed tree cast to DECIMAL(18,12) before
    * the order-free sum.
    *
    * Scale: the rank-kernel shape — one rollup to the distinct-value
    * relation, one prefix-sum window over those (already aggregated)
    * rows, a lead(), one sum. At 100 TB the window swaps for a
    * range-partitioned two-pass prefix sum, nothing else changes. */
  val qWasserstein1d = GraftQuery(
    "q_wasserstein_1d",
    (s, dir) => {
      import s.implicits._
      val pv = Tables.events(s, dir)
        .filter($"event_type" === "purchase")
        .select(($"user_id" % 2).as("arm"), $"value".as("v"))
      val dv = pv.groupBy($"v")
        .agg(sum(when($"arm" === 0L, 1L).otherwise(0L)).as("c0"),
          sum(when($"arm" === 1L, 1L).otherwise(0L)).as("c1"))
      val w = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val terms = dv
        .withColumn("cum0", sum($"c0").over(w))
        .withColumn("cum1", sum($"c1").over(w))
        .withColumn("vnext", lead($"v", 1).over(Window.orderBy($"v")))
      val tot = terms.agg(sum($"c0").as("n0"), sum($"c1").as("n1"))
      terms.crossJoin(broadcast(tot))
        .filter($"vnext".isNotNull)
        .select($"n0", $"n1",
          ((abs($"cum0" * $"n1" - $"cum1" * $"n0").cast(DoubleType) /
            ($"n0" * $"n1").cast(DoubleType)) * ($"vnext" - $"v"))
            .cast(DecimalType(18, 12)).as("term"))
        .groupBy($"n0", $"n1")
        .agg(round(sum($"term").cast(DoubleType), 6).as("w1"))
        .select($"n0", $"n1", $"w1")
    },
    Some("""WITH pv AS (SELECT user_id % 2 AS arm, value AS v
        FROM events WHERE event_type = 'purchase'),
      dv AS (SELECT v,
          CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
          CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM pv GROUP BY 1),
      cu AS (SELECT v, c0, c1,
          CAST(SUM(c0) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum0,
          CAST(SUM(c1) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
          LEAD(v, 1) OVER (ORDER BY v) AS vnext
        FROM dv),
      tot AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0,
          CAST(SUM(c1) AS BIGINT) AS n1 FROM dv),
      t AS (SELECT n0, n1,
          CAST((CAST(ABS(cum0 * n1 - cum1 * n0) AS DOUBLE) /
            CAST(n0 * n1 AS DOUBLE)) * (vnext - v) AS DECIMAL(18,12)) AS term
        FROM cu, tot WHERE vnext IS NOT NULL)
      SELECT n0, n1, ROUND(CAST(SUM(term) AS DOUBLE), 6) AS w1
      FROM t GROUP BY n0, n1""")
  )

  /** CRAMÉR'S V association strength between event type and day-of-week
    * (Cramér 1946) — the normalized-χ² effect size that answers "is the
    * action mix actually different across weekdays, and by how much?"
    * (χ² alone grows with n; V = √(χ²/(n·min(r−1,c−1))) ∈ [0,1] is
    * comparable across corpus sizes). Expected cells e = rt·ct/n and
    * each (o−e)²/e are fixed double trees over exact integer marginals,
    * quantized to DECIMAL(18,12) before the ≤ 7·|types| cell sum; one
    * √ at the end. Scale: one map-side rollup to the cell panel;
    * everything after is panel-sized (the q_chisq_independence shape on
    * the temporal axis). */
  val qCramersV = GraftQuery(
    "q_cramers_v",
    (s, dir) => {
      import s.implicits._
      val c = graft.operators.Caches.register(Tables.events(s, dir)
        .select($"event_type",
          (expr("unix_micros(ts) DIV 86400000000") % 7).as("dow"))
        .groupBy($"event_type", $"dow").agg(count(lit(1)).as("o")))
      val rt = c.groupBy($"event_type").agg(sum($"o").as("rt"))
      val ct = c.groupBy($"dow").agg(sum($"o").as("ct"))
      val tot = c.agg(sum($"o").cast(LongType).as("n"),
        countDistinct($"event_type").cast(LongType).as("r"),
        countDistinct($"dow").cast(LongType).as("k"))
      val chi = c.join(broadcast(rt), "event_type")
        .join(broadcast(ct), "dow")
        .crossJoin(broadcast(tot))
        .select($"n", $"r", $"k",
          ((($"o".cast(DoubleType) -
              ($"rt" * $"ct").cast(DoubleType) / $"n".cast(DoubleType)) *
            ($"o".cast(DoubleType) -
              ($"rt" * $"ct").cast(DoubleType) / $"n".cast(DoubleType))) /
            (($"rt" * $"ct").cast(DoubleType) / $"n".cast(DoubleType)))
            .cast(DecimalType(18, 12)).as("term"))
        .groupBy($"n", $"r", $"k")
        .agg(sum($"term").as("chi2d"))
      chi.select($"n", $"r".as("n_rows_"), $"k".as("n_cols_"),
        round($"chi2d".cast(DoubleType), 6).as("chi2"),
        round(sqrt($"chi2d".cast(DoubleType) /
          ($"n" * least($"r" - 1L, $"k" - 1L)).cast(DoubleType)), 6)
          .as("cramers_v"))
    },
    Some("""WITH b AS (SELECT event_type,
        (CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) % 7) AS dow
      FROM events),
      c AS (SELECT event_type, dow, COUNT(*) AS o FROM b GROUP BY 1, 2),
      rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM c GROUP BY 1),
      ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS ct FROM c GROUP BY 1),
      tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
          CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
          CAST(COUNT(DISTINCT dow) AS BIGINT) AS k FROM c),
      t AS (SELECT tot.n, tot.r, tot.k,
          CAST(((CAST(c.o AS DOUBLE) -
              CAST(rt.rt * ct.ct AS DOUBLE) / CAST(tot.n AS DOUBLE)) *
            (CAST(c.o AS DOUBLE) -
              CAST(rt.rt * ct.ct AS DOUBLE) / CAST(tot.n AS DOUBLE))) /
            (CAST(rt.rt * ct.ct AS DOUBLE) / CAST(tot.n AS DOUBLE))
            AS DECIMAL(18,12)) AS term
        FROM c JOIN rt USING (event_type) JOIN ct USING (dow), tot),
      g AS (SELECT n, r, k, SUM(term) AS chi2d FROM t GROUP BY 1, 2, 3)
      SELECT n, r AS n_rows_, k AS n_cols_,
        ROUND(CAST(chi2d AS DOUBLE), 6) AS chi2,
        ROUND(SQRT(CAST(chi2d AS DOUBLE) /
          CAST(n * LEAST(r - 1, k - 1) AS DOUBLE)), 6) AS cramers_v
      FROM g""")
  )

  val all: Seq[GraftQuery] =
    Seq(qSpearman, qMannWhitney, qAuc, qDpCounts, qBootstrapCi, qAnova,
      qHuberMean, qKendallTau, qPermutationTest, qKAnonymity, qLevene,
      qLDiversity, qCohensKappa, qPrCurve, qWasserstein1d, qCramersV)
}
