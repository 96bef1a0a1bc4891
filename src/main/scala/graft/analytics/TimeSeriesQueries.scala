package graft.analytics

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-series operators over the events stream: spine generation with
  * gap fill / forward fill, and deterministic anomaly flagging — the
  * monitoring layer a production ingest pipeline runs next to its
  * aggregates.
  *
  * Scale notes: both queries aggregate first (one shuffle on
  * (type, hour/day) — partial-aggregated, so raw events never shuffle),
  * then do all window work over the AGGREGATE relation, which is
  * O(types × periods) — thousands of rows at any corpus size. The spine
  * cross-join is types × one-row bounds, broadcast. Windows partition by
  * event_type — never a global single-partition sort.
  *
  * Determinism: every mean/variance is computed from DECIMAL window sums
  * (exact, order-independent) with the identical double expression tree
  * in both engines — stddev/avg builtins are deliberately NOT used, as
  * their accumulation order differs across engines.
  */
object TimeSeriesQueries {

  /** Hourly spine per event type with zero-filled counts and
    * forward-filled (last non-null) hourly sums. */
  val qGapFill = GraftQuery(
    "q_gap_fill",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val hourly = ev
        .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
        .agg(count(lit(1)).as("n"), sum($"value".cast(DecimalType(18, 6))).as("sv"))
      val bounds = ev.agg(date_trunc("hour", min($"ts")).as("lo"),
        date_trunc("hour", max($"ts")).as("hi"))
      val spine = ev.select($"event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select($"event_type",
          explode(sequence($"lo", $"hi", expr("interval 1 hour"))).as("hour"))
      val w = Window.partitionBy($"event_type").orderBy($"hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("event_type", "hour"), "left")
        .withColumn("n_filled", coalesce($"n", lit(0L)))
        .withColumn("filled_value",
          round(last($"sv", ignoreNulls = true).over(w).cast(DoubleType), 6))
        .select($"event_type", date_format($"hour", "yyyy-MM-dd HH:mm:ss").as("hour"),
          $"n_filled", $"filled_value")
        .orderBy($"event_type", $"hour")
    },
    Some("""WITH b AS (SELECT DATE_TRUNC('hour', MIN(ts)) AS lo, DATE_TRUNC('hour', MAX(ts)) AS hi FROM events),
      ty AS (SELECT DISTINCT event_type FROM events),
      spine AS (SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM ty, b),
      hourly AS (SELECT event_type, DATE_TRUNC('hour', ts) AS hour,
        COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv
      FROM events GROUP BY 1, 2)
      SELECT s.event_type, STRFTIME(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
        COALESCE(h.n, 0) AS n_filled,
        ROUND(CAST(LAST_VALUE(h.sv IGNORE NULLS) OVER (PARTITION BY s.event_type ORDER BY s.hour
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS filled_value
      FROM spine s LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour = s.hour
      ORDER BY s.event_type, hour""")
  )

  /** Daily-total z-score anomaly flags per event type. Variance is
    * derived from exact decimal window sums via the explicit
    * (Σx² − (Σx)²/n)/(n−1) form — identical float ops in both engines,
    * no engine-specific Welford accumulation. */
  val qZscoreOutliers = GraftQuery(
    "q_zscore_outliers",
    (s, dir) => {
      import s.implicits._
      val day = Tables.events(s, dir)
        .groupBy($"event_type",
          date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
        .agg(sum($"value".cast(DecimalType(18, 6))).cast(DecimalType(18, 6)).as("dsum"))
      val w = Window.partitionBy($"event_type")
      val sumAll = sum($"dsum").over(w).cast(DoubleType)
      val cnt = count(lit(1)).over(w).cast(DoubleType)
      // Σdsum² accumulates Decimal(38,12): exact while the per-type total
      // stays under 10^26, i.e. |dsum| ≲ 10^12 over ~100 days. Past that,
      // non-ANSI Spark yields a silent null while the DuckDB oracle (int128
      // storage) keeps going — so overflow must FAIL here, not diverge.
      val sumSqRaw = sum($"dsum" * $"dsum").over(w)
      val sumSq = when(sumSqRaw.isNull && max($"dsum").over(w).isNotNull,
        raise_error(lit("q_zscore_outliers: sum(dsum^2) overflowed Decimal(38,12) " +
          "— daily totals exceed the documented 1e12 magnitude bound"))
          .cast(DoubleType))
        .otherwise(sumSqRaw.cast(DoubleType))
      val mean = sumAll / cnt
      val variance = (sumSq - sumAll * sumAll / cnt) / (cnt - 1)
      val std = sqrt(greatest(variance, lit(0.0)))
      val z = when(std === 0.0, 0.0).otherwise(($"dsum".cast(DoubleType) - mean) / std)
      day
        .withColumn("z", round(z, 6))
        .select($"event_type", $"day", $"dsum".cast(DoubleType).as("day_sum"),
          $"z", (abs($"z") > 2.0).cast("int").as("is_outlier"))
        .orderBy($"event_type", $"day")
    },
    Some("""WITH day AS (SELECT event_type, STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS dsum
      FROM events GROUP BY 1, 2),
      s AS (SELECT event_type, day, dsum,
        CAST(SUM(dsum) OVER (PARTITION BY event_type) AS DOUBLE) AS sum_all,
        CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE) AS cnt,
        -- DECIMAL(19) storage is int128 in DuckDB: the (18,6)×(18,6)
        -- product overflows the int64 fast path otherwise. Exact either way
        CAST(SUM(CAST(dsum AS DECIMAL(19,6)) * dsum) OVER (PARTITION BY event_type) AS DOUBLE) AS sum_sq
      FROM day),
      zc AS (SELECT event_type, day, dsum,
        SQRT(GREATEST((sum_sq - sum_all * sum_all / cnt) / (cnt - 1), 0.0)) AS std,
        sum_all / cnt AS mean
      FROM s)
      SELECT event_type, day, CAST(dsum AS DOUBLE) AS day_sum,
        ROUND(CASE WHEN std = 0.0 THEN 0.0 ELSE (CAST(dsum AS DOUBLE) - mean) / std END, 6) AS z,
        CAST(ABS(ROUND(CASE WHEN std = 0.0 THEN 0.0 ELSE (CAST(dsum AS DOUBLE) - mean) / std END, 6)) > 2.0 AS INT) AS is_outlier
      FROM zc ORDER BY event_type, day""")
  )

  /** 7-day rolling daily totals per event type — a RANGE frame over the
    * day index (range, not rows: the window is defined by day DISTANCE,
    * so it stays correct if a day has no events). All rolling work runs
    * over the per-day aggregate relation. */
  val qRolling7d = GraftQuery(
    "q_rolling_7d",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
        .agg(sum($"value".cast(DecimalType(18, 6))).as("dsum"))
        .withColumn("day_idx", datediff($"d", lit("2024-01-01").cast("date")))
      val w = Window.partitionBy($"event_type").orderBy($"day_idx")
        .rangeBetween(-6, Window.currentRow)
      daily
        .withColumn("rolling_7d", sum($"dsum").over(w).cast(DoubleType))
        .select($"event_type", date_format($"d", "yyyy-MM-dd").as("day"),
          $"dsum".cast(DoubleType).as("day_sum"), $"rolling_7d")
        .orderBy($"event_type", $"day")
    },
    Some("""WITH daily AS (SELECT event_type, DATE_TRUNC('day', ts) AS d,
        SUM(CAST(value AS DECIMAL(18,6))) AS dsum
      FROM events GROUP BY 1, 2),
      idx AS (SELECT event_type, d, dsum,
        DATEDIFF('day', DATE '2024-01-01', CAST(d AS DATE)) AS day_idx
      FROM daily)
      SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS day,
        CAST(dsum AS DOUBLE) AS day_sum,
        CAST(SUM(dsum) OVER (PARTITION BY event_type ORDER BY day_idx
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_7d
      FROM idx ORDER BY event_type, day""")
  )

  /** Median absolute deviation per event type — the robust dispersion
    * statistic (outlier-insensitive, unlike stddev). Two exact-quantile
    * passes: per-type median (broadcast back — one row per type), then
    * the median of absolute deviations. The unrounded median feeds the
    * deviation in both engines; only outputs are rounded. */
  /** EWMA smoothing of the daily event-count series (α = 0.3), with the
    * per-day deviation |n − ewma| — the classic online anomaly baseline.
    *
    * The recurrence ewma_t = α·x_t + (1−α)·ewma_{t−1} is SEQUENTIAL by
    * definition, which makes windowed-sum formulations float-fragile
    * (engines disagree on summation association for window frames). So
    * each group's ordered series folds EXPLICITLY: prefix t re-folds
    * elements 1..t left-to-right — O(days²) scalar ops per group over
    * the (types × days)-sized AGGREGATE relation, bit-identical in any
    * engine that folds left-to-right, which is what puts an iterative
    * smoother under the hash gate at all. Counts are exact in double;
    * the corpus shuffles once into the daily rollup. */
  val qEwma = GraftQuery(
    "q_ewma",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
        .agg(count(lit(1)).as("n"))
      daily
        .groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"d", $"n"))).as("s"))
        .select($"event_type",
          expr("transform(s, p -> p.d)").as("days"),
          expr("transform(s, p -> CAST(p.n AS DOUBLE))").as("xs"))
        .select($"event_type", posexplode($"days").as(Seq("t", "d")), $"xs")
        .withColumn("ewma", expr(
          "aggregate(slice(xs, 2, t), element_at(xs, 1), " +
            "(acc, x) -> 0.3 * x + 0.7 * acc)"))
        .select($"event_type", date_format($"d", "yyyy-MM-dd").as("day"),
          element_at($"xs", $"t" + 1).as("n"),
          round($"ewma", 6).as("ewma"),
          round(abs(element_at($"xs", $"t" + 1) - $"ewma"), 6).as("deviation"))
        .orderBy($"event_type", $"day")
    },
    Some("""WITH daily AS (SELECT event_type, DATE_TRUNC('day', ts) AS d, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
      g AS (SELECT event_type,
          list(d ORDER BY d) AS days,
          list(CAST(n AS DOUBLE) ORDER BY d) AS xs
        FROM daily GROUP BY event_type)
      SELECT event_type, STRFTIME(days[t.i + 1], '%Y-%m-%d') AS day,
        xs[t.i + 1] AS n,
        ROUND(list_reduce(xs[1 : t.i + 1], (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma,
        ROUND(ABS(xs[t.i + 1] -
          list_reduce(xs[1 : t.i + 1], (acc, x) -> 0.3 * x + 0.7 * acc)), 6) AS deviation
      FROM g, UNNEST(range(len(xs))) AS t(i)
      ORDER BY event_type, day""")
  )

  /** Per-series linear TREND (OLS slope/intercept of daily counts over
    * the day index) — "is this event type growing?" as closed-form
    * arithmetic over exact integer sums: slope = (nΣxy − ΣxΣy) /
    * (nΣx² − (Σx)²). Every sum is integer-exact in both engines, the
    * one float division is identical, so a REGRESSION is hash-gated.
    * All computation after the daily rollup is O(types × days). */
  val qTrend = GraftQuery(
    "q_trend",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
        .agg(count(lit(1)).as("y"))
        .withColumn("x", datediff($"d", lit("2024-01-01").cast("date")).cast("long"))
      daily.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
        .select($"event_type", $"n",
          round(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
            ($"n" * $"sxx" - $"sx" * $"sx"), 6).as("slope"),
          round(($"sy" - ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
            ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n", 6).as("intercept"))
        .orderBy($"event_type")
    },
    Some("""WITH daily AS (SELECT event_type, DATE_TRUNC('day', ts) AS d, COUNT(*) AS y
      FROM events GROUP BY 1, 2),
      xy AS (SELECT event_type,
          CAST(DATEDIFF('day', DATE '2024-01-01', CAST(d AS DATE)) AS BIGINT) AS x, y
        FROM daily),
      a AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
          SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM xy GROUP BY event_type)
      SELECT event_type, n,
        ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 6) AS slope,
        ROUND((sy - CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) * sx) / n, 6)
          AS intercept
      FROM a ORDER BY event_type""")
  )

  val qMad = GraftQuery(
    "q_mad",
    (s, dir) => {
      import s.implicits._
      val med = Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(element_at(graft.expressions.ExactQuantiles.quantiles(
          $"value", Seq(0.5)), 1).as("med"))
      Tables.events(s, dir)
        .join(broadcast(med), "event_type")
        .withColumn("dev", abs($"value" - $"med"))
        .groupBy($"event_type")
        .agg(
          round(first($"med"), 6).as("median"),
          round(element_at(graft.expressions.ExactQuantiles.quantiles(
            $"dev", Seq(0.5)), 1), 6).as("mad"))
        .orderBy($"event_type")
    },
    Some("""WITH med AS (SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
        FROM events GROUP BY 1)
      SELECT e.event_type,
        ROUND(ANY_VALUE(m.med), 6) AS median,
        ROUND(QUANTILE_CONT(ABS(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type ORDER BY e.event_type""")
  )

  /** Population Stability Index between the first and second half of the
    * month — the standard drift alarm for a numeric feature: bucket
    * `value` into fixed-width bins, compare the two periods' bin shares,
    * PSI = Σ (p−q)·ln(p/q). One shuffle (the bin×period rollup runs with
    * map-side combine); everything after operates on ≤ bins rows.
    * Counts get +0.5 smoothing so empty bins stay finite (deterministic,
    * mirrored in the oracle); shares divide exact integer-derived
    * doubles, so the single ln per BIN is low-volume and its last-ulp
    * noise sits far below the 6dp rounding. */
  val qDriftPsi = GraftQuery(
    "q_drift_psi",
    (s, dir) => {
      import s.implicits._
      val pivot = lit("2024-01-16").cast("timestamp")
      val bin = least(floor($"value" / 50.0), lit(9.0)).cast("int")
      val per = Tables.events(s, dir)
        .select(bin.as("bin"), ($"ts" >= pivot).cast("int").as("cur"))
        .groupBy($"bin")
        .agg(sum(lit(1) - $"cur").as("n_ref"), sum($"cur").as("n_cur"))
      val tot = per.agg(sum($"n_ref").as("t_ref"), sum($"n_cur").as("t_cur"))
      per.crossJoin(broadcast(tot))
        .withColumn("p", ($"n_ref" + 0.5) / ($"t_ref" + 5.0))
        .withColumn("q", ($"n_cur" + 0.5) / ($"t_cur" + 5.0))
        .select($"bin", $"n_ref", $"n_cur",
          round(($"p" - $"q") * log($"p" / $"q"), 6).as("psi_contrib"))
        .orderBy($"bin")
    },
    Some("""WITH b AS (SELECT LEAST(CAST(FLOOR(value / 50.0) AS INT), 9) AS bin,
        CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS cur
      FROM events),
      per AS (SELECT bin, CAST(SUM(1 - cur) AS BIGINT) AS n_ref,
          CAST(SUM(cur) AS BIGINT) AS n_cur
        FROM b GROUP BY bin),
      tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
          CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM per)
      SELECT bin, n_ref, n_cur,
        ROUND(((n_ref + 0.5) / (t_ref + 5.0) - (n_cur + 0.5) / (t_cur + 5.0))
          * LN(((n_ref + 0.5) / (t_ref + 5.0)) / ((n_cur + 0.5) / (t_cur + 5.0))), 6)
          AS psi_contrib
      FROM per CROSS JOIN tot ORDER BY bin""")
  )

  /** Seasonal (day-of-week × hour) traffic baseline with per-cell
    * anomaly headroom: hourly event counts roll up per calendar date,
    * then each (dow, hour) cell reports its across-dates mean, sample
    * stddev and the worst standardized excursion (max_z). The seasonal
    * complement of q_zscore_outliers' global baseline — a Monday-9am
    * spike is an anomaly against Monday-9am, not against 3am Sunday.
    *
    * Portability: dow derives from integer epoch-day arithmetic
    * ((days + 4) % 7, Sunday = 0) — Spark's dayofweek() and DuckDB's
    * dayofweek() disagree on numbering, integer DIV does not. Mean, sd
    * and max_z come from exact integer count sums with the identical
    * double expression tree in both engines (the module's stddev
    * discipline); cells observed on a single date carry NULL sd/max_z
    * rather than a divide-by-zero.
    *
    * Scale: one shuffle on (date, dow, hour) — partial-aggregated — then
    * everything runs on the O(dates × 168) relation. */
  val qSeasonalBaseline = GraftQuery(
    "q_seasonal_baseline",
    (s, dir) => {
      import s.implicits._
      val hourly = Tables.events(s, dir)
        .select(expr("unix_micros(ts) DIV 86400000000").as("eday"),
          hour($"ts").as("hour"))
        .groupBy($"eday", $"hour")
        .agg(count(lit(1)).as("n"))
        .select(pmod($"eday" + lit(4L), lit(7L)).as("dow"), $"hour", $"n")
      // moment sums widen through DECIMAL(38,0) (DuckDB: HUGEINT) — the
      // module's discipline; a cell at corpus scale can hold ~1e9 events
      // and s*s would silently wrap a 64-bit sum
      hourly.groupBy($"dow", $"hour")
        .agg(count(lit(1)).as("n_days"),
          sum($"n".cast(DecimalType(38, 0))).as("s"),
          // widen BEFORE the product — n*n in 64-bit wraps silently past
          // ~3e9 events per cell
          sum($"n".cast(DecimalType(38, 0)) * $"n".cast(DecimalType(38, 0)))
            .as("ss"),
          max($"n").as("mx"))
        .select($"dow", $"hour", $"n_days",
          round($"s".cast(DoubleType) / $"n_days".cast(DoubleType), 6).as("mean_n"),
          when($"n_days" > 1,
            round(sqrt(($"n_days" * $"ss" - $"s" * $"s").cast(DoubleType) /
              ($"n_days" * ($"n_days" - 1)).cast(DoubleType)), 6))
            .as("sd_n"),
          when($"n_days" > 1 && ($"n_days" * $"ss" - $"s" * $"s") > 0,
            round(($"n_days" * $"mx" - $"s").cast(DoubleType) /
              ($"n_days".cast(DoubleType) *
                sqrt(($"n_days" * $"ss" - $"s" * $"s").cast(DoubleType) /
                  ($"n_days" * ($"n_days" - 1)).cast(DoubleType))), 6))
            .as("max_z"))
        .orderBy($"dow", $"hour")
    },
    Some("""WITH hourly AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS eday,
          hour(ts) AS hour, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      cells AS (SELECT (eday + 4) % 7 AS dow, hour, CAST(n AS BIGINT) AS n
        FROM hourly),
      agg AS (SELECT dow, hour, COUNT(*) AS n_days,
          SUM(n) AS s, SUM(n * n) AS ss,
          MAX(n) AS mx
        FROM cells GROUP BY dow, hour)
      SELECT dow, hour, n_days,
        ROUND(CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS mean_n,
        CASE WHEN n_days > 1 THEN
          ROUND(SQRT(CAST(n_days * ss - s * s AS DOUBLE) /
            CAST(n_days * (n_days - 1) AS DOUBLE)), 6) END AS sd_n,
        CASE WHEN n_days > 1 AND n_days * ss - s * s > 0 THEN
          ROUND(CAST(n_days * mx - s AS DOUBLE) /
            (CAST(n_days AS DOUBLE) *
             SQRT(CAST(n_days * ss - s * s AS DOUBLE) /
               CAST(n_days * (n_days - 1) AS DOUBLE))), 6) END AS max_z
      FROM agg ORDER BY dow, hour""")
  )

  /** CUSUM changepoint detection on the daily event-count series: the
    * classic mean-shift detector the z-score flags can't replace (a
    * small sustained shift never crosses a per-point threshold but
    * accumulates in the CUSUM). The textbook recursion C_t = max(0,
    * C_{t-1} + x_t − μ − k) is NOT window-expressible — but it equals
    * S_t − min_{t'≤t} S_{t'} for the drift-adjusted prefix sum S, so
    * both one-sided statistics become a cumulative sum plus a running
    * extremum over the DAY-level rollup (two frames of one ordered
    * window; domain-sized, never corpus-sized). μ and σ come from exact
    * integer day-count moments (1-row broadcast); slack k = σ/2 and
    * threshold h = 4σ are the standard defaults; the per-day terms are
    * one fixed IEEE tree evaluated in the deterministic day order, so
    * both engines agree bit-for-bit. */
  val qCusum = GraftQuery(
    "q_cusum",
    (s, dir) => {
      import s.implicits._
      val byDay = Tables.events(s, dir)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("eday"))
        .agg(count(lit(1)).as("x"))
      // x widens BEFORE the product — a 64-bit x*x wraps silently above
      // ~3e9 events/day while DuckDB's HUGEINT stays exact
      val xd = $"x".cast(DecimalType(38, 0))
      val m = byDay.agg(count(lit(1)).as("nd"),
        sum(xd).as("sx"), sum(xd * xd).as("sxx"))
      val wCum = Window.orderBy($"eday")
        .rowsBetween(Window.unboundedPreceding, 0)
      // S_t is NOT a cumulative sum of per-day doubles: window SUM over
      // doubles combines in engine-internal order (DuckDB trees it, Spark
      // folds sequentially — measured 1e-15 divergence), so instead the
      // prefix sum of x stays EXACT decimal and the drift is subtracted
      // per row: S_t = cum_x - t·(μ ± k) — one identical IEEE tree per
      // row. The running MIN/MAX extrema below are order-independent.
      byDay.crossJoin(broadcast(m))
        .withColumn("mu", $"sx".cast(DoubleType) / $"nd".cast(DoubleType))
        .withColumn("sd",
          sqrt(($"nd" * $"sxx" - $"sx" * $"sx").cast(DoubleType) /
            ($"nd" * ($"nd" - 1)).cast(DoubleType)))
        .withColumn("rn", row_number().over(Window.orderBy($"eday")))
        .withColumn("cum_x", sum(xd).over(wCum))
        .withColumn("s_hi",
          $"cum_x".cast(DoubleType) - $"rn".cast(DoubleType) * ($"mu" + $"sd" / 2))
        .withColumn("s_lo",
          $"cum_x".cast(DoubleType) - $"rn".cast(DoubleType) * ($"mu" - $"sd" / 2))
        // the running extremum must include the EMPTY prefix (S_0 = 0)
        // or the first days' statistic degenerates to 0
        .withColumn("cusum_hi",
          round($"s_hi" - least(lit(0.0), min($"s_hi").over(wCum)), 6))
        .withColumn("cusum_lo",
          round(greatest(lit(0.0), max($"s_lo").over(wCum)) - $"s_lo", 6))
        .select($"eday", $"x",
          $"cusum_hi", $"cusum_lo",
          ($"cusum_hi" > lit(4.0) * $"sd" || $"cusum_lo" > lit(4.0) * $"sd")
            .as("shift_flag"))
        .orderBy($"eday")
    },
    Some("""WITH byday AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS eday,
          COUNT(*) AS x
        FROM events GROUP BY 1),
      m AS (SELECT COUNT(*) AS nd, SUM(x) AS sx, SUM(x * x) AS sxx FROM byday),
      t AS (SELECT eday, CAST(x AS BIGINT) AS x,
          CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE) AS mu,
          SQRT(CAST(nd * sxx - sx * sx AS DOUBLE) /
            CAST(nd * (nd - 1) AS DOUBLE)) AS sd
        FROM byday, m),
      c AS (SELECT eday, x, mu, sd,
          CAST(SUM(x) OVER w AS DOUBLE)
            - CAST(ROW_NUMBER() OVER (ORDER BY eday) AS DOUBLE) * (mu + sd / 2) AS s_hi,
          CAST(SUM(x) OVER w AS DOUBLE)
            - CAST(ROW_NUMBER() OVER (ORDER BY eday) AS DOUBLE) * (mu - sd / 2) AS s_lo
        FROM t WINDOW w AS (ORDER BY eday
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      f AS (SELECT eday, x, sd,
          ROUND(s_hi - LEAST(0.0, MIN(s_hi) OVER (ORDER BY eday
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS cusum_hi,
          ROUND(GREATEST(0.0, MAX(s_lo) OVER (ORDER BY eday
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - s_lo, 6) AS cusum_lo
        FROM c)
      SELECT eday, x, cusum_hi, cusum_lo,
        (cusum_hi > 4.0 * sd OR cusum_lo > 4.0 * sd) AS shift_flag
      FROM f ORDER BY eday""")
  )

  /** Laspeyres / Paasche / Fisher price indices per ship year against
    * the base year, over the parts present in BOTH periods — the
    * price-level report a marketplace runs on its own transaction log.
    * Unit prices quantize to exact integers in 1e-4-dollar units
    * (price-cents × 10000 DIV quantity-cents, floor — hundredths of a
    * cent, NOT 1e-6) BEFORE the weighted sums, so every
    * aggregate is order-independent integer arithmetic (a double unit
    * price would make Σ p·q shuffle-order-dependent and unverifiable);
    * the index ratios are one final IEEE division. Scale: one
    * (year, part) rollup — partial-aggregated — then a year-level join
    * against the broadcast base-year relation. */
  val qPriceIndex = GraftQuery(
    "q_price_index",
    (s, dir) => {
      import s.implicits._
      val yp = Tables.lineitem(s, dir)
        .groupBy(year($"l_shipdate").as("yr"), $"l_partkey")
        .agg(sum(round($"l_extendedprice" * 100).cast("long")
            .cast(DecimalType(38, 0))).as("pc"),
          sum(round($"l_quantity" * 100).cast("long")
            .cast(DecimalType(38, 0))).as("qc"))
        .filter($"qc" > 0)
        .select($"yr", $"l_partkey",
          expr("CAST(pc * 10000 DIV qc AS BIGINT)").as("up"), $"qc")
      val y = graft.operators.Caches.register(yp)
      val base = y.filter($"yr" === 1995)
        .select($"l_partkey", $"up".as("up0"), $"qc".as("qc0"))
      y.filter($"yr" =!= 1995)
        .join(broadcast(base), "l_partkey")
        .groupBy($"yr")
        .agg(count(lit(1)).as("n_parts"),
          sum($"up" * $"qc0").as("l_num"), sum($"up0" * $"qc0").as("l_den"),
          sum($"up" * $"qc").as("p_num"), sum($"up0" * $"qc").as("p_den"))
        .select($"yr", $"n_parts",
          round($"l_num".cast(DoubleType) / $"l_den".cast(DoubleType), 6)
            .as("laspeyres"),
          round($"p_num".cast(DoubleType) / $"p_den".cast(DoubleType), 6)
            .as("paasche"),
          round(sqrt(($"l_num".cast(DoubleType) / $"l_den".cast(DoubleType)) *
            ($"p_num".cast(DoubleType) / $"p_den".cast(DoubleType))), 6)
            .as("fisher"))
        .orderBy($"yr")
    },
    Some("""WITH yp AS (SELECT CAST(YEAR(l_shipdate) AS INT) AS yr, l_partkey,
          SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS pc,
          SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qc
        FROM lineitem GROUP BY 1, 2 HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 0),
      u AS (SELECT yr, l_partkey,
          CAST(pc * 10000 // qc AS BIGINT) AS up, CAST(qc AS BIGINT) AS qc
        FROM yp),
      base AS (SELECT l_partkey, up AS up0, qc AS qc0 FROM u WHERE yr = 1995)
      SELECT u.yr, COUNT(*) AS n_parts,
        ROUND(CAST(SUM(u.up * b.qc0) AS DOUBLE) / CAST(SUM(b.up0 * b.qc0) AS DOUBLE), 6)
          AS laspeyres,
        ROUND(CAST(SUM(u.up * u.qc) AS DOUBLE) / CAST(SUM(b.up0 * u.qc) AS DOUBLE), 6)
          AS paasche,
        ROUND(SQRT((CAST(SUM(u.up * b.qc0) AS DOUBLE) / CAST(SUM(b.up0 * b.qc0) AS DOUBLE)) *
          (CAST(SUM(u.up * u.qc) AS DOUBLE) / CAST(SUM(b.up0 * u.qc) AS DOUBLE))), 6)
          AS fisher
      FROM u JOIN base b ON u.l_partkey = b.l_partkey
      WHERE u.yr <> 1995
      GROUP BY u.yr ORDER BY u.yr""")
  )

  /** Sample AUTOCORRELATION of the hourly event-count series at the
    * operational lags (1 h … 24 h): the periodicity detector behind
    * seasonal modeling — a high r₂₄ says "daily cycle", feeding the
    * (date,hour) design of q_seasonal_baseline. Exact arithmetic
    * throughout: with ȳ = sy/n, both the lag covariance and the
    * variance are multiplied through by n² so every term is an INTEGER
    * (Decimal-widened) — the single double division happens once, at
    * the end, identically in both engines. The series itself is
    * O(hours) rows — bounded at any corpus size — so the lag joins are
    * trivial; the only corpus-sized work is the partial-aggregated
    * hourly count. */
  val qAcf = GraftQuery(
    "q_acf",
    (s, dir) => {
      import s.implicits._
      val series = Tables.events(s, dir)
        .groupBy(date_trunc("hour", $"ts").as("h"))
        .agg(count(lit(1)).as("y"))
        .select(expr("unix_micros(h) div 3600000000").as("t"),
          $"y".cast(DecimalType(38, 0)).as("y"))
      val tot = series.agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum($"y").as("sy"), sum($"y" * $"y").as("syy"))
      val lags = Seq(1L, 2L, 3L, 6L, 12L, 24L).toDF("lag")
      val a = series.select($"t".as("ta"), $"y".as("ya"))
      val b = series.select($"t".as("tb"), $"y".as("yb"))
      lags.crossJoin(a).join(b, $"tb" === $"ta" + $"lag")
        .groupBy($"lag")
        .agg(count(lit(1)).cast(DecimalType(38, 0)).as("np"),
          sum($"ya" * $"yb").as("sab"),
          sum($"ya").as("sha"), sum($"yb").as("shb"))
        .crossJoin(tot)
        // the ȳ² correction counts the JOINED pairs (np), not n − lag:
        // gap hours produce no pair row, and a sparse series with the
        // n − lag substitution would inflate the numerator by
        // (n − lag − np)·ȳ² in both engines at once
        .select($"lag", $"np".cast("long").as("n_pairs"),
          round(
            ($"n" * $"n" * $"sab" - $"n" * $"sy" * ($"sha" + $"shb")
              + $"np" * $"sy" * $"sy").cast(DoubleType) /
            ($"n" * $"n" * $"syy" - $"n" * $"sy" * $"sy").cast(DoubleType), 6)
            .as("acf"))
        .orderBy($"lag")
    },
    Some("""WITH hourly AS (SELECT DATE_TRUNC('hour', ts) AS h, COUNT(*) AS y
        FROM events GROUP BY 1),
      s AS (SELECT epoch_us(h) // 3600000000 AS t, CAST(y AS DECIMAL(38,0)) AS y FROM hourly),
      tot AS (SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
          CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
          CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy FROM s),
      lags AS (SELECT CAST(unnest([1, 2, 3, 6, 12, 24]) AS BIGINT) AS lag),
      p AS (SELECT lag, COUNT(*) AS np,
          CAST(SUM(a.y * b.y) AS DECIMAL(38,0)) AS sab,
          CAST(SUM(a.y) AS DECIMAL(38,0)) AS sha,
          CAST(SUM(b.y) AS DECIMAL(38,0)) AS shb
        FROM lags, s a JOIN s b ON b.t = a.t + lag
        GROUP BY lag)
      SELECT lag, CAST(np AS BIGINT) AS n_pairs,
        ROUND(CAST(n * n * sab - n * sy * (sha + shb) + np * sy * sy AS DOUBLE) /
          CAST(n * n * syy - n * sy * sy AS DOUBLE), 6) AS acf
      FROM p, tot ORDER BY lag""")
  )

  /** Best single CHANGEPOINT in daily revenue by exhaustive binary
    * segmentation: the split date maximizing the between-segment
    * explained sum of squares (SL²/nL + SR²/nR in integer cents, the
    * k=2 step of the classic recursion) — the retrospective companion
    * of q_cusum's sequential detector. All candidate splits come from
    * ONE pass of window cumsums over the DAILY aggregate (O(days) rows
    * at any corpus size); the argmax is a TakeOrdered with a date
    * tie-break. Revenue is fixed-pointed to BIGINT cents before any
    * cumulative math; the score's double division is the same
    * expression tree in both engines. */
  val qChangepoint = GraftQuery(
    "q_changepoint",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.orders(s, dir)
        .groupBy(date_trunc("day", $"o_orderdate").as("d"))
        .agg(sum(($"o_totalprice".cast(DecimalType(18, 2)) * 100)
          .cast(DecimalType(38, 0))).as("cents"))
      val w = Window.orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = daily.agg(count(lit(1)).cast("long").as("n"),
        sum($"cents").as("s"))
      daily
        .withColumn("nl", count(lit(1)).over(w).cast("long"))
        .withColumn("sl", sum($"cents").over(w))
        .crossJoin(tot)
        .filter($"nl" < $"n") // a split needs a non-empty right segment
        .withColumn("nr", $"n" - $"nl")
        .withColumn("sr", $"s" - $"sl")
        .withColumn("score",
          $"sl".cast(DoubleType) * $"sl".cast(DoubleType) / $"nl" +
          $"sr".cast(DoubleType) * $"sr".cast(DoubleType) / $"nr")
        .withColumn("gain",
          $"score" - $"s".cast(DoubleType) * $"s".cast(DoubleType) / $"n")
        .orderBy($"score".desc, $"d")
        .limit(1)
        .select(date_format($"d", "yyyy-MM-dd").as("split_after"),
          $"nl".as("n_left"), $"nr".as("n_right"),
          round($"sl".cast(DoubleType) / $"nl" / 100.0, 6).as("mean_left"),
          round($"sr".cast(DoubleType) / $"nr" / 100.0, 6).as("mean_right"),
          round($"gain" / 10000.0, 6).as("gain_sq"))
    },
    Some("""WITH daily AS (SELECT DATE_TRUNC('day', o_orderdate) AS d,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS cents
        FROM orders GROUP BY 1),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS DECIMAL(38,0)) AS s FROM daily),
      cum AS (SELECT d,
          CAST(COUNT(*) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
          CAST(SUM(cents) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS sl
        FROM daily),
      sc AS (SELECT d, nl, n - nl AS nr, sl, s - sl AS sr,
          CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl +
          CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE) / (n - nl) AS score,
          CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n AS base
        FROM cum, tot WHERE nl < n)
      SELECT STRFTIME(d, '%Y-%m-%d') AS split_after, nl AS n_left, nr AS n_right,
        ROUND(CAST(sl AS DOUBLE) / nl / 100.0, 6) AS mean_left,
        ROUND(CAST(sr AS DOUBLE) / nr / 100.0, 6) AS mean_right,
        ROUND((score - base) / 10000.0, 6) AS gain_sq
      FROM sc ORDER BY score DESC, d LIMIT 1""")
  )

  /** Seasonal-naive FORECAST BACKTEST: predict each hour's event count
    * as the count one week earlier (the baseline every fancier model
    * must beat — and the honest way to quote it is a backtest, not a
    * fit). Evaluated over the final 7 days per event type: MAE and
    * sMAPE, each accumulated as per-term fixed-point INTEGERS (sMAPE
    * terms quantize to ppm before summing — a double mean over hours
    * would be addition-order-dependent). Forecast lookup is a self-join
    * of the (type, hour) aggregate at lag 168 h — series-sized, never
    * corpus-sized. Scoring runs over the FULL (type, hour) grid of the
    * 168-hour window (types × 168 rows — cheap at any corpus size), so
    * a silent hour where the model wrongly predicts activity IS
    * penalized (an actuals-only join would hide every false positive
    * and bias MAE/sMAPE optimistic); the y=0 ∧ fc=0 cell contributes a
    * 0 sMAPE term by the standard convention. */
  val qForecastBacktest = GraftQuery(
    "q_forecast_backtest",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.LongType
      val hourly = Tables.events(s, dir)
        .groupBy($"event_type",
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("t"))
        .agg(count(lit(1)).as("y"))
      val mx = hourly.agg(max($"t").as("mx"))
      val f = hourly.select($"event_type", ($"t" + 168L).as("t"), $"y".as("fc"))
      // full test-window grid: every (type, hour) of the last 168 hours,
      // including hours with zero actual events — see docstring
      val grid = hourly.select($"event_type").distinct()
        .crossJoin(broadcast(mx))
        .select($"event_type", explode(sequence($"mx" - 167L, $"mx")).as("t"))
      grid
        .join(hourly, Seq("event_type", "t"), "left")
        .withColumn("y", coalesce($"y", lit(0L)))
        .join(f, Seq("event_type", "t"), "left")
        .withColumn("fc", coalesce($"fc", lit(0L)))
        .withColumn("abs_err", abs($"y" - $"fc"))
        .withColumn("smape_ppm",
          when($"y" + $"fc" === 0L, lit(0L)).otherwise(
            floor(lit(2000000.0) * $"abs_err" / ($"y" + $"fc") + 0.5).cast(LongType)))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum($"y").cast(LongType).as("actual_events"),
          sum($"fc").cast(LongType).as("forecast_events"),
          (floor(sum($"abs_err") * 1000000.0 / count(lit(1)) + 0.5) / 1000000.0)
            .as("mae"),
          (floor(sum($"smape_ppm").cast("double") / count(lit(1)) + 0.5) / 1000000.0)
            .as("smape"))
        .orderBy($"event_type")
    },
    Some("""WITH hourly AS (SELECT event_type,
          epoch_us(DATE_TRUNC('hour', ts)) // 3600000000 AS t, COUNT(*) AS y
        FROM events GROUP BY 1, 2),
      mx AS (SELECT MAX(t) AS mx FROM hourly),
      grid AS (SELECT et.event_type, mx.mx - 167 + g.x AS t
        FROM (SELECT DISTINCT event_type FROM hourly) et, mx, UNNEST(range(168)) AS g(x)),
      ev AS (SELECT g.event_type, g.t, COALESCE(h.y, 0) AS y,
          COALESCE(f.y, 0) AS fc
        FROM grid g
        LEFT JOIN hourly h ON h.event_type = g.event_type AND h.t = g.t
        LEFT JOIN hourly f ON f.event_type = g.event_type AND f.t = g.t - 168),
      terms AS (SELECT event_type, y, fc, ABS(y - fc) AS abs_err,
          CASE WHEN y + fc = 0 THEN 0
               ELSE CAST(FLOOR(2000000.0 * ABS(y - fc) / (y + fc) + 0.5) AS BIGINT)
          END AS smape_ppm
        FROM ev)
      SELECT event_type, COUNT(*) AS n_hours,
        CAST(SUM(y) AS BIGINT) AS actual_events,
        CAST(SUM(fc) AS BIGINT) AS forecast_events,
        FLOOR(SUM(abs_err) * 1000000.0 / COUNT(*) + 0.5) / 1000000.0 AS mae,
        FLOOR(CAST(SUM(smape_ppm) AS DOUBLE) / COUNT(*) + 0.5) / 1000000.0 AS smape
      FROM terms GROUP BY 1 ORDER BY event_type""")
  )

  /** Shared by the robust-trend pair: the same per-type daily count
    * series q_trend regresses over (x = epoch-day index, y = count). */
  private def dailySeries(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(count(lit(1)).as("y"))
      .select($"event_type",
        datediff($"d", lit("2024-01-01").cast("date")).cast("long").as("x"), $"y")
  }

  private val dailySeriesSql =
    """daily AS (SELECT event_type, DATE_TRUNC('day', ts) AS d, COUNT(*) AS y
      FROM events GROUP BY 1, 2),
      d AS (SELECT event_type,
          CAST(DATEDIFF('day', DATE '2024-01-01', CAST(d AS DATE)) AS BIGINT) AS x, y
        FROM daily)"""

  /** THEIL-SEN robust slope/intercept of the daily series — q_trend's
    * outlier-proof sibling (OLS moves with one bad day; the median of
    * pairwise slopes needs >50% of pairs corrupted). Pair fan-out is
    * days², and days are CALENDAR-bounded, not data-bounded: 10× the
    * events is the same ~580 days per type, so the pair relation does
    * not grow with corpus size. Medians are explicit middle-order
    * statistics (both middles averaged — one commutative 2-term add),
    * never interpolating quantile functions. */
  val qTheilSen = GraftQuery(
    "q_theil_sen",
    (s, dir) => {
      import s.implicits._
      val d = graft.operators.Caches.register(dailySeries(s, dir))
      val p = d.as("a").join(d.as("b"),
          col("a.event_type") === col("b.event_type") && col("a.x") < col("b.x"))
        .select(col("a.event_type").as("event_type"),
          col("a.x").as("ax"), col("b.x").as("bx"),
          ((col("b.y") - col("a.y")).cast(DoubleType) / (col("b.x") - col("a.x")))
            .as("slope"))
      val wp = Window.partitionBy($"event_type")
      val ranked = p
        .withColumn("rn", row_number().over(wp.orderBy($"slope", $"ax", $"bx")))
        .withColumn("np", count(lit(1)).over(wp))
      val sl = ranked
        .filter($"rn" === (($"np" + 1) / 2).cast("long") ||
          $"rn" === (($"np" + 2) / 2).cast("long"))
        .groupBy($"event_type")
        .agg(avg($"slope").as("slope_med"), max($"np").as("n_pairs"))
      val res = d.join(broadcast(sl), "event_type")
        .withColumn("res", $"y" - $"slope_med" * $"x")
      val ranked2 = res
        .withColumn("rn", row_number().over(wp.orderBy($"res", $"x")))
        .withColumn("nd", count(lit(1)).over(wp))
      val ic = ranked2
        .filter($"rn" === (($"nd" + 1) / 2).cast("long") ||
          $"rn" === (($"nd" + 2) / 2).cast("long"))
        .groupBy($"event_type")
        .agg(avg($"res").as("icept"), max($"nd").as("n_days"))
      sl.join(ic, "event_type")
        .select($"event_type", $"n_days", $"n_pairs",
          round($"slope_med", 6).as("slope"), round($"icept", 6).as("intercept"))
        .orderBy($"event_type")
    },
    Some(s"""WITH $dailySeriesSql,
      p AS (SELECT a.event_type, a.x AS ax, b.x AS bx,
          CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
        FROM d a JOIN d b ON a.event_type = b.event_type AND a.x < b.x),
      r AS (SELECT *,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope, ax, bx) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS np
        FROM p),
      sl AS (SELECT event_type, AVG(slope) AS slope_med, MAX(np) AS n_pairs
        FROM r WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2 GROUP BY 1),
      ir AS (SELECT d.event_type, d.x, d.y - sl.slope_med * d.x AS res
        FROM d JOIN sl USING (event_type)),
      ir2 AS (SELECT *,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY res, x) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS nd
        FROM ir),
      ic AS (SELECT event_type, AVG(res) AS icept, MAX(nd) AS n_days
        FROM ir2 WHERE rn = (nd + 1) // 2 OR rn = (nd + 2) // 2 GROUP BY 1)
      SELECT sl.event_type, ic.n_days, sl.n_pairs,
        ROUND(sl.slope_med, 6) AS slope, ROUND(ic.icept, 6) AS intercept
      FROM sl JOIN ic ON sl.event_type = ic.event_type
      ORDER BY sl.event_type""")
  )

  /** MANN-KENDALL trend test on the same daily series: S = Σ sign(yⱼ−yᵢ)
    * over ordered day pairs — a pure INTEGER statistic, with the
    * tie-corrected variance also integer until the single z expression.
    * The nonparametric "is there a monotone trend at all" gate that
    * belongs next to q_theil_sen's "how steep" (the classic pairing).
    * Same calendar-bounded pair relation as q_theil_sen. */
  val qMkTrend = GraftQuery(
    "q_mk_trend",
    (s, dir) => {
      import s.implicits._
      val d = graft.operators.Caches.register(dailySeries(s, dir))
      val pairs = d.as("a").join(d.as("b"),
          col("a.event_type") === col("b.event_type") && col("a.x") < col("b.x"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(signum((col("b.y") - col("a.y")).cast(DoubleType)).cast("long"))
            .as("s_stat"),
          count(lit(1)).as("n_pairs"))
      val nd = d.groupBy($"event_type").agg(count(lit(1)).as("n_days"))
      val ties = d.groupBy($"event_type", $"y").agg(count(lit(1)).as("t"))
        .groupBy($"event_type")
        .agg(sum($"t" * ($"t" - 1L) * (lit(2L) * $"t" + 5L)).as("tie_term"))
      val varS = ($"n_days" * ($"n_days" - 1L) * (lit(2L) * $"n_days" + 5L) -
        $"tie_term").cast(DoubleType) / lit(18.0)
      pairs.join(nd, "event_type").join(ties, "event_type")
        .withColumn("var_s", varS)
        .select($"event_type", $"n_days", $"s_stat",
          round($"var_s", 6).as("var_s"),
          round(
            when($"var_s" <= 0.0, lit(0.0))
              .when($"s_stat" > 0L,
                ($"s_stat" - 1L).cast(DoubleType) / sqrt($"var_s"))
              .when($"s_stat" < 0L,
                ($"s_stat" + 1L).cast(DoubleType) / sqrt($"var_s"))
              .otherwise(lit(0.0)), 6).as("z"))
        .orderBy($"event_type")
    },
    Some(s"""WITH $dailySeriesSql,
      p AS (SELECT a.event_type,
          CAST(SUM(CAST(SIGN(CAST(b.y - a.y AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_stat,
          COUNT(*) AS n_pairs
        FROM d a JOIN d b ON a.event_type = b.event_type AND a.x < b.x
        GROUP BY 1),
      nd AS (SELECT event_type, COUNT(*) AS n_days FROM d GROUP BY 1),
      ties AS (SELECT event_type,
          CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT event_type, y, COUNT(*) AS t FROM d GROUP BY 1, 2) g
        GROUP BY 1),
      m AS (SELECT p.event_type, nd.n_days, p.s_stat,
          CAST(nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5) - ties.tie_term
            AS DOUBLE) / 18.0 AS var_s
        FROM p JOIN nd ON p.event_type = nd.event_type
        JOIN ties ON p.event_type = ties.event_type)
      SELECT event_type, n_days, s_stat, ROUND(var_s, 6) AS var_s,
        ROUND(CASE WHEN var_s <= 0.0 THEN 0.0
          WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / SQRT(var_s)
          WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / SQRT(var_s)
          ELSE 0.0 END, 6) AS z
      FROM m ORDER BY event_type""")
  )

  /** Additive Holt-Winters (triple exponential smoothing, period 24)
    * over the last 96 hours of each event-type series, emitting the
    * next-24-hour forecast — the seasonal upgrade of q_ewma /
    * q_seasonal_baseline. The recurrence runs in EXACT integer
    * micro-units with rational smoothing constants (α=3/10, β=1/20,
    * γ=2/10) and a floored divide per step, so the inherently
    * sequential triple recursion is replayed bit-for-bit: Spark folds
    * each series with one codegen'd higher-order `aggregate` whose
    * seasonal state is a ROTATING 24-slot queue (head = current season
    * slot — no index arithmetic inside the lambda), DuckDB walks the
    * identical 72 steps in a recursive CTE with the same queue. The
    * floored divide is floor(x/10.0) on doubles — safe because |x| stays
    * ≤ ~1e13, where a 1-ulp division error (~1e-3 below the 0.1 step
    * between representable quotients) cannot cross an integer boundary
    * except at exact multiples, which divide exactly.
    * Scale shape: the fact table collapses to a 96-slot zero-filled
    * grid per series BEFORE any sequential work; the fold is per-series
    * map-side work over a 96-element array — one task per series,
    * thousands of series in parallel on a cluster, driver holds
    * nothing. */
  val qHoltWinters = GraftQuery(
    "q_holt_winters",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.LongType
      val hourly = Tables.events(s, dir)
        .groupBy($"event_type",
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("t"))
        .agg(count(lit(1)).as("y"))
      val mx = hourly.agg(max($"t").as("mx"))
      val grid = hourly.select($"event_type").distinct()
        .crossJoin(broadcast(mx))
        .select($"event_type", explode(sequence($"mx" - 95L, $"mx")).as("t"))
        .join(hourly, Seq("event_type", "t"), "left")
        .select($"event_type", $"t", (coalesce($"y", lit(0L)) * 1000000L).as("ym"))
      val series = grid.groupBy($"event_type")
        .agg(transform(sort_array(collect_list(struct($"t", $"ym"))),
          p => p("ym")).as("a"))
      def fdiv(x: Column, d: Double): Column =
        floor(x.cast("double") / d).cast(LongType)
      val l0 = fdiv(aggregate(slice($"a", 1, 24), lit(0L), _ + _), 24.0)
      val s0 = transform(slice($"a", 1, 24), x => x - $"l0")
      val folded = series
        .withColumn("l0", l0)
        .withColumn("st", aggregate(
          slice($"a", 25, 72),
          struct($"l0".as("l"), lit(0L).as("b"), s0.as("s")),
          (st, y) => {
            val sold = element_at(st("s"), 1)
            val lnew = fdiv((y - sold) * 3L + (st("l") + st("b")) * 7L, 10.0)
            val bnew = fdiv((lnew - st("l")) + st("b") * 19L, 20.0)
            val snew = fdiv((y - lnew) * 2L + sold * 8L, 10.0)
            struct(lnew.as("l"), bnew.as("b"),
              concat(slice(st("s"), 2, 23), array(snew)).as("s"))
          }))
      folded
        .select($"event_type", explode(sequence(lit(1L), lit(24L))).as("h"),
          $"st.l".as("l"), $"st.b".as("b"), $"st.s".as("s"))
        .select($"event_type", $"h",
          round(($"l" + $"h" * $"b" + element_at($"s", $"h".cast("int")))
            .cast(DoubleType) / 1000000.0, 6).as("fc"))
        .orderBy($"event_type", $"h")
    },
    Some("""WITH RECURSIVE hourly AS (SELECT event_type,
          epoch_us(DATE_TRUNC('hour', ts)) // 3600000000 AS t, COUNT(*) AS y
        FROM events GROUP BY 1, 2),
      mx AS (SELECT MAX(t) AS mx FROM hourly),
      grid AS (SELECT et.event_type, g.x AS i,
          COALESCE(h.y, 0) * 1000000 AS ym
        FROM (SELECT DISTINCT event_type FROM hourly) et
        CROSS JOIN mx CROSS JOIN UNNEST(range(96)) AS g(x)
        LEFT JOIN hourly h ON h.event_type = et.event_type
          AND h.t = mx.mx - 95 + g.x),
      arrs AS (SELECT event_type, list(ym ORDER BY i) AS a FROM grid GROUP BY 1),
      init AS (SELECT event_type, a,
          CAST(FLOOR(CAST(list_sum(a[1:24]) AS DOUBLE) / 24.0) AS BIGINT) AS l0
        FROM arrs),
      state AS (
        SELECT event_type, a, 24 AS t, l0 AS l, CAST(0 AS BIGINT) AS b,
          list_transform(a[1:24], x -> x - l0) AS s
        FROM init
        UNION ALL
        SELECT event_type, a, t + 1,
          lnew,
          CAST(FLOOR(CAST((lnew - l) + b * 19 AS DOUBLE) / 20.0) AS BIGINT),
          list_concat(s[2:24],
            [CAST(FLOOR(CAST((y - lnew) * 2 + sold * 8 AS DOUBLE) / 10.0) AS BIGINT)])
        FROM (SELECT *,
            CAST(FLOOR(CAST((y - sold) * 3 + (l + b) * 7 AS DOUBLE) / 10.0) AS BIGINT)
              AS lnew
          FROM (SELECT event_type, a, t, l, b, s, a[t + 1] AS y, s[1] AS sold
            FROM state WHERE t < 96))),
      fin AS (SELECT event_type, l, b, s FROM state WHERE t = 96)
      SELECT event_type, CAST(g.h AS BIGINT) AS h,
        ROUND(CAST(l + g.h * b + s[g.h] AS DOUBLE) / 1000000.0, 6) AS fc
      FROM fin CROSS JOIN UNNEST(range(1, 25)) AS g(h)
      ORDER BY event_type, h""")
  )

  /** Seasonality strength per event-type series: the share of hourly
    * variance explained by the hour-of-day profile, 1 − SSW/SST with
    * SSW = Σy² − Σₕ Sₕ²/nₕ (within-hour-of-day) and SST = Σy² − S²/n —
    * the one-number answer to "is this series worth a seasonal model"
    * (and the quantitative justification for q_holt_winters' period-24
    * state). Each Sₕ²/nₕ term is quantized to micro-units independently
    * (24 terms, exact integer inputs), so the variance ratio is a
    * single double division of two integers. Scale shape: two
    * map-side-combined rollups (hourly grid, then 24-slot profile). */
  val qSeasonalityStrength = GraftQuery(
    "q_seasonality_strength",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.LongType
      val hourly = Tables.events(s, dir)
        .groupBy($"event_type",
          expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("t"))
        .agg(count(lit(1)).as("y"))
        .withColumn("h", pmod($"t", lit(24L)))
      val prof = hourly.groupBy($"event_type", $"h")
        .agg(count(lit(1)).as("nh"), sum($"y").as("sh"))
        .select($"event_type",
          floor($"sh".cast(DoubleType) * $"sh" * 1e6 / $"nh" + 0.5)
            .cast(LongType).as("th"))
        .groupBy($"event_type").agg(sum($"th").as("ssb_micro"))
      val tot = hourly.groupBy($"event_type").agg(
          count(lit(1)).as("n"), sum($"y").as("sy"),
          sum($"y" * $"y").as("qy"))
        .select($"event_type", $"n", ($"qy" * 1000000L).as("q_micro"),
          floor($"sy".cast(DoubleType) * $"sy" * 1e6 / $"n" + 0.5)
            .cast(LongType).as("tg_micro"))
      tot.join(prof, "event_type")
        .select($"event_type", $"n".as("n_hours"),
          round(greatest(lit(0.0),
            lit(1.0) - ($"q_micro" - $"ssb_micro").cast(DoubleType) /
              ($"q_micro" - $"tg_micro").cast(DoubleType)), 6)
            .as("seasonality_strength"))
        .orderBy($"event_type")
    },
    Some("""WITH hourly AS (SELECT event_type,
          epoch_us(DATE_TRUNC('hour', ts)) // 3600000000 AS t, COUNT(*) AS y
        FROM events GROUP BY 1, 2),
      hh AS (SELECT event_type, t % 24 AS h, y FROM hourly),
      prof AS (SELECT event_type,
          CAST(SUM(th) AS BIGINT) AS ssb_micro FROM (
            SELECT event_type,
              CAST(FLOOR(CAST(SUM(y) AS DOUBLE) * SUM(y) * 1e6 / COUNT(*) + 0.5)
                AS BIGINT) AS th
            FROM hh GROUP BY event_type, h) GROUP BY 1),
      tot AS (SELECT event_type, COUNT(*) AS n,
          CAST(SUM(y * y) * 1000000 AS BIGINT) AS q_micro,
          CAST(FLOOR(CAST(SUM(y) AS DOUBLE) * SUM(y) * 1e6 / COUNT(*) + 0.5)
            AS BIGINT) AS tg_micro
        FROM hh GROUP BY 1)
      SELECT tot.event_type, tot.n AS n_hours,
        ROUND(GREATEST(0.0,
          1.0 - CAST(tot.q_micro - prof.ssb_micro AS DOUBLE) /
            CAST(tot.q_micro - tot.tg_micro AS DOUBLE)), 6)
          AS seasonality_strength
      FROM tot JOIN prof USING (event_type) ORDER BY event_type""")
  )

  /** SAX (Symbolic Aggregate approXimation, Lin et al. 2003) of each
    * event type's 28-day daily-count series: PAA into seven 4-day
    * segments, z-normalize against the series' own 28-day mean/sd, map
    * to a 4-symbol alphabet at the standard N(0,1) quartile breakpoints
    * (±0.6745, 0) — the index-sized word that makes motif/discord search
    * a string problem. Exactness: every input to the float expressions
    * is an integer count sum (missing days are true zeros via the dense
    * type×segment grid), so mu/sd/paa/z are single identical double
    * trees in both engines and the symbol comparisons bit-match; a
    * zero-variance series degenerates to 'b's by the same guard. Scale
    * shape: one (type, day) partial-aggregated shuffle, then
    * |types|×7-sized work. */
  val qSax = GraftQuery(
    "q_sax",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).select($"event_type", to_date($"ts").as("d"))
      val d0 = ev.agg(min($"d").as("d0"))
      val daily = graft.operators.Caches.register(
        ev.crossJoin(broadcast(d0))
          .select($"event_type", datediff($"d", $"d0").as("day"))
          .filter($"day" >= 0 && $"day" < 28)
          .groupBy($"event_type", $"day").agg(count(lit(1)).as("c")))
      val st = daily.groupBy($"event_type")
        .agg(sum($"c").cast("long").as("sx"), sum($"c" * $"c").cast("long").as("sxx"))
      val grid = st.select($"event_type", $"sx", $"sxx",
        explode(typedLit((0L to 6L).toSeq)).as("seg"))
      val segs = daily.withColumn("seg", ($"day" / 4).cast("long"))
        .groupBy($"event_type", $"seg").agg(sum($"c").cast("long").as("segsum"))
      val z = grid.join(segs, Seq("event_type", "seg"), "left")
        .withColumn("segsum", coalesce($"segsum", lit(0L)))
        .withColumn("mu", $"sx".cast(DoubleType) / 28.0)
        .withColumn("sd", sqrt(($"sxx".cast(DoubleType) -
          $"sx".cast(DoubleType) * $"sx".cast(DoubleType) / 28.0) / 28.0))
        .withColumn("zz", ($"segsum".cast(DoubleType) / 4.0 - $"mu") / $"sd")
        .withColumn("sym",
          when($"sd" === 0.0, "b")
            .when($"zz" < -0.6745, "a")
            .when($"zz" < 0.0, "b")
            .when($"zz" < 0.6745, "c")
            .otherwise("d"))
      z.groupBy($"event_type")
        .agg(expr("array_join(transform(array_sort(collect_list(struct(seg, sym))), x -> x.sym), '')")
            .as("sax_word"),
          max($"sx").as("n_events"),
          round(max($"mu"), 6).as("mean_daily"),
          round(max($"sd"), 6).as("sd_daily"))
        .orderBy($"event_type")
    },
    Some("""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS d FROM events),
      d0 AS (SELECT MIN(d) AS d0 FROM ev),
      daily AS (SELECT event_type, date_diff('day', d0, d) AS day, COUNT(*) AS c
        FROM ev, d0 WHERE date_diff('day', d0, d) >= 0 AND date_diff('day', d0, d) < 28
        GROUP BY 1, 2),
      st AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS sx,
          CAST(SUM(c * c) AS BIGINT) AS sxx FROM daily GROUP BY 1),
      grid AS (SELECT event_type, sx, sxx, CAST(g.seg AS BIGINT) AS seg
        FROM st CROSS JOIN (SELECT UNNEST([0, 1, 2, 3, 4, 5, 6]) AS seg) g),
      segs AS (SELECT event_type, CAST(day // 4 AS BIGINT) AS seg,
          CAST(SUM(c) AS BIGINT) AS segsum FROM daily GROUP BY 1, 2),
      z AS (SELECT grid.event_type, grid.seg, grid.sx,
          COALESCE(segs.segsum, 0) AS segsum,
          CAST(grid.sx AS DOUBLE) / 28.0 AS mu,
          SQRT((CAST(grid.sxx AS DOUBLE) -
            CAST(grid.sx AS DOUBLE) * CAST(grid.sx AS DOUBLE) / 28.0) / 28.0) AS sd
        FROM grid LEFT JOIN segs
          ON segs.event_type = grid.event_type AND segs.seg = grid.seg),
      sym AS (SELECT event_type, seg, sx, mu, sd,
          CASE WHEN sd = 0.0 THEN 'b'
               WHEN (CAST(segsum AS DOUBLE) / 4.0 - mu) / sd < -0.6745 THEN 'a'
               WHEN (CAST(segsum AS DOUBLE) / 4.0 - mu) / sd < 0.0 THEN 'b'
               WHEN (CAST(segsum AS DOUBLE) / 4.0 - mu) / sd < 0.6745 THEN 'c'
               ELSE 'd' END AS sym
        FROM z)
      SELECT event_type, string_agg(sym, '' ORDER BY seg) AS sax_word,
        MAX(sx) AS n_events, ROUND(MAX(mu), 6) AS mean_daily,
        ROUND(MAX(sd), 6) AS sd_daily
      FROM sym GROUP BY 1 ORDER BY event_type""")
  )

  /** Viterbi decoding of a 2-state HMM over each event type's 28-day
    * daily-count series: high/low activity regimes with Poisson-rate
    * emissions (λ = 1.5μ / 0.5μ from the series' own mean; the
    * state-independent ln(c!) term cancels in every comparison) and a
    * 0.8-stay / 0.2-switch transition matrix whose log weights ride as
    * PRE-QUANTIZED ppm integer literals in BOTH engines. Emission
    * weights are integer-portable too: since every path consumes every
    * day exactly once, the state-independent c·ln(μ) term cancels in
    * all comparisons, leaving eh = c·L15 − q(1.5μ) and
    * el = c·L05 − q(0.5μ) with L15 = ⌊ln(1.5)·10⁶+½⌋ = 405465 and
    * L05 = ⌊ln(0.5)·10⁶+½⌋ = −693147 as integer LITERALS (like LS/LW)
    * and q(x) = ⌊x·10⁶+½⌋ built from IEEE-exact ×/÷ only — no runtime
    * libm call anywhere, so both engines fold identical integers. The
    * reported log_prob is therefore the NORMALIZED score (the true
    * log-likelihood minus the path-invariant Σc·ln(μ) + Σln(c!)
    * constants). The whole max-product recursion is ONE higher-order
    * aggregate fold over the day-sorted array — integer adds,
    * string-append backpointers, prefer-H tie-break — so it stays in
    * codegen (no UDF, no driver loop) and DuckDB's list_reduce replays
    * it bit for bit. The uniform pseudo-transition the fold applies
    * before day 0 adds the same constant to both states and cancels.
    * Scale shape: one (type, day) rollup; the fold runs on 28-element
    * arrays per type. */
  val qHmmRegimes = GraftQuery(
    "q_hmm_regimes",
    (s, dir) => {
      import s.implicits._
      val LS = math.floor(math.log(0.8) * 1e6 + 0.5).toLong // -223144
      val LW = math.floor(math.log(0.2) * 1e6 + 0.5).toLong // -1609438
      val L15 = math.floor(math.log(1.5) * 1e6 + 0.5).toLong // 405465
      val L05 = math.floor(math.log(0.5) * 1e6 + 0.5).toLong // -693147
      val ev = Tables.events(s, dir).select($"event_type", to_date($"ts").as("d"))
      val d0 = ev.agg(min($"d").as("d0"))
      val daily = ev.crossJoin(broadcast(d0))
        .select($"event_type", datediff($"d", $"d0").as("day"))
        .filter($"day" >= 0 && $"day" < 28)
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("c"))
      val st = daily.groupBy($"event_type").agg(sum($"c").cast("long").as("sx"))
      val grid = st.select($"event_type", $"sx",
        explode(typedLit((0L to 27L).toSeq)).as("day"))
      val em = grid.join(daily, Seq("event_type", "day"), "left")
        .withColumn("c", coalesce($"c", lit(0L)))
        .withColumn("mu", $"sx".cast(DoubleType) / 28.0)
        .withColumn("eh", ($"c" * lit(L15) -
          floor(lit(1.5) * $"mu" * 1000000.0 + 0.5).cast("long")))
        .withColumn("el", ($"c" * lit(L05) -
          floor(lit(0.5) * $"mu" * 1000000.0 + 0.5).cast("long")))
      em.groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"day", $"eh", $"el"))).as("arr"))
        .withColumn("st", expr(
          s"""aggregate(arr,
            named_struct('vh', CAST(0 AS BIGINT), 'vl', CAST(0 AS BIGINT),
                         'ph', '', 'pl', ''),
            (acc, x) -> named_struct(
              'vh', greatest(acc.vh + $LS, acc.vl + $LW) + x.eh,
              'vl', greatest(acc.vl + $LS, acc.vh + $LW) + x.el,
              'ph', CASE WHEN acc.vh + $LS >= acc.vl + $LW
                    THEN concat(acc.ph, 'H') ELSE concat(acc.pl, 'H') END,
              'pl', CASE WHEN acc.vl + $LS >= acc.vh + $LW
                    THEN concat(acc.pl, 'L') ELSE concat(acc.ph, 'L') END))"""))
        .select($"event_type",
          when($"st.vh" >= $"st.vl", $"st.ph").otherwise($"st.pl").as("regime"),
          (length(when($"st.vh" >= $"st.vl", $"st.ph").otherwise($"st.pl")) -
            length(regexp_replace(
              when($"st.vh" >= $"st.vl", $"st.ph").otherwise($"st.pl"), "H", "")))
            .cast("long").as("n_high_days"),
          round(greatest($"st.vh", $"st.vl") / 1000000.0, 6).as("log_prob"))
        .orderBy($"event_type")
    },
    // NOTE: the oracle replays the Viterbi recursion as WITH RECURSIVE, not
    // list_reduce — DuckDB 1.0.0's list_reduce evaluates multi-field struct
    // lambdas with inconsistent cross-field references (a field expression can
    // observe an already-updated sibling of the same step), which silently
    // corrupts the backpointer strings. A recursive CTE reads every column
    // from the PRIOR iteration's row, which is the semantics the Spark-side
    // `aggregate` fold has.
    Some(s"""WITH RECURSIVE ev AS (SELECT event_type, CAST(ts AS DATE) AS d FROM events),
      d0 AS (SELECT MIN(d) AS d0 FROM ev),
      daily AS (SELECT event_type, date_diff('day', d0, d) AS day, COUNT(*) AS c
        FROM ev, d0 WHERE date_diff('day', d0, d) >= 0 AND date_diff('day', d0, d) < 28
        GROUP BY 1, 2),
      stt AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS sx FROM daily GROUP BY 1),
      grid AS (SELECT event_type, sx, CAST(g.day AS BIGINT) AS day
        FROM stt CROSS JOIN (SELECT UNNEST(range(28)) AS day) g),
      em AS (SELECT grid.event_type, grid.day,
          CAST(COALESCE(daily.c, 0) AS BIGINT) AS c,
          CAST(grid.sx AS DOUBLE) / 28.0 AS mu
        FROM grid LEFT JOIN daily
          ON daily.event_type = grid.event_type AND daily.day = grid.day),
      emq AS (SELECT event_type, day,
          c * 405465 - CAST(FLOOR(1.5 * mu * 1000000.0 + 0.5) AS BIGINT) AS eh,
          c * (-693147) - CAST(FLOOR(0.5 * mu * 1000000.0 + 0.5) AS BIGINT) AS el
        FROM em),
      step AS (
        SELECT event_type, CAST(-1 AS BIGINT) AS day, CAST(0 AS BIGINT) AS vh,
               CAST(0 AS BIGINT) AS vl, '' AS ph, '' AS pl
        FROM (SELECT DISTINCT event_type FROM emq)
        UNION ALL
        SELECT e.event_type, e.day,
          GREATEST(s.vh + (-223144), s.vl + (-1609438)) + e.eh,
          GREATEST(s.vl + (-223144), s.vh + (-1609438)) + e.el,
          CASE WHEN s.vh + (-223144) >= s.vl + (-1609438)
               THEN s.ph || 'H' ELSE s.pl || 'H' END,
          CASE WHEN s.vl + (-223144) >= s.vh + (-1609438)
               THEN s.pl || 'L' ELSE s.ph || 'L' END
        FROM step s JOIN emq e
          ON e.event_type = s.event_type AND e.day = s.day + 1)
      SELECT event_type,
        CASE WHEN vh >= vl THEN ph ELSE pl END AS regime,
        CAST(length(CASE WHEN vh >= vl THEN ph ELSE pl END) -
          length(replace(CASE WHEN vh >= vl THEN ph ELSE pl END, 'H', ''))
          AS BIGINT) AS n_high_days,
        ROUND(GREATEST(vh, vl) / 1000000.0, 6) AS log_prob
      FROM step WHERE day = 27 ORDER BY event_type""")
  )

  /** Classical additive seasonal-trend decomposition of the hourly
    * event-count series (the moving-average core of Cleveland's STL,
    * one pass instead of the loess loop): trend = centered 25-hour
    * moving sum, seasonal = per hour-of-day mean of the detrended
    * series, remainder = what's left. The edge hours without a full
    * ±12 window are trimmed, which leaves EXACTLY 27 observations per
    * hour-of-day slot — so every component is an integer numerator
    * over a FIXED denominator (trend×25, seasonal×675, remainder×675)
    * and both engines divide identical integers once at the end;
    * no running float anywhere.
    *
    * Scale: one (hour-index) rollup of the fact table is the only
    * corpus-sized work; the decomposition runs on the 672-row dense
    * grid (a deliberately single-partition window over a calendar-
    * bounded panel — at any SF it is 672 rows). */
  val qStlDecompose = GraftQuery(
    "q_stl_decompose",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).select(expr("unix_micros(ts)").as("us"))
      val m0 = ev.agg(min($"us").as("us0"))
      val hc = ev.crossJoin(broadcast(m0))
        .select(expr("(us - us0) DIV 3600000000").as("h"))
        .filter($"h" >= 0 && $"h" < 672)
        .groupBy($"h").agg(count(lit(1)).as("c"))
      val grid = s.range(672).select($"id".as("h"))
      val full = grid.join(hc, Seq("h"), "left")
        .withColumn("c", coalesce($"c", lit(0L)))
      val wtr = Window.orderBy($"h").rowsBetween(-12, 12)
      val kept = full.withColumn("trend25", sum($"c").over(wtr))
        .filter($"h" >= 12 && $"h" <= 659)
        .withColumn("slot", $"h" % 24)
        .withColumn("d25", lit(25L) * $"c" - $"trend25")
      val se = kept.groupBy($"slot").agg(sum($"d25").as("s675"))
      kept.join(broadcast(se), "slot")
        .select($"h", $"c",
          round($"trend25" / 25.0, 6).as("trend"),
          round($"s675" / 675.0, 6).as("seasonal"),
          round((lit(675L) * $"c" - lit(27L) * $"trend25" - $"s675") / 675.0, 6)
            .as("remainder"))
        .orderBy($"h")
    },
    Some("""WITH ev AS (SELECT epoch_us(ts) AS us FROM events),
      m0 AS (SELECT MIN(us) AS us0 FROM ev),
      hc AS (SELECT (us - us0) // 3600000000 AS h, COUNT(*) AS c
        FROM ev, m0
        WHERE (us - us0) // 3600000000 >= 0 AND (us - us0) // 3600000000 < 672
        GROUP BY 1),
      grid AS (SELECT CAST(UNNEST(range(672)) AS BIGINT) AS h),
      f AS (SELECT grid.h, CAST(COALESCE(hc.c, 0) AS BIGINT) AS c
        FROM grid LEFT JOIN hc USING (h)),
      tr AS (SELECT h, c, CAST(SUM(c) OVER (ORDER BY h
          ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT) AS trend25
        FROM f),
      kept AS (SELECT h, c, trend25, h % 24 AS slot, 25 * c - trend25 AS d25
        FROM tr WHERE h BETWEEN 12 AND 659),
      se AS (SELECT slot, CAST(SUM(d25) AS BIGINT) AS s675 FROM kept GROUP BY 1)
      SELECT k.h, k.c, ROUND(k.trend25 / 25.0, 6) AS trend,
        ROUND(se.s675 / 675.0, 6) AS seasonal,
        ROUND((675 * k.c - 27 * k.trend25 - se.s675) / 675.0, 6) AS remainder
      FROM kept k JOIN se USING (slot) ORDER BY k.h""")
  )

  /** Burstiness panel per event type over the 28-day daily-count
    * series: the index of dispersion (Fano factor, sample-variance /
    * mean — 1 for a Poisson process, > 1 for bursty arrivals) plus the
    * peak-to-mean ratio. Everything is exact integer moments (n·Σc² −
    * S² over n(n−1), cross-multiplied against S/n) with ONE double
    * divide per column at the end — the q_stats discipline applied to
    * the arrival-process diagnosis that decides whether a stream needs
    * burst-capacity headroom. Scale: one (type, day) rollup; the panel
    * is |types| rows. */
  val qBurstiness = GraftQuery(
    "q_burstiness",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          expr("unix_micros(ts) DIV 86400000000").as("eday"))
        .agg(count(lit(1)).as("c"))
      daily.groupBy($"event_type").agg(
          count(lit(1)).as("n_days"),
          sum($"c").as("s1"),
          sum($"c" * $"c").as("s2"),
          max($"c").as("peak"))
        .select($"event_type", $"n_days", $"s1".as("n_events"), $"peak",
          // fano = ((n*s2 - s1^2)/(n*(n-1))) / (s1/n) = (n*s2 - s1^2) / ((n-1) * s1)
          round(($"n_days" * $"s2" - $"s1" * $"s1").cast(DoubleType) /
            (($"n_days" - 1) * $"s1").cast(DoubleType), 6).as("fano"),
          round(($"peak" * $"n_days").cast(DoubleType) / $"s1".cast(DoubleType), 6)
            .as("peak_to_mean"))
        .orderBy($"event_type")
    },
    Some("""WITH daily AS (SELECT event_type,
        CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS eday, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, COUNT(*) AS n_days,
        CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2,
        CAST(MAX(c) AS BIGINT) AS peak
      FROM daily GROUP BY 1)
      SELECT event_type, n_days, s1 AS n_events, peak,
        ROUND(CAST(n_days * s2 - s1 * s1 AS DOUBLE) /
          CAST((n_days - 1) * s1 AS DOUBLE), 6) AS fano,
        ROUND(CAST(peak * n_days AS DOUBLE) / CAST(s1 AS DOUBLE), 6)
          AS peak_to_mean
      FROM m ORDER BY event_type""")
  )

  /** Hill tail-index estimator on the purchase-value distribution
    * (Hill 1975): over the top k = 200 order statistics against the
    * 201st as reference, Ĥ = (1/k)·Σ ln(x_i/x_ref) and α̂ = 1/Ĥ — the
    * heavy-tail diagnosis (α ≤ 2 ⇒ infinite variance ⇒ mean-based
    * monitoring misleads) behind every revenue-metric alerting choice.
    * Each ln term is a rational of integer cents cast to
    * DECIMAL(18,12) before the exact sum (the q_mutual_info
    * discipline). Accepted residual risk: the ln() itself is runtime
    * libm on a data-dependent ratio, so a JVM-vs-DuckDB ulp
    * difference at a quantization boundary could flip the 12th
    * decimal of one term — tolerated because the final ROUND(·,6)
    * absorbs anything smaller than 5e-7 and the 200-term sum is
    * exact decimal past that point. The top-(k+1) extraction is orderBy+limit — a
    * distributed TakeOrdered, never a global window sort; ranking then
    * runs on the 201-row result. */
  val qHillTail = GraftQuery(
    "q_hill_tail",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{DecimalType, LongType}
      val vals = Tables.events(s, dir)
        .filter($"event_type" === "purchase")
        .select(($"value".cast(DecimalType(18, 2)) * 100).cast(LongType).as("v"),
          $"event_id")
        .filter($"v" > 0)
      val top = vals.orderBy($"v".desc, $"event_id").limit(201)
      val ranked = top.withColumn("rn",
        row_number().over(Window.orderBy($"v".desc, $"event_id")))
      val ref = ranked.filter($"rn" === 201).select($"v".as("vref"))
      ranked.filter($"rn" <= 200).crossJoin(broadcast(ref))
        .agg(count(lit(1)).as("k"),
          max($"vref").as("vref"),
          sum(log($"v".cast(DoubleType) / $"vref".cast(DoubleType))
            .cast(DecimalType(18, 12))).as("sq"))
        .select($"k", $"vref".as("x_ref_cents"),
          round($"sq".cast(DoubleType) / 200.0, 6).as("hill"),
          round(lit(200.0) / $"sq".cast(DoubleType), 6).as("alpha"))
    },
    Some("""WITH vals AS (SELECT
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v, event_id
      FROM events WHERE event_type = 'purchase'
        AND CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0),
      top AS (SELECT v, event_id FROM vals ORDER BY v DESC, event_id LIMIT 201),
      ranked AS (SELECT v,
          ROW_NUMBER() OVER (ORDER BY v DESC, event_id) AS rn FROM top),
      ref AS (SELECT v AS vref FROM ranked WHERE rn = 201)
      SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(vref) AS x_ref_cents,
        ROUND(CAST(SUM(CAST(LN(CAST(v AS DOUBLE) / CAST(vref AS DOUBLE))
          AS DECIMAL(18,12))) AS DOUBLE) / 200.0, 6) AS hill,
        ROUND(200.0 / CAST(SUM(CAST(LN(CAST(v AS DOUBLE) / CAST(vref AS DOUBLE))
          AS DECIMAL(18,12))) AS DOUBLE), 6) AS alpha
      FROM ranked, ref WHERE rn <= 200""")
  )

  /** Cross-correlation panel between event-type daily-count series at
    * lags −7..7 (lead-lag discovery: does signup volume lead purchase
    * volume, and by how many days?): for every ordered type pair and
    * lag, Pearson r over the overlapping days, all five moments summed
    * as exact integers with ONE double expression per (pair, lag) cell
    * at the end. Scale: one (type, day) rollup; the lag fan-out and
    * the moment algebra run on the |types|²·15-cell panel, never the
    * fact table. */
  val qXcorr = GraftQuery(
    "q_xcorr",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          expr("unix_micros(ts) DIV 86400000000").as("aday"))
        .agg(count(lit(1)).as("c"))
      val d0 = daily.agg(min($"aday").as("d0"))
      val norm = daily.crossJoin(broadcast(d0))
        .select($"event_type", ($"aday" - $"d0").as("day"), $"c")
        .filter($"day" >= 0 && $"day" < 28)
      val a = norm.select($"event_type".as("ta"), $"day".as("da"), $"c".as("ca"))
        .withColumn("lag", explode(typedLit((-7 to 7).toList)))
      val b = norm.select($"event_type".as("tb"), $"day".as("db"), $"c".as("cb"))
      a.join(b, $"ta" < $"tb" && $"db" === $"da" + $"lag")
        .groupBy($"ta", $"tb", $"lag")
        .agg(count(lit(1)).as("n"),
          sum($"ca").as("sx"), sum($"cb").as("sy"),
          sum($"ca" * $"ca").as("sxx"), sum($"cb" * $"cb").as("syy"),
          sum($"ca" * $"cb").as("sxy"))
        // degenerate slices (a constant series in the overlap) have no
        // defined correlation — dropped identically in both engines
        .filter($"n" * $"sxx" - $"sx" * $"sx" > 0 &&
                $"n" * $"syy" - $"sy" * $"sy" > 0)
        .select($"ta".as("type_a"), $"tb".as("type_b"),
          $"lag".cast("long").as("lag"), $"n".as("n_days"),
          round(($"n" * $"sxy" - $"sx" * $"sy").cast(DoubleType) /
            sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast(DoubleType) *
                 ($"n" * $"syy" - $"sy" * $"sy").cast(DoubleType)), 6)
            .as("xcorr"))
        .orderBy($"type_a", $"type_b", $"lag")
    },
    Some("""WITH daily AS (SELECT event_type,
        CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS aday, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
      d0 AS (SELECT MIN(aday) AS d0 FROM daily),
      norm AS (SELECT event_type, aday - d0 AS day, CAST(c AS BIGINT) AS c
        FROM daily, d0 WHERE aday - d0 >= 0 AND aday - d0 < 28),
      lags AS (SELECT CAST(UNNEST(range(-7, 8)) AS BIGINT) AS lag),
      j AS (SELECT a.event_type AS ta, b.event_type AS tb, l.lag,
          a.c AS ca, b.c AS cb
        FROM norm a JOIN lags l ON TRUE
        JOIN norm b ON a.event_type < b.event_type AND b.day = a.day + l.lag),
      m AS (SELECT ta, tb, lag, COUNT(*) AS n,
          CAST(SUM(ca) AS BIGINT) AS sx, CAST(SUM(cb) AS BIGINT) AS sy,
          CAST(SUM(ca * ca) AS BIGINT) AS sxx,
          CAST(SUM(cb * cb) AS BIGINT) AS syy,
          CAST(SUM(ca * cb) AS BIGINT) AS sxy
        FROM j GROUP BY 1, 2, 3)
      SELECT ta AS type_a, tb AS type_b, lag, n AS n_days,
        ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
          SQRT(CAST(n * sxx - sx * sx AS DOUBLE) *
               CAST(n * syy - sy * sy AS DOUBLE)), 6) AS xcorr
      FROM m
      WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      ORDER BY type_a, type_b, lag""")
  )

  val all: Seq[GraftQuery] =
    Seq(qGapFill, qZscoreOutliers, qRolling7d, qEwma, qTrend, qMad, qDriftPsi,
      qSeasonalBaseline, qCusum, qPriceIndex, qAcf, qChangepoint,
      qForecastBacktest, qTheilSen, qMkTrend, qHoltWinters,
      qSeasonalityStrength, qSax, qHmmRegimes, qStlDecompose, qBurstiness,
      qHillTail, qXcorr)
}
