package graft.analytics

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** The reference's aggregation / filter / sort / join surface (SURVEY.md §2)
  * re-expressed over the driver's star schema, one named query per operator.
  *
  * Every aggregation keeps partial (map-side) aggregation: plain
  * groupBy/agg with codegen'd built-in functions, no UDFs. Joins against
  * the small dimensions (customer/supplier/nation/region) are explicitly
  * broadcast — at 100 TB those stay O(dim) per executor while the fact
  * table streams through without a shuffle.
  */
object StarQueries {

  import Agg.{avgDec, sumDec}

  // ---------------------------------------------------------------- A1-A9

  /** TPC-H Q1-shaped pricing summary: the reference's KPI block
    * (analysis.py:211-217 / views.py:141-157 shape) over lineitem.
    * Grouped full-scan aggregate → partial agg + single shuffle on the
    * (tiny-cardinality) group key. */
  val q1PricingSummary = GraftQuery(
    "q1_pricing_summary",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sumDec($"l_quantity").as("sum_qty"),
          sumDec($"l_extendedprice").as("sum_base_price"),
          Agg.revenueDec($"l_extendedprice", $"l_discount").as("sum_disc_price"),
          avgDec($"l_quantity").as("avg_qty"),
          avgDec($"l_extendedprice").as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      COUNT(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")
  )

  /** Whole-table KPI row (A1 count, A2 exact count-distinct, A3 exact
    * median, A4 mean, A5 min/max — views.py:141-157). At 100 TB the
    * count-distincts would switch to approx_count_distinct; the exact
    * variants are kept here because the reference's KPIs are exact. */
  val qSummaryKpis = GraftQuery(
    "q_summary_kpis",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir).agg(
        count(lit(1)).as("total_orders"),
        countDistinct($"o_custkey").as("unique_customers"),
        countDistinct($"o_orderstatus").as("unique_statuses"),
        round(graft.expressions.ExactQuantiles.quantile($"o_totalprice", 0.5), 4)
          .as("median_price"),
        avgDec($"o_totalprice").as("avg_price"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"))
    },
    Some("""SELECT COUNT(*) AS total_orders,
      COUNT(DISTINCT o_custkey) AS unique_customers,
      COUNT(DISTINCT o_orderstatus) AS unique_statuses,
      ROUND(MEDIAN(o_totalprice), 4) AS median_price,
      ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      MIN(o_totalprice) AS min_price,
      MAX(o_totalprice) AS max_price
      FROM orders""")
  )

  /** A7 group-by mean (avg price per keyword ≡ avg totalprice per
    * priority, analysis.py:256-257). */
  val qGroupMean = GraftQuery(
    "q_group_mean",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), avgDec($"o_totalprice").as("avg_totalprice"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
      ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_totalprice
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** A8/A9 value counts + top-N (analysis.py:281,302; views.py:167). */
  val qValueCounts = GraftQuery(
    "q_value_counts",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"event_type")
        .limit(10)
    },
    Some("""SELECT event_type, COUNT(*) AS n FROM events
      GROUP BY event_type ORDER BY n DESC, event_type LIMIT 10""")
  )

  /** A10 top-N + "Others" rollup (donut chart, analysis.py:302-310):
    * rank groups, keep top-5 labels, fold the tail into 'Others'. */
  val qTopnOthers = GraftQuery(
    "q_topn_others",
    (s, dir) => {
      import s.implicits._
      val counts = Tables.part(s, dir).groupBy($"p_brand").agg(count(lit(1)).as("n"))
      val ranked = counts.withColumn("rk",
        row_number().over(Window.orderBy($"n".desc, $"p_brand")))
      ranked
        .withColumn("label", when($"rk" <= 5, $"p_brand").otherwise(lit("Others")))
        .groupBy($"label").agg(sum($"n").cast(LongType).as("n"))
        .orderBy($"n".desc, $"label")
    },
    Some("""WITH c AS (SELECT p_brand, COUNT(*) AS n FROM part GROUP BY p_brand),
      r AS (SELECT p_brand, n, ROW_NUMBER() OVER (ORDER BY n DESC, p_brand) AS rk FROM c)
      SELECT CASE WHEN rk <= 5 THEN p_brand ELSE 'Others' END AS label,
             CAST(SUM(n) AS BIGINT) AS n
      FROM r GROUP BY 1 ORDER BY n DESC, label""")
  )

  /** A11 exact quantiles (etl.py:210-214 IQR, analysis.py:339 p99).
    * graft's ExactQuantiles aggregate (interpolating, same definition as
    * DuckDB quantile_cont / Spark `percentile`, primitive-array state —
    * ~4x the built-in) for oracle parity; at 100 TB swap to
    * percentile_approx — single-pass sketch, no sort. */
  val qQuantiles = GraftQuery(
    "q_quantiles",
    (s, dir) => {
      // ONE quantile aggregate for all four points (one sort, not four)
      Tables.lineitem(s, dir)
        .agg(graft.expressions.ExactQuantiles.quantiles(
          col("l_extendedprice"), Seq(0.25, 0.5, 0.75, 0.99)).as("qs"))
        .select(
          round(element_at(col("qs"), 1), 6).as("q1"),
          round(element_at(col("qs"), 2), 6).as("q2"),
          round(element_at(col("qs"), 3), 6).as("q3"),
          round(element_at(col("qs"), 4), 6).as("p99"))
    },
    Some("""SELECT ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6) AS q1,
      ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS q2,
      ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 6) AS q3,
      ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 6) AS p99
      FROM lineitem""")
  )

  /** A12 equi-width histogram (analysis.py:343; views.py:222-224):
    * min/max in one pass, bucket + count in a second — two jobs, no
    * collect of data rows; the 1-row bounds DF is broadcast. */
  val qHistogram = GraftQuery(
    "q_histogram",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val bounds = li.agg(min($"l_extendedprice").as("mn"), max($"l_extendedprice").as("mx"))
      // greatest(width, tiny) guards mx == mn (degenerate single-bucket
      // input) — mirrored EXACTLY in the oracle SQL so hashes still match
      li.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          least(floor(($"l_extendedprice" - $"mn") /
            greatest(($"mx" - $"mn") / 12, lit(1e-12))), lit(11L))
            .cast(LongType))
        .groupBy($"bucket").agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    },
    Some("""WITH b AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx FROM lineitem)
      SELECT CAST(LEAST(FLOOR((l_extendedprice - mn) / GREATEST((mx - mn) / 12, 1e-12)), 11) AS BIGINT) AS bucket,
             COUNT(*) AS n
      FROM lineitem, b GROUP BY 1 ORDER BY bucket""")
  )

  /** Equi-DEPTH histogram (the complement of q_histogram's equi-width):
    * bucket boundaries are the 1/8..7/8 quantiles — one fused
    * ExactQuantiles aggregate, one sort — broadcast back as a 1-row
    * relation; assignment is a map-side fold over the 7 boundaries
    * (bucket = #boundaries strictly below the value, ties DOWN), then a
    * ≤8-key rollup. Near-equal bucket counts are the self-certificate,
    * visible in the result. At 100 TB swap the exact boundary aggregate
    * for percentile_approx — the q_approx_quantiles rel_err columns are
    * the evidence that swap is safe. */
  val qEquidepthHist = GraftQuery(
    "q_equidepth_hist",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val bounds = li.agg(graft.expressions.ExactQuantiles.quantiles(
        $"l_extendedprice", (1 to 7).map(_ / 8.0)).as("bs"))
      li.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          aggregate($"bs", lit(0),
            (acc, b) => acc + when($"l_extendedprice".cast("double") > b, 1).otherwise(0))
            .cast(LongType))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          min($"l_extendedprice").as("lo"), max($"l_extendedprice").as("hi"))
        .orderBy($"bucket")
    },
    Some("""WITH b AS (SELECT [QUANTILE_CONT(l_extendedprice, 0.125),
        QUANTILE_CONT(l_extendedprice, 0.25), QUANTILE_CONT(l_extendedprice, 0.375),
        QUANTILE_CONT(l_extendedprice, 0.5), QUANTILE_CONT(l_extendedprice, 0.625),
        QUANTILE_CONT(l_extendedprice, 0.75), QUANTILE_CONT(l_extendedprice, 0.875)] AS bs
      FROM lineitem)
      SELECT CAST(len(list_filter(bs, x -> l_extendedprice > x)) AS BIGINT) AS bucket,
        COUNT(*) AS n, MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem, b GROUP BY 1 ORDER BY bucket""")
  )

  /** Benford leading-digit audit on order totals — the fraud/garbage
    * screen for any money column: observed first-digit shares vs the
    * Benford expectation ln(1+1/d)/ln(10), with each digit's chi-square
    * contribution. One map-side digit extraction + a 9-key rollup;
    * n broadcasts back as a 1-row relation. (TPC-H prices are uniform-ish,
    * so this corpus legitimately FAILS Benford — large chi2 is the
    * correct output here, which is exactly what makes it a useful
    * screen: conformity is a property of the data, the query only
    * measures it.) */
  val qBenford = GraftQuery(
    "q_benford",
    (s, dir) => {
      import s.implicits._
      val digits = Tables.orders(s, dir)
        .filter($"o_totalprice" > 0)
        .select(substring(floor($"o_totalprice").cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
      val n = digits.agg(count(lit(1)).as("total"))
      digits.groupBy($"digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(n))
        .withColumn("obs_share", $"n".cast("double") / $"total")
        .withColumn("exp_share", log(lit(1.0) + lit(1.0) / $"digit") / log(lit(10.0)))
        .select($"digit", $"n",
          round($"obs_share", 6).as("obs_share"),
          round($"exp_share", 6).as("exp_share"),
          round(($"obs_share" - $"exp_share") * ($"obs_share" - $"exp_share") /
            $"exp_share" * $"total", 6).as("chi2_contrib"))
        .orderBy($"digit")
    },
    Some("""WITH d AS (SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice > 0),
      t AS (SELECT COUNT(*) AS total FROM d),
      g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit)
      SELECT digit, n,
        ROUND(CAST(n AS DOUBLE) / total, 6) AS obs_share,
        ROUND(LN(1.0 + 1.0 / digit) / LN(10.0), 6) AS exp_share,
        ROUND((CAST(n AS DOUBLE) / total - LN(1.0 + 1.0 / digit) / LN(10.0))
          * (CAST(n AS DOUBLE) / total - LN(1.0 + 1.0 / digit) / LN(10.0))
          / (LN(1.0 + 1.0 / digit) / LN(10.0)) * total, 6) AS chi2_contrib
      FROM g, t ORDER BY digit""")
  )

  /** A13 Pearson correlation (EDA_INSIGHTS.md:19-20). */
  val qCorr = GraftQuery(
    "q_corr",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .agg(round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"))
    },
    Some("SELECT ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price FROM lineitem")
  )

  /** A14 IQR winsorize (etl.py:210-222): two-pass — exact quantiles, then
    * clip with least/greatest, then grouped exact sums. */
  val qWinsorize = GraftQuery(
    "q_winsorize",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val q = li
        .agg(graft.expressions.ExactQuantiles.quantiles(
          col("l_extendedprice"), Seq(0.25, 0.75)).as("qs"))
        .select(element_at(col("qs"), 1).as("q1"), element_at(col("qs"), 2).as("q3"))
      li.crossJoin(broadcast(q))
        .withColumn("v", least(
          greatest($"l_extendedprice", $"q1" - lit(1.5) * ($"q3" - $"q1")),
          $"q3" + lit(1.5) * ($"q3" - $"q1")))
        .groupBy($"l_returnflag")
        .agg(sumDec($"v").as("sum_winsorized"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH q AS (SELECT QUANTILE_CONT(l_extendedprice, 0.25) AS q1,
                              QUANTILE_CONT(l_extendedprice, 0.75) AS q3 FROM lineitem),
      w AS (SELECT l_returnflag,
              LEAST(GREATEST(l_extendedprice, q1 - 1.5 * (q3 - q1)), q3 + 1.5 * (q3 - q1)) AS v
            FROM lineitem, q)
      SELECT l_returnflag, CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_winsorized,
             COUNT(*) AS n
      FROM w GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  // ------------------------------------------------------------ D1-D3, P*

  /** D1 composite-key dedup with keep-FIRST semantics (etl.py:358-368).
    * "First" needs an explicit total order in a distributed engine —
    * row_number over (key, order col); dropDuplicates alone keeps an
    * arbitrary row. Single shuffle on the partition key. */
  val qDedupFirst = GraftQuery(
    "q_dedup_first",
    (s, dir) => {
      import s.implicits._
      // the testdata has duplicate (orderkey, linenumber) pairs — "first"
      // is only well-defined under a TOTAL order, so tie-break on every
      // output column (etl.py:358-368's keep-first made deterministic)
      val w = Window.partitionBy($"l_orderkey").orderBy(
        $"l_linenumber", $"l_partkey", $"l_suppkey", $"l_quantity", $"l_extendedprice")
      Tables.lineitem(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_linenumber",
          $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey")
    },
    Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
            FROM lineitem) t
      WHERE rn = 1 ORDER BY l_orderkey""")
  )

  /** D3 distinct sorted value list with cap (views.py:117-134). */
  val qDistinctValues = GraftQuery(
    "q_distinct_values",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_type").filter($"event_type".isNotNull)
        .distinct().orderBy($"event_type").limit(300)
    },
    Some("""SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL
      ORDER BY event_type LIMIT 300""")
  )

  /** P3 case-insensitive equality filter (views.py:40-50) + aggregate. */
  val qFilterCi = GraftQuery(
    "q_filter_ci",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .filter(lower($"event_type") === lit("purchase"))
        .agg(count(lit(1)).as("n"), sumDec($"value", 6).as("sum_value"))
    },
    Some("""SELECT COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events WHERE LOWER(event_type) = 'purchase'""")
  )

  // ---------------------------------------------------------------- O1-O4

  /** O2 top-K rows by column (analysis.py:463-465) — TakeOrderedAndProject,
    * no global sort materialization. */
  val qTopk = GraftQuery(
    "q_topk",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")
  )

  /** O3 running cumulative sum over the top-10 (waterfall,
    * analysis.py:469) — the reference's one window-function computation. */
  val qCumsum = GraftQuery(
    "q_cumsum",
    (s, dir) => {
      import s.implicits._
      val top = Tables.orders(s, dir)
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey").limit(10)
      val w = Window.orderBy($"o_totalprice".desc, $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top
        .withColumn("running_total",
          sum($"o_totalprice".cast(DecimalType(18, 2))).over(w).cast(DoubleType))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
    },
    Some("""WITH t AS (SELECT o_orderkey, o_totalprice FROM orders
                       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
      SELECT o_orderkey, o_totalprice,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      FROM t ORDER BY o_totalprice DESC, o_orderkey""")
  )

  /** O4 preferred-first priority ordering (views.py:191-204): order by a
    * when-derived rank, not by the label. */
  val qPriorityOrder = GraftQuery(
    "q_priority_order",
    (s, dir) => {
      import s.implicits._
      val rank = when($"o_orderpriority" === "1-URGENT", 0)
        .when($"o_orderpriority" === "3-MEDIUM", 1)
        .when($"o_orderpriority" === "5-LOW", 2)
        .otherwise(9)
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .withColumn("rk", rank)
        .orderBy($"rk", $"o_orderpriority")
        .select($"o_orderpriority", $"n", $"rk")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
        CASE o_orderpriority WHEN '1-URGENT' THEN 0 WHEN '3-MEDIUM' THEN 1
             WHEN '5-LOW' THEN 2 ELSE 9 END AS rk
      FROM orders GROUP BY o_orderpriority ORDER BY rk, o_orderpriority""")
  )

  // ---------------------------------------------------------------- joins

  /** §2.8(a) broadcast hash join: fact orders ⋈ dim customer. The dim side
    * is wrapped in broadcast() — at 100 TB the fact side never shuffles. */
  val qJoinSegmentRevenue = GraftQuery(
    "q_join_segment_revenue",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sumDec($"o_totalprice").as("revenue"))
        .orderBy($"c_mktsegment")
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  )

  /** §2.8(b) multi-way dim chain: lineitem ⋈ supplier ⋈ nation — snowflake
    * rollup with both dims broadcast. */
  val qJoinNationRevenue = GraftQuery(
    "q_join_nation_revenue",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          Agg.revenueDec($"l_extendedprice", $"l_discount").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    },
    Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""")
  )

  /** Customer ⋈ orders ⋈ nation ⋈ region: the star's full dimension chain
    * (exercises multi-join reorder + broadcast planning). */
  val qJoinRegionRevenue = GraftQuery(
    "q_join_region_revenue",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_orders"), sumDec($"o_totalprice").as("revenue"))
        .orderBy($"r_name")
    },
    Some("""SELECT r_name, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")
  )

  // ----------------------------------------------------- events / temporal

  /** Hourly windowed aggregate over the events table (the batch shape of
    * the streaming query in graft.streaming). Timestamps emitted as
    * strings for engine-neutral comparison. */
  val qEventsHourly = GraftQuery(
    "q_events_hourly",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"))
        .agg(count(lit(1)).as("n"), sumDec($"value", 6).as("sum_value"))
        .orderBy($"hour")
    },
    Some("""SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1 ORDER BY hour""")
  )

  /** F13-adjacent: JSON attribute extraction (the reference's isq map,
    * scraper.py:263-280, generalized to the events props column). */
  val qJsonExtract = GraftQuery(
    "q_json_extract",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("k", get_json_object($"props", "$.k").cast("int"))
        .groupBy($"event_type")
        .agg(sum($"k").cast(LongType).as("sum_k"), count(lit(1)).as("n"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""")
  )

  /** A15 column-profile report as a distributed query: one aggregate pass
    * computes every column's stats, then the per-column rows are unioned
    * from that single row (the reference's per-column pandas loop becomes
    * one scan; etl.py:379-400). */
  val qProfileOrders = GraftQuery(
    "q_profile_orders",
    (s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val cols = o.columns.toSeq
      val agg = o.agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"uq_$c"))): _*)
      cols.map { c =>
        agg.select(lit(c).as("column"), col("rows"),
          col(s"nn_$c").as("non_null"), (col("rows") - col(s"nn_$c")).as("nulls"),
          round((col("rows") - col(s"nn_$c")).cast(DoubleType) / col("rows") * 100, 4)
            .as("null_pct"),
          col(s"uq_$c").as("unique"))
      }.reduce(_.unionAll(_)).orderBy($"column")
    },
    Some("""WITH s AS (SELECT COUNT(*) AS rows,
        COUNT(o_orderkey) AS nn1, COUNT(DISTINCT o_orderkey) AS uq1,
        COUNT(o_custkey) AS nn2, COUNT(DISTINCT o_custkey) AS uq2,
        COUNT(o_orderstatus) AS nn3, COUNT(DISTINCT o_orderstatus) AS uq3,
        COUNT(o_totalprice) AS nn4, COUNT(DISTINCT o_totalprice) AS uq4,
        COUNT(o_orderdate) AS nn5, COUNT(DISTINCT o_orderdate) AS uq5,
        COUNT(o_orderpriority) AS nn6, COUNT(DISTINCT o_orderpriority) AS uq6
      FROM orders)
      SELECT * FROM (
        SELECT 'o_orderkey' AS "column", "rows", nn1 AS non_null, "rows"-nn1 AS nulls, ROUND(CAST("rows"-nn1 AS DOUBLE)/"rows"*100, 4) AS null_pct, uq1 AS "unique" FROM s
        UNION ALL SELECT 'o_custkey', "rows", nn2, "rows"-nn2, ROUND(CAST("rows"-nn2 AS DOUBLE)/"rows"*100, 4), uq2 FROM s
        UNION ALL SELECT 'o_orderstatus', "rows", nn3, "rows"-nn3, ROUND(CAST("rows"-nn3 AS DOUBLE)/"rows"*100, 4), uq3 FROM s
        UNION ALL SELECT 'o_totalprice', "rows", nn4, "rows"-nn4, ROUND(CAST("rows"-nn4 AS DOUBLE)/"rows"*100, 4), uq4 FROM s
        UNION ALL SELECT 'o_orderdate', "rows", nn5, "rows"-nn5, ROUND(CAST("rows"-nn5 AS DOUBLE)/"rows"*100, 4), uq5 FROM s
        UNION ALL SELECT 'o_orderpriority', "rows", nn6, "rows"-nn6, ROUND(CAST("rows"-nn6 AS DOUBLE)/"rows"*100, 4), uq6 FROM s
      ) ORDER BY "column" """)
  )

  /** P6 date-range filter + temporal rollup: the predicate reaches the
    * parquet scan (PushedFilters) — at 100 TB with date partitioning this
    * is partition pruning. */
  val qRevenueByYear = GraftQuery(
    "q_revenue_by_year",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
        .groupBy(year($"o_orderdate").as("yr"))
        .agg(count(lit(1)).as("n_orders"), sumDec($"o_totalprice").as("revenue"))
        .orderBy($"yr")
    },
    Some("""SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY 1 ORDER BY yr""")
  )

  /** Sessionization (lag/window family the reference lacks, standard for
    * event pipelines): a session breaks after a 30-minute gap per user;
    * one shuffle on user_id, lag + running sum inside the partition. */
  val qSessionize = GraftQuery(
    "q_sessionize",
    (s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val newSession = when(
        unix_micros($"ts") - unix_micros(lag($"ts", 1).over(byUser)) > 30L * 60 * 1000000,
        1).otherwise(0)
      Tables.events(s, dir)
        .withColumn("new_s", coalesce(newSession, lit(0)))
        .withColumn("session_idx",
          sum($"new_s").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"),
          date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"), sum($"n_events").cast(LongType).as("n_events"))
        .orderBy($"user_id")
    },
    Some("""WITH g AS (SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
             THEN 1 ELSE 0 END AS new_s
      FROM events),
      se AS (SELECT user_id,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM g),
      per AS (SELECT user_id, session_idx, COUNT(*) AS n_events FROM se GROUP BY 1, 2)
      SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events
      FROM per GROUP BY user_id ORDER BY user_id""")
  )

  /** P9 bounded deterministic sample, fully oracle-able: a multiplicative
    * congruential hash of the key (h = (key mod 2³¹−1)·48271 mod 2³¹−1,
    * Lehmer/MINSTD — plain integer arithmetic; the INNER mod keeps the
    * product under 2⁴⁷ so no 64-bit overflow for ANY key, including
    * snowflake-style ids near 2⁶³ that would otherwise throw under ANSI;
    * the oracle adds `(+M) % M` because DuckDB's % follows the dividend
    * sign where Spark's pmod is always non-negative — negative keys
    * would otherwise sample different rows per engine)
    * selects ~5% of rows, bounded to the first 1000 by key. Unlike the
    * previous rand(seed) ordering this is stable under repartitioning AND
    * map-only — no full sort of the corpus, just a pushable filter and a
    * bounded TakeOrdered. */
  val qSampleEvents = GraftQuery(
    "q_sample_events",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .filter(pmod(pmod($"event_id", lit(2147483647L)) * lit(48271L),
          lit(2147483647L)) % 20 === 7)
        .select($"event_id", $"user_id", $"event_type")
        .orderBy($"event_id").limit(1000)
    },
    Some("""SELECT event_id, user_id, event_type FROM events
      WHERE ((((event_id % 2147483647 + 2147483647) % 2147483647) * 48271) % 2147483647) % 20 = 7
      ORDER BY event_id LIMIT 1000""")
  )

  /** P9 stratified variant: a DETERMINISTIC per-class sample — 50 events
    * per event_type, selected by the portable Lehmer hash of the key (so
    * both engines pick the same rows) through the TopKPerKey heap
    * operator: the partial phase prunes each partition to ≤50 rows per
    * class BEFORE the shuffle — the class-balanced downsample for
    * training pipelines, with no full sort and no skew (a 90%-class
    * contributes the same 50 rows as a 1%-class). */
  val qStratifiedSample = GraftQuery(
    "q_stratified_sample",
    (s, dir) => {
      import s.implicits._
      val hashed = Tables.events(s, dir)
        .withColumn("h", pmod(pmod($"event_id", lit(2147483647L)) * lit(48271L),
          lit(2147483647L)))
        .select($"event_id", $"event_type", $"h")
      graft.plans.TopKPerKey.perKey(hashed, Seq("event_type"),
          Seq(("h", true), ("event_id", true)), 50)
        .select($"event_id", $"event_type")
        .orderBy($"event_type", $"event_id")
    },
    Some("""SELECT event_id, event_type
      FROM (SELECT event_id, event_type,
              ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY (((event_id % 2147483647 + 2147483647) % 2147483647) * 48271) % 2147483647, event_id) AS rn
            FROM events) t
      WHERE rn <= 50 ORDER BY event_type, event_id""")
  )

  /** Flagship composite: scan → broadcast dim joins → grouped decimal
    * aggregate → window rank → top-10 (the TPC-H Q10 shape; exercises the
    * whole relational stack in one plan).
    *
    * Shape: lineitem is pre-aggregated to one revenue row PER ORDER before
    * the fact-fact join — the join input shrinks ~4x (lines → orders), the
    * map-side combine runs on clustered l_orderkey, and n_orders becomes a
    * plain count instead of a countDistinct (no Expand, one agg phase).
    * Decimal sums re-associate exactly, so results are bit-identical to
    * the flat formulation the oracle SQL uses. */
  val qTopCustomers = GraftQuery(
    "q_top_customers",
    (s, dir) => {
      import s.implicits._
      val perOrder = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(sum($"l_extendedprice".cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - $"l_discount".cast(DecimalType(18, 2))))
          .as("order_rev"))
      val revenue = perOrder
        .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(
          count(lit(1)).as("n_orders"),
          sum($"order_rev").cast(DoubleType).as("revenue"))
      revenue
        .withColumn("rk", row_number().over(Window.orderBy($"revenue".desc, $"c_custkey")))
        .filter($"rk" <= 10)
        .select($"rk", $"c_custkey", $"c_name", $"n_name", $"n_orders", $"revenue")
        .orderBy($"rk")
    },
    Some("""WITH rev AS (SELECT c_custkey, c_name, n_name,
        COUNT(DISTINCT o_orderkey) AS n_orders,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2, 3),
      ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rk FROM rev)
      SELECT rk, c_custkey, c_name, n_name, n_orders, revenue
      FROM ranked WHERE rk <= 10 ORDER BY rk""")
  )

  /** Semi/anti join family (EXISTS / NOT EXISTS): customers with and
    * without orders — left_semi/left_anti never materialize the right
    * side's columns, so at 100 TB only the key set flows. */
  val qSemiAnti = GraftQuery(
    "q_semi_anti",
    (s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).select($"o_custkey")
      val withOrders = c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
        .agg(count(lit(1)).as("n")).select(lit("with_orders").as("segment"), $"n")
      val withoutOrders = c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .agg(count(lit(1)).as("n")).select(lit("without_orders").as("segment"), $"n")
      withOrders.unionAll(withoutOrders).orderBy($"segment")
    },
    Some("""SELECT 'with_orders' AS segment, COUNT(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      UNION ALL
      SELECT 'without_orders', COUNT(*) FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY segment""")
  )

  /** Hierarchical rollup (region → nation subtotals + grand total) —
    * grouping-sets family beyond the reference's flat group-bys. */
  val qRollup = GraftQuery(
    "q_rollup",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_orders"), sumDec($"o_totalprice").as("revenue"))
        .select(coalesce($"r_name", lit("ALL")).as("region"),
          coalesce($"n_name", lit("ALL")).as("nation"), $"n_orders", $"revenue")
        .orderBy($"region", $"nation")
    },
    Some("""SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY region, nation""")
  )

  /** Pivot as portable conditional aggregation: order counts by
    * status × priority (one row per priority, one column per status). */
  val qPivotStatus = GraftQuery(
    "q_pivot_status",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          sum(when($"o_orderstatus" === "O", 1).otherwise(0)).cast(LongType).as("n_open"),
          sum(when($"o_orderstatus" === "F", 1).otherwise(0)).cast(LongType).as("n_filled"),
          sum(when($"o_orderstatus" === "P", 1).otherwise(0)).cast(LongType).as("n_pending"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
        CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** Set operations: users who purchased INTERSECT/EXCEPT users who
    * errored (distinct-set semantics, one shuffle each). */
  val qSetOps = GraftQuery(
    "q_set_ops",
    (s, dir) => {
      import s.implicits._
      def users(t: String) = Tables.events(s, dir)
        .filter($"event_type" === t).select($"user_id").distinct()
      val both = users("purchase").intersect(users("error"))
        .agg(count(lit(1)).as("n")).select(lit("purchase_and_error").as("segment"), $"n")
      val only = users("purchase").except(users("error"))
        .agg(count(lit(1)).as("n")).select(lit("purchase_no_error").as("segment"), $"n")
      both.unionAll(only).orderBy($"segment")
    },
    Some("""SELECT 'purchase_and_error' AS segment, COUNT(*) AS n FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'error') t
      UNION ALL
      SELECT 'purchase_no_error', COUNT(*) FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'error') t
      ORDER BY segment""")
  )

  val all: Seq[GraftQuery] = Seq(
    qTopCustomers, qSemiAnti, qRollup, qPivotStatus, qSetOps,
    q1PricingSummary, qSummaryKpis, qGroupMean, qValueCounts, qTopnOthers,
    qQuantiles, qHistogram, qEquidepthHist, qBenford, qCorr, qWinsorize, qDedupFirst, qDistinctValues,
    qFilterCi, qTopk, qCumsum, qPriorityOrder, qJoinSegmentRevenue,
    qJoinNationRevenue, qJoinRegionRevenue, qEventsHourly, qJsonExtract,
    qProfileOrders, qRevenueByYear, qSessionize, qSampleEvents,
    qStratifiedSample)
}
