package graft.analytics

import graft.{GraftQuery, Tables}
import graft.analytics.Agg.revenueDec
import org.apache.spark.sql.functions._

/** Classic TPC-H join topologies adapted to the testdata's column subset,
  * widening the join/filter oracle surface beyond the star-schema rollups:
  *
  *  - Q3  shape: selective dim filter → fact-fact join → top-N of a
  *    grouped aggregate (shipping-priority candidates);
  *  - Q7  shape: two-nation flow — dims joined twice under a symmetric
  *    OR predicate, yearly rollup;
  *  - Q12 shape: fact-fact join with a row-level temporal predicate and
  *    CASE-bucketed conditional counts (l_shipmode/l_commitdate do not
  *    exist in this testdata, so returnflag × order-priority classes
  *    stand in — the plan shape is the point).
  *
  * Scale notes: customer/supplier/nation broadcast; the only shuffle in
  * each query is lineitem⋈orders on orderkey plus the final rollup —
  * the same backbone PlanAuditSpec pins for the flagship query.
  */
object TpchQueries {

  /** Q3: top-10 unshipped-revenue orders in one segment at a date pivot. */
  val qTpchQ3 = GraftQuery(
    "q_tpch_q3",
    (s, dir) => {
      import s.implicits._
      val pivot = lit("1998-06-01").cast("timestamp")
      Tables.lineitem(s, dir).filter($"l_shipdate" > pivot)
        .join(Tables.orders(s, dir).filter($"o_orderdate" < pivot), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")),
          $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"))
        .agg(revenueDec($"l_extendedprice", $"l_discount").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },
    Some("""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-01'
        AND l_shipdate > TIMESTAMP '1998-06-01'
      GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")
  )

  /** Q7: bilateral trade volume between two nations by ship year. */
  val qTpchQ7 = GraftQuery(
    "q_tpch_q7",
    (s, dir) => {
      import s.implicits._
      val n1 = Tables.nation(s, dir).select($"n_nationkey".as("nk1"), $"n_name".as("supp_nation"))
      val n2 = Tables.nation(s, dir).select($"n_nationkey".as("nk2"), $"n_name".as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
        .join(broadcast(n1), $"s_nationkey" === $"nk1")
        .join(broadcast(n2), $"c_nationkey" === $"nk2")
        .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
          ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
        .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
        .agg(revenueDec($"l_extendedprice", $"l_discount").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(YEAR(l_shipdate) AS INT) AS l_year,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")
  )

  /** Q12 shape: late shipments (>60 days after order) bucketed by
    * returnflag, with conditional priority-class counts. */
  val qTpchQ12 = GraftQuery(
    "q_tpch_q12",
    (s, dir) => {
      import s.implicits._
      val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
        .filter($"l_shipdate" >= $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .groupBy($"l_returnflag")
        .agg(sum(when(high, 1).otherwise(0)).as("high_count"),
          sum(when(!high, 1).otherwise(0)).as("low_count"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** Q4 shape: order-priority counts over orders with at least one
    * late-shipping lineitem (EXISTS → left-semi; l_commitdate doesn't
    * exist in this testdata, so ship-more-than-30-days-after-order
    * stands in). The semi-join keeps only o_orderkey+predicate columns
    * flowing — no lineitem payload survives the join. */
  val qTpchQ4 = GraftQuery(
    "q_tpch_q4",
    (s, dir) => {
      import s.implicits._
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1997-10-01").cast("timestamp")
      val l = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
      Tables.orders(s, dir)
        .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
        .join(l, $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" + expr("INTERVAL 30 DAYS"), "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate >= o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** Q14 shape: promo revenue share in one ship month — conditional
    * decimal aggregation over the lineitem⋈part broadcast join, two
    * exact sums divided once at the end (no per-row division). */
  val qTpchQ14 = GraftQuery(
    "q_tpch_q14",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val rev = $"l_extendedprice".cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) - $"l_discount".cast(DecimalType(18, 2)))
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1997-09-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-10-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
        .agg(
          round(lit(100.0) *
            sum(when($"p_type" === "PROMO", rev).otherwise(lit(0).cast(DecimalType(18, 2))))
              .cast(DoubleType) /
            sum(rev).cast(DoubleType), 6).as("promo_share"),
          sum(rev).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT
        ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS promo_share,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""")
  )

  /** Q19 shape: disjunction of brand×size×quantity predicate blocks —
    * the classic OR-of-ANDs that tests predicate pushdown through a
    * join (part side pushes the brand/size disjunction into the scan,
    * quantity bounds stay on the fact side). */
  val qTpchQ19 = GraftQuery(
    "q_tpch_q19",
    (s, dir) => {
      import s.implicits._
      val cond =
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) && $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#15" && $"p_size".between(1, 10) && $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#18" && $"p_size".between(1, 15) && $"l_quantity".between(20, 30))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
        .filter(cond)
        .groupBy($"p_brand")
        .agg(revenueDec($"l_extendedprice", $"l_discount").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"p_brand")
    },
    Some("""SELECT p_brand,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#18' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
      GROUP BY p_brand ORDER BY p_brand""")
  )

  /** Q2 shape: correlated minimum — per part, the supplier(s) offering
    * the lowest price. The testdata has no partsupp table, so the
    * (part, supplier) cost relation derives from lineitem (min observed
    * extendedprice per pair). The selective part filter broadcasts INTO
    * the lineitem scan before the aggregate — only matching lines are
    * grouped — and the correlated min is a window over the per-pair
    * aggregate (tiny), never a re-scan. Decimal min/equality keeps the
    * tie set exact in both engines. */
  val qTpchQ2 = GraftQuery(
    "q_tpch_q2",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val ps = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter($"p_size" === 30)
          .select($"p_partkey", $"p_name")), $"l_partkey" === $"p_partkey")
        .groupBy($"p_partkey", $"p_name", $"l_suppkey")
        .agg(min($"l_extendedprice".cast(DecimalType(18, 2))).as("cost"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"p_partkey")
      ps.withColumn("min_cost", min($"cost").over(w))
        .filter($"cost" === $"min_cost")
        .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .select($"p_partkey", $"p_name", $"s_name", $"n_name".as("s_nation"),
          $"cost".cast(DoubleType).as("min_price"))
        .orderBy($"p_partkey", $"s_name")
    },
    Some("""WITH ps AS (SELECT p_partkey, p_name, l_suppkey,
          MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size = 30 GROUP BY 1, 2, 3),
      best AS (SELECT *, MIN(cost) OVER (PARTITION BY p_partkey) AS min_cost FROM ps)
      SELECT p_partkey, p_name, s_name, n_name AS s_nation, CAST(cost AS DOUBLE) AS min_price
      FROM best JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
      WHERE cost = min_cost
      ORDER BY p_partkey, s_name""")
  )

  /** Q10 shape: returned-item revenue per customer in one quarter —
    * fact-fact join on orderkey, then broadcast dims, top-20 by revenue.
    * customer broadcasts here; at warehouse scale where customer exceeds
    * the broadcast threshold this becomes a shuffle join on custkey,
    * which AQE picks automatically once the size estimate crosses over. */
  val qTpchQ10 = GraftQuery(
    "q_tpch_q10",
    (s, dir) => {
      import s.implicits._
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1997-04-01").cast("timestamp")
      Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
        .join(Tables.orders(s, dir).filter($"o_orderdate" >= lo && $"o_orderdate" < hi),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name", $"c_acctbal")
        .agg(revenueDec($"l_extendedprice", $"l_discount").as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name, c_acctbal,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      GROUP BY c_custkey, c_name, n_name, c_acctbal
      ORDER BY revenue DESC, c_custkey LIMIT 20""")
  )

  /** Q18 shape: large-quantity orders — HAVING on a grouped fact
    * aggregate, then join back to orders + customer. The aggregate and
    * the join share the orderkey shuffle key; quantity sums run in
    * decimal so the HAVING threshold cuts identically in both engines. */
  val qTpchQ18 = GraftQuery(
    "q_tpch_q18",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val big = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity".cast(DecimalType(18, 2))).as("qdec"))
        .filter($"qdec" > lit(250).cast(DecimalType(18, 2)))
      Tables.orders(s, dir).join(big, $"o_orderkey" === $"l_orderkey")
        .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"),
          $"o_totalprice", $"qdec".cast(DoubleType).as("sum_qty"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    },
    Some("""WITH big AS (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qdec
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
      SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        o_totalprice, CAST(qdec AS DOUBLE) AS sum_qty
      FROM big JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")
  )

  /** Q22 shape: scalar-subquery threshold + anti join — customers above
    * the average positive balance with no orders in the final window.
    * The threshold compares EXACTLY via decimal cross-multiplication
    * (bal·n > Σbal) instead of dividing first: double division would
    * round differently per engine exactly at the boundary. The 1-row
    * aggregate broadcasts; the anti join shuffles only custkeys. */
  val qTpchQ22 = GraftQuery(
    "q_tpch_q22",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val pos = Tables.customer(s, dir).filter($"c_acctbal" > 0.0)
        .agg(sum($"c_acctbal".cast(DecimalType(18, 2))).as("s_bal"),
          count(lit(1)).as("n_bal"))
      val recent = Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
        .select($"o_custkey")
      Tables.customer(s, dir).crossJoin(broadcast(pos))
        .filter($"c_acctbal".cast(DecimalType(18, 2)) * $"n_bal" > $"s_bal")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("numcust"), Agg.sumDec($"c_acctbal").as("totacctbal"))
        .orderBy($"c_nationkey")
    },
    Some("""WITH pos AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s_bal, COUNT(*) AS n_bal
        FROM customer WHERE c_acctbal > 0.0)
      SELECT c_nationkey, COUNT(*) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM customer, pos
      WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_bal > s_bal
        AND c_custkey NOT IN (SELECT o_custkey FROM orders
                              WHERE o_orderdate >= TIMESTAMP '2001-01-01')
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  /** Q13 shape: customer order-count DISTRIBUTION through a left outer
    * join — the topology whose point is the customers with ZERO orders.
    * Scale shape: orders pre-aggregate to one (custkey, count) row
    * BEFORE the join (map-side combine on the fact), so the outer join
    * input is customers ⋈ per-customer counts, never raw orders; the
    * distribution rollup then runs over distinct counts (tiny). */
  val qTpchQ13 = GraftQuery(
    "q_tpch_q13",
    (s, dir) => {
      import s.implicits._
      val cnt = Tables.orders(s, dir)
        .filter($"o_orderpriority" =!= "1-URGENT")
        .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      Tables.customer(s, dir).select($"c_custkey")
        .join(cnt, $"c_custkey" === $"o_custkey", "left")
        .select(coalesce($"n", lit(0L)).as("c_count"))
        .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },
    Some("""SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")
  )

  /** Q17 shape: revenue of SMALL-quantity lines — each line compared to
    * 20% of its part's average quantity (the correlated-scalar-subquery
    * topology). The correlation runs as a WINDOW over l_partkey — one
    * shuffle, no self-join — after the brand filter broadcasts into the
    * lineitem scan. The per-part average goes through DECIMAL (exact,
    * order-independent) so the 0.2·avg threshold is the same double in
    * both engines and the strict < cannot flip at the boundary. */
  val qTpchQ17 = GraftQuery(
    "q_tpch_q17",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val pt = broadcast(Tables.part(s, dir)
        .filter($"p_brand" === "Brand#1").select($"p_partkey"))
      val w = Window.partitionBy($"l_partkey")
      Tables.lineitem(s, dir)
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
        .join(pt, $"l_partkey" === $"p_partkey")
        .withColumn("avg_qty",
          sum($"l_quantity".cast(DecimalType(18, 6))).over(w).cast(DoubleType)
            / count(lit(1)).over(w))
        .filter($"l_quantity" < $"avg_qty" * 0.2)
        .agg((sum($"l_extendedprice".cast(DecimalType(18, 2))).cast(DoubleType) / 7.0)
          .as("avg_yearly"), count(lit(1)).as("n_small_lines"))
    },
    Some("""WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'),
      t AS (SELECT l_quantity, l_extendedprice,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER (PARTITION BY l_partkey) AS DOUBLE)
            / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
        FROM li)
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        COUNT(*) AS n_small_lines
      FROM t WHERE l_quantity < avg_qty * 0.2""")
  )

  /** Q21 shape: suppliers who kept F-status orders waiting — the
    * EXISTS / NOT-EXISTS chain topology, rewritten as per-order
    * aggregates: "another supplier has a line" ⇔ the order has ≥ 2
    * distinct suppliers, "no OTHER supplier was late" ⇔ exactly one
    * distinct late supplier (the candidate's own late line makes it a
    * member). Late = shipped > 90 days after order date (this testdata
    * has no commit/receipt dates). One orderkey backbone shuffle feeds
    * the join AND the per-order aggregate (co-partitioned re-join, no
    * second data shuffle); supplier names broadcast at the end. */
  val qTpchQ21 = GraftQuery(
    "q_tpch_q21",
    (s, dir) => {
      import s.implicits._
      val f = graft.operators.Caches.register(
        Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey", $"l_shipdate")
          .join(Tables.orders(s, dir).filter($"o_orderstatus" === "F")
            .select($"o_orderkey", $"o_orderdate"), $"l_orderkey" === $"o_orderkey")
          .select($"l_orderkey", $"l_suppkey",
            ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
              .cast("int").as("late")))
      val per = f.groupBy($"l_orderkey")
        .agg(countDistinct($"l_suppkey").as("n_supp"),
          countDistinct(when($"late" === 1, $"l_suppkey")).as("n_late"))
      f.filter($"late" === 1)
        .join(per, "l_orderkey")
        .filter($"n_supp" >= 2 && $"n_late" === 1)
        .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_name")),
          $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(10)
    },
    Some("""WITH f AS (SELECT l_orderkey, l_suppkey,
        CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
      o AS (SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
          COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
        FROM f GROUP BY 1),
      w AS (SELECT f.l_suppkey FROM f JOIN o USING (l_orderkey)
        WHERE f.late = 1 AND o.n_supp >= 2 AND o.n_late = 1)
      SELECT s_name, COUNT(*) AS numwait
      FROM w JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""")
  )

  /** Q15 shape: top supplier(s) by quarterly revenue — the
    * max-of-aggregate join-back topology (the original's revenue VIEW).
    * The per-supplier revenue stays DECIMAL through the max and the
    * equality join-back, so "equals the maximum" is exact arithmetic in
    * both engines, never a double comparison. The 1-row max broadcasts;
    * the max-filtered relation (≈1 row) then drives the supplier name
    * join — nothing supplier-sized ever re-shuffles. */
  val qTpchQ15 = GraftQuery(
    "q_tpch_q15",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val rev = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-04-01").cast("timestamp"))
        .groupBy($"l_suppkey")
        .agg(sum($"l_extendedprice".cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - $"l_discount".cast(DecimalType(18, 2))))
          .as("total_dec"))
      val mx = rev.agg(max($"total_dec").as("mx"))
      rev.join(broadcast(mx), $"total_dec" === $"mx")
        .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_name")),
          $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name",
          $"total_dec".cast(DoubleType).as("total_revenue"))
        .orderBy($"s_suppkey")
    },
    Some("""WITH rev AS (SELECT l_suppkey,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_dec = (SELECT MAX(total_dec) FROM rev)
      ORDER BY s_suppkey""")
  )

  /** Q8 shape: one nation's market share inside one region for one
    * product type, by order year — the widest dim fan of the set
    * (part + supplier + customer + nation×2 + region all broadcast onto
    * the lineitem⋈orders backbone). The share is a conditional decimal
    * sum over the total decimal sum — both exact, one double division,
    * deterministic in both engines. */
  val qTpchQ8 = GraftQuery(
    "q_tpch_q8",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val rev = $"l_extendedprice".cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) - $"l_discount".cast(DecimalType(18, 2)))
      val custNation = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as("cnk"))
      val suppNation = Tables.nation(s, dir)
        .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.part(s, dir).filter($"p_type" === "PROMO")
          .select($"p_partkey")), $"l_partkey" === $"p_partkey")
        .join(broadcast(Tables.customer(s, dir)
          .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
        .join(broadcast(custNation), $"c_nationkey" === $"cnk")
        .join(broadcast(Tables.supplier(s, dir)
          .select($"s_suppkey", $"s_nationkey")), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(suppNation), $"s_nationkey" === $"snk")
        .groupBy(year($"o_orderdate").as("o_year"))
        .agg(
          sum(when($"supp_nation" === "NATION_1", rev)
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType)
            .as("nation_revenue"),
          sum(rev).cast(DoubleType).as("total_revenue"))
        .withColumn("mkt_share",
          floor($"nation_revenue" * 1000000.0 / $"total_revenue" + 0.5) / 1000000.0)
        .orderBy($"o_year")
    },
    Some("""SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
        CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_revenue,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
        FLOOR(CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 1000000.0
          / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) + 0.5) / 1000000.0 AS mkt_share
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN part ON l_partkey = p_partkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation n1 ON c_nationkey = n1.n_nationkey
                    JOIN region ON n1.n_regionkey = r_regionkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      GROUP BY 1 ORDER BY o_year""")
  )

  /** Q6 shape: forecast-revenue-change — a pure scan-side filter
    * (date range × discount band × quantity cap) into one global decimal
    * sum. The point at scale is that every predicate reaches the parquet
    * scan as a pushed filter: zero joins, zero row-level compute beyond
    * the product, one 1-row result. */
  val qTpchQ6 = GraftQuery(
    "q_tpch_q6",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .agg(sum($"l_extendedprice".cast(DecimalType(18, 2)) *
          $"l_discount".cast(DecimalType(18, 2))).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")
  )

  /** Q9 shape: product-type profit by supplier nation and order year —
    * the five-table star with a substring part filter and a SIGNED
    * decimal measure (revenue minus cost can go negative, exercising
    * decimal subtraction in the rollup; this testdata has no
    * ps_supplycost, so p_retailprice × quantity stands in). part
    * filters before broadcasting, so the fact backbone shrinks at the
    * first join; the only shuffle is lineitem⋈orders + the rollup. */
  val qTpchQ9 = GraftQuery(
    "q_tpch_q9",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val profit = $"l_extendedprice".cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) - $"l_discount".cast(DecimalType(18, 2))) -
        $"p_retailprice".cast(DecimalType(18, 2)) * $"l_quantity".cast(DecimalType(18, 2))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter($"p_name".contains("widget"))
          .select($"p_partkey", $"p_retailprice")), $"l_partkey" === $"p_partkey")
        .join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")),
          $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name", year($"o_orderdate").as("o_year"))
        .agg(sum(profit).cast(DoubleType).as("profit"))
        .orderBy($"n_name", $"o_year")
    },
    Some("""SELECT n_name, CAST(YEAR(o_orderdate) AS INT) AS o_year,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN part ON l_partkey = p_partkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** Q11 shape: important parts by traded value among one nation's
    * suppliers — grouped aggregate filtered against a GLOBAL-FRACTION
    * threshold (the original's scalar subquery). The threshold compare
    * is value×1000 > total, pure decimal integer arithmetic, so the
    * cut is exact in both engines — never a double epsilon. The 1-row
    * total broadcasts back over the per-part relation. */
  val qTpchQ11 = GraftQuery(
    "q_tpch_q11",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val rev = $"l_extendedprice".cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) - $"l_discount".cast(DecimalType(18, 2)))
      val v = Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir).filter($"n_name" === "NATION_3")),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey")), $"l_suppkey" === $"s_suppkey")
        .groupBy($"l_partkey")
        .agg(sum(rev).as("value_dec"))
      val total = v.agg(sum($"value_dec").as("total_dec"))
      v.join(broadcast(total), $"value_dec" * 1000 > $"total_dec")
        .select($"l_partkey", $"value_dec".cast(DoubleType).as("part_value"))
        .orderBy($"part_value".desc, $"l_partkey")
    },
    Some("""WITH v AS (SELECT l_partkey,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS value_dec
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3' GROUP BY 1)
      SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value FROM v
      WHERE value_dec * 1000 > (SELECT SUM(value_dec) FROM v)
      ORDER BY part_value DESC, l_partkey""")
  )

  /** Q16 shape: supplier diversity per part class — distinct-count over
    * an ANTI-JOINED exclusion list (the original's NOT IN complaint
    * subquery; negative account balance stands in for complaints). The
    * part-supplier association comes from lineitem projected to its two
    * key columns and deduped map-side; the 6-row exclusion list
    * broadcasts as an anti-join ABOVE the scan, so excluded suppliers
    * never reach the distinct-count shuffle. */
  val qTpchQ16 = GraftQuery(
    "q_tpch_q16",
    (s, dir) => {
      import s.implicits._
      val excl = Tables.supplier(s, dir).filter($"s_acctbal" < 0).select($"s_suppkey")
      Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey").distinct()
        .join(broadcast(excl), $"l_suppkey" === $"s_suppkey", "left_anti")
        .join(broadcast(Tables.part(s, dir)
          .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO" &&
            $"p_size".isin(1, 4, 9, 14, 19, 24, 29, 34))
          .select($"p_partkey", $"p_brand", $"p_type", $"p_size")),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    },
    Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM ps JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM excl)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
  )

  /** Q20 shape: suppliers with excess shipped volume of one part family
    * in one year — the NESTED SEMI-JOIN CHAIN topology (part-name filter
    * → per-(supplier, part) HAVING aggregate → supplier semi-join →
    * nation filter). Quantities are integer-valued, so the HAVING
    * boundary is exact under any summation order. Only supplier keys
    * flow out of the aggregate; supplier/nation broadcast. */
  val qTpchQ20 = GraftQuery(
    "q_tpch_q20",
    (s, dir) => {
      import s.implicits._
      val excess = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir).filter($"p_name".startsWith("small"))
          .select($"p_partkey")), $"l_partkey" === $"p_partkey")
        .groupBy($"l_suppkey", $"l_partkey")
        .agg(sum($"l_quantity").as("qty"))
        .filter($"qty" > 50)
        .select($"l_suppkey")
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .filter($"n_name".isin("NATION_3", "NATION_5"))),
          $"s_nationkey" === $"n_nationkey")
        .join(excess, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_name", $"s_suppkey")
        .orderBy($"s_name")
    },
    Some("""WITH fp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
      agg AS (SELECT l_suppkey FROM lineitem JOIN fp ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey HAVING SUM(l_quantity) > 50)
      SELECT s_name, s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_5')
        AND s_suppkey IN (SELECT l_suppkey FROM agg)
      ORDER BY s_name""")
  )

  val all: Seq[GraftQuery] =
    Seq(qTpchQ3, qTpchQ7, qTpchQ12, qTpchQ4, qTpchQ14, qTpchQ19,
      qTpchQ2, qTpchQ10, qTpchQ18, qTpchQ22, qTpchQ13, qTpchQ17, qTpchQ21,
      qTpchQ15, qTpchQ8, qTpchQ6, qTpchQ9, qTpchQ11, qTpchQ16, qTpchQ20)
}
