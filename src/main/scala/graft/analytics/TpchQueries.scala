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

  val all: Seq[GraftQuery] = Seq(qTpchQ3, qTpchQ7, qTpchQ12)
}
