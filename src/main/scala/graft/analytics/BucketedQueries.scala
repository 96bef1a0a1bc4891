package graft.analytics

import graft.{GraftQuery, Tables}
import graft.analytics.Agg.revenueDec
import graft.operators.Skew
import org.apache.spark.sql.functions._

/** The bucketed-layout contract: fact tables written once bucketed by the
  * join key join co-located forever after — a SortMergeJoin with NO
  * Exchange on either side. This is the 100 TB answer to the fact-fact
  * shuffle that dominates q_top_customers: at scale the bucketed write is
  * amortized over every subsequent join on the key.
  *
  * The query performs the full ingest-then-join cycle in one plan tree so
  * the driver exercises it end to end: write lineitem and orders bucketed
  * by orderkey (8 buckets, sorted within), re-read through the catalog,
  * SMJ-join, aggregate per order priority. PlanAuditSpec asserts the join
  * sides are Exchange-free; the DuckDB oracle checks the same join over
  * the raw parquet (bucketing must not change results).
  */
object BucketedQueries {

  private val Buckets = 8

  val qBucketedJoin = GraftQuery(
    "q_bucketed_join",
    (s, dir) => {
      import s.implicits._
      // table names carry a dir tag: a shared test session may run this
      // query against several SFs — stale buckets must never cross SFs.
      // The tag is the hex of the FULL path bytes (collision-free, unlike
      // hashCode): two dirs can never share a table name.
      val tag = dir.getBytes("UTF-8").map(b => f"$b%02x").mkString
      val lt = s"graft_bkt_lineitem_$tag"
      val ot = s"graft_bkt_orders_$tag"
      // each dir would otherwise leave a full bucketed copy of
      // lineitem+orders in the warehouse forever — drop other dirs' tag
      // tables (managed, so DROP removes their data) before writing ours.
      // SINGLE-WRITER assumption: the Verify/Bench harness runs queries
      // sequentially; a concurrent run of this query against a different
      // SF in the SAME session/warehouse would have its tables dropped
      // mid-query. Concurrent use needs per-run warehouse dirs instead.
      s.catalog.listTables().collect()
        .map(_.name)
        .filter(n => n.startsWith("graft_bkt_") && n != lt && n != ot)
        .foreach(n => s.sql(s"DROP TABLE IF EXISTS `$n`"))
      Skew.writeBucketed(
        Tables.lineitem(s, dir).select($"l_orderkey", $"l_extendedprice", $"l_discount"),
        lt, "l_orderkey", Buckets)
      Skew.writeBucketed(
        Tables.orders(s, dir).select($"o_orderkey", $"o_orderpriority"),
        ot, "o_orderkey", Buckets)
      val l = s.table(lt)
      val o = s.table(ot)
      // hint("merge"): orders would otherwise broadcast at test SFs and
      // hide the co-located-join property being demonstrated
      l.hint("merge").join(o.hint("merge"), l("l_orderkey") === o("o_orderkey"))
        .groupBy($"o_orderpriority")
        .agg(revenueDec($"l_extendedprice", $"l_discount").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  val all: Seq[GraftQuery] = Seq(qBucketedJoin)
}
