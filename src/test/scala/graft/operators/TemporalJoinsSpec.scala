package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** As-of and range joins cross-checked against brute-force inequality
  * joins on sf0.001. */
class TemporalJoinsSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"

  test("asOfJoin equals the brute-force latest-prior match") {
    import spark.implicits._
    val o = Tables.orders(spark, Dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"),
        expr("max_by(o_totalprice, o_orderkey)").as("o_totalprice"))
      .cache()
    val e = Tables.events(spark, Dir).select($"event_id", $"user_id", $"ts").cache()

    val fast = TemporalJoins.asOfJoin(e, o, "user_id", "ts", "o_custkey", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
      .select($"event_id", $"_matched.o_orderkey".as("ok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force: inequality join + max_by over prior orders
    val brute = e.join(o, $"user_id" === $"o_custkey" && $"o_orderdate" <= $"ts")
      .groupBy($"event_id")
      .agg(expr("max_by(o_orderkey, struct(o_orderdate, o_orderkey))").as("ok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(fast.size === brute.size)
    brute.foreach { case (id, ok) => assert(fast(id) === ok, s"event $id") }
  }

  test("asOfJoin never matches NULL keys on either side") {
    import spark.implicits._
    // left has a null-key row; right has a null-key row that would sort
    // before everything — equality semantics must drop both, never pair them
    val left = Seq((1L, Some("u1"), "2024-01-01 10:00:00"),
        (2L, None: Option[String], "2024-01-01 11:00:00"))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((Some("u1"), "2024-01-01 09:00:00", 100.0),
        (None: Option[String], "2024-01-01 00:00:00", -1.0))
      .toDF("custkey", "orderdate", "totalprice")
    val out = TemporalJoins.asOfJoin(left, right, "user_id", "ts",
        "custkey", "orderdate", Seq("totalprice"))
      .select($"event_id", $"_matched.totalprice".as("tp")).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 1L && out(0).getDouble(1) === 100.0)
  }

  test("rangeJoinForward equals the brute-force interval join") {
    import spark.implicits._
    val e = Tables.events(spark, Dir).cache()
    val fast = TemporalJoins.rangeJoinForward(e, "user_id", "ts", "event_id", 60)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = unix_micros($"ts")
    val a = e.select($"user_id".as("k1"), $"event_id".as("e1"), t.as("t1"))
    val b = e.select($"user_id".as("k2"), $"event_id".as("e2"), t.as("t2"))
    val brute = a.join(b, $"k1" === $"k2" && $"t2" > $"t1" &&
        $"t2" <= $"t1" + 60000000L && $"e1" =!= $"e2")
      .select($"e1", $"e2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === brute)
    assert(fast.nonEmpty)
  }
}
