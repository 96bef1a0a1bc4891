package graft.operators

import graft.{SparkSpec, Tables}

/** KMV join-size estimates land within sketch error of the exact size. */
class JoinSizeEstimatorSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"

  private def within(est: Long, actual: Long, tol: Double): Unit =
    assert(math.abs(est - actual) <= actual * tol,
      s"estimate $est vs actual $actual (> ${tol * 100}%)")

  test("lineitem ⋈ orders estimate is within 15% of the exact join size") {
    val l = Tables.lineitem(spark, Dir)
    val o = Tables.orders(spark, Dir)
    val actual = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
    val est = JoinSizeEstimator.estimateJoinRows(l, "l_orderkey", o, "o_orderkey")
    within(est, actual, 0.15)
  }

  test("disjoint key domains estimate ~zero") {
    import spark.implicits._
    val a = (1L to 50000L).toDF("k")
    val b = (1000000L to 1050000L).toDF("k")
    val est = JoinSizeEstimator.estimateJoinRows(a, "k", b, "k")
    // sketch collisions can make this slightly >0; it must be ~nothing
    assert(est < 1000, s"disjoint domains estimated $est")
  }

  test("multiplicity scaling: duplicating one side doubles the estimate") {
    import spark.implicits._
    val a = (1L to 20000L).toDF("k")
    val b = (1L to 20000L).toDF("k")
    val b2 = b.union(b)
    val e1 = JoinSizeEstimator.estimateJoinRows(a, "k", b, "k")
    val e2 = JoinSizeEstimator.estimateJoinRows(a, "k", b2, "k")
    within(e1, 20000L, 0.15)
    within(e2, 40000L, 0.15)
  }

  test("exact below k: small sides estimate exactly") {
    import spark.implicits._
    val a = (1L to 300L).toDF("k")
    val b = (200L to 500L).toDF("k")
    val est = JoinSizeEstimator.estimateJoinRows(a, "k", b, "k", k = 1024)
    assert(est == 101L, s"expected exact 101 below sketch capacity, got $est")
  }
}
