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

  test("guardedJoin launches sane joins and refuses many-to-many explosions") {
    import spark.implicits._
    // one-to-one: passes, and the result is the real join
    val a = (1L to 5000L).toDF("ka")
    val b = (2501L to 7500L).toDF("kb")
    val joined = JoinSizeEstimator.guardedJoin(a, b, "ka", "kb")
    assert(joined.count() === 2500L)
    // both sides keyed by a 10-value column: 20k x 20k rows over 10 keys
    // -> ~40M output vs 20k inputs — the guard must refuse BEFORE joining
    val fatA = (1L to 20000L).map(i => i % 10).toDF("ka")
    val fatB = (1L to 20000L).map(i => i % 10).toDF("kb")
    val e = intercept[IllegalArgumentException] {
      JoinSizeEstimator.guardedJoin(fatA, fatB, "ka", "kb")
    }
    assert(e.getMessage.contains("explosion"))
    // the same join passes when the caller raises the rail explicitly
    assert(JoinSizeEstimator.guardedJoin(fatA, fatB, "ka", "kb",
      maxBlowup = 1e7).count() === 40000000L)
  }
}
