package graft.analytics

import graft.SparkSpec

/** q_join_size_estimate: the in-plan KMV estimate tracks the in-plan
  * exact join size — the certificate column the harness hash-gates is
  * also asserted here as a QUALITY bound, not just a reproducible value. */
class PlanningQueriesSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"

  test("both join shapes estimate within 10% of the exact size") {
    val rows = PlanningQueries.qJoinSizeEstimate.run(spark, Dir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val pair = r.getAs[String]("pair")
      val ppm = r.getAs[Long]("rel_err_ppm")
      assert(ppm < 100000L, s"$pair: rel_err_ppm=$ppm exceeds 10%")
      val est = r.getAs[Long]("est_rows")
      val exact = r.getAs[Long]("exact_rows")
      assert(exact > 0L && est > 0L, s"$pair: degenerate sizes est=$est exact=$exact")
    }
  }

  test("saturated sketch reports k-th-min estimates, under-capacity reports exact counts") {
    val byPair = PlanningQueries.qJoinSizeEstimate.run(spark, Dir)
      .collect().map(r => r.getAs[String]("pair") -> r).toMap
    // events: 150 users < k=256 — the sketch IS the distinct set
    val ev = byPair("events_purchases")
    assert(ev.getAs[Long]("dist_a_est") == 150L)
    assert(ev.getAs[Long]("inter_est") == 150L)
    // orders/lineitem: ~15k keys ≫ k — estimator path, not exact
    val ol = byPair("orders_lineitem")
    assert(ol.getAs[Long]("dist_a_est") != 15000L,
      "saturated sketch should be an estimate, not the exact count")
    assert(math.abs(ol.getAs[Long]("dist_a_est") - 15000L) < 1500L)
  }
}
