package graft.analytics

import graft.SparkSpec

/** Pins the round-15 query-level driver fixed-point paths bit-equal to
  * the distributed loops they route around, on the real sf0.001 corpus:
  * q_markov_attribution's removal-effect rounds, q_bradley_terry's MM
  * rounds (including the double→DECIMAL(18,12) term replication), and
  * q_nmf_topics' multiplicative updates. Gate 0 forces the distributed
  * branch; the default takes the driver branch on this corpus — the
  * same two-path discipline as GraphsDriverGateSpec. The DuckDB hash
  * oracle gates the same trajectories externally at sf0.01/sf0.1.
  */
class DriverLoopGateSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q_markov_attribution: driver rounds equal distributed rounds") {
    val driver = rowsOf(FunnelQueries.markovAttributionFrame(spark, Dir))
    graft.operators.Caches.unpersistAll()
    val dist = rowsOf(FunnelQueries.markovAttributionFrame(spark, Dir,
      driverMaxEdges = 0L))
    assert(driver === dist)
    assert(driver.nonEmpty)
  }

  test("q_bradley_terry: driver MM rounds equal distributed rounds") {
    val driver = rowsOf(FunnelQueries.bradleyTerryFrame(spark, Dir))
    graft.operators.Caches.unpersistAll()
    val dist = rowsOf(FunnelQueries.bradleyTerryFrame(spark, Dir,
      driverMaxPairs = 0L))
    assert(driver === dist)
    assert(driver.nonEmpty)
  }

  test("q_nmf_topics: driver MM rounds equal distributed rounds") {
    val driver = rowsOf(CorpusStatsQueries.nmfTopicsFrame(spark, Dir))
    graft.operators.Caches.unpersistAll()
    val dist = rowsOf(CorpusStatsQueries.nmfTopicsFrame(spark, Dir,
      driverMaxGrid = 0L))
    assert(driver === dist)
    assert(driver.nonEmpty)
  }
}
