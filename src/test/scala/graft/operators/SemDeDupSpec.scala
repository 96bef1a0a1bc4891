package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SemDeDup]] — the exact-integer within-cluster cosine drop rule,
  * plus the registered query's planted-clone floor. */
class SemDeDupSpec extends SparkSpec {

  private def quant(v: Double*): Seq[Long] = FixedPointKMeans.quantizeLocal(v)

  private def droppedSet(rows: Seq[(Long, Seq[Long], Int)],
      tauNum: Long, tauDen: Long): Set[Long] = {
    import spark.implicits._
    val df = rows.toDF("id", "v", "cluster")
    SemDeDup.droppedIds(df, "id", "v", "cluster", tauNum, tauDen)
      .collect().map(_.getLong(0)).toSet
  }

  test("near-identical same-cluster pair: larger id dropped, smaller kept") {
    val d = droppedSet(Seq(
      (1L, quant(1.0, 0.0), 0),
      (2L, quant(1.0, 0.0001), 0)), 9, 10)
    assert(d === Set(2L))
  }

  test("threshold boundary is EXACT: cos = 3/5 drops at tau 3/5, survives at 4/5") {
    // u_a = (1e6, 0), u_b = (3e6, 4e6): dot = 3e12, |a|²=1e12, |b|²=25e12
    // → cos = 3e12 / (1e6 · 5e6) = 0.6 exactly in integer arithmetic
    val rows = Seq((1L, quant(1.0, 0.0), 0), (2L, quant(3.0, 4.0), 0))
    assert(droppedSet(rows, 3, 5) === Set(2L)) // cos ≥ τ at equality
    assert(droppedSet(rows, 4, 5) === Set.empty[Long])
  }

  test("zero vector never matches (undefined cosine), either side") {
    val d = droppedSet(Seq(
      (1L, quant(0.0, 0.0), 0),
      (2L, quant(1.0, 0.0), 0),
      (3L, quant(0.0, 0.0), 0)), 0, 1)
    // τ=0 would pass any dot ≥ 0 — only the nsq guards protect here;
    // ids 1 vs 3 (both zero) and zero-vs-nonzero must all be excluded
    assert(d === Set.empty[Long])
  }

  test("anti-parallel pair survives even at tau 0 (dot < 0)") {
    val d = droppedSet(Seq(
      (1L, quant(1.0, 0.0), 0),
      (2L, quant(-1.0, 0.0), 0)), 0, 1)
    assert(d === Set.empty[Long])
  }

  test("identical vectors in DIFFERENT clusters are not paired — the documented miss mode") {
    val d = droppedSet(Seq(
      (1L, quant(1.0, 1.0), 0),
      (2L, quant(1.0, 1.0), 1)), 9, 10)
    assert(d === Set.empty[Long])
  }

  test("keep-first is transitive-free: every larger id with a smaller-id match drops") {
    val d = droppedSet(Seq(
      (5L, quant(2.0, 3.0), 7),
      (6L, quant(2.0, 3.0), 7),
      (7L, quant(2.0, 3.0), 7)), 9, 10)
    assert(d === Set(6L, 7L))
  }

  test("q_semdedup at sf0.01: planted clones drive the drop surface, recall ≥ 0.9") {
    val rows = graft.analytics.CorpusStatsQueries.qSemdedup
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val nMembers = rows.map(_.getAs[Long]("n_members")).sum
    val nDropped = rows.map(_.getAs[Long]("n_dropped")).sum
    val nPlanted = rows.head.getAs[Long]("n_planted")
    val ppm = rows.head.getAs[Long]("planted_drop_ppm")
    // corpus = base + one clone per (vec_id % 8 == 0) row
    assert(nMembers === 500L + nPlanted)
    // τ=0.9 sits above everything the raw table contains (max ≈ 0.6),
    // so every drop is a planted clone: the per-cluster drop total and
    // the corpus-level planted recall are the same measurement
    assert(nDropped <= nPlanted)
    assert(ppm === nDropped * 1000000L / nPlanted)
    // within-cluster search is recall-1.0; only k-means boundary splits
    // can lose a clone — measured 62/63 at sf0.01
    assert(ppm >= 900000L, s"planted_drop_ppm=$ppm")
  }
}
