package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

/** Pins the LITERAL parameter ladders of the embedding-LSH family to the
  * models they claim to implement — the drift the hash oracle cannot see
  * (both engines regenerate the same literals, right or wrong).
  *
  * References: collision probability of sign-random-projection LSH for a
  * pair at angle θ is q = 1 − θ/π per plane (Charikar '02); the hr
  * ladder's design point is q at cosine 0.95, and L is the smallest
  * table count with miss probability (1 − q^p)^L ≤ 0.1. */
class LadderModelSpec extends AnyFunSuite {

  private val q95 = 1.0 - math.acos(0.95) / math.Pi

  test("LshTableLadder: every (p, L) is the MINIMAL L with >= 0.9 recall at cosine 0.95") {
    assert(DocQueries.LshTableLadder.nonEmpty)
    DocQueries.LshTableLadder.foreach { case (p, l) =>
      val missAtL = math.pow(1.0 - math.pow(q95, p), l)
      assert(missAtL <= 0.1 + 1e-12,
        s"p=$p L=$l misses ${missAtL} > 0.1 — ladder below its design floor")
      val missAtLm1 = math.pow(1.0 - math.pow(q95, p), l - 1)
      assert(missAtLm1 > 0.1,
        s"p=$p L=$l overshoots: L-1=${l - 1} already misses only $missAtLm1")
    }
  }

  test("ladder coverage: lshTablesFor is defined for every reachable p_hr") {
    // p ranges over [5, LshMaxPlanes]; p_hr = p + 2
    val covered = DocQueries.LshTableLadder.map(_._1).toSet
    (5 to DocQueries.LshMaxPlanes).foreach { p =>
      assert(covered.contains(p + 2),
        s"p_hr=${p + 2} (planes=$p) falls off the literal ladder")
    }
    // and the plane indices stay below the recall sampler's offset, so
    // the sampling decision never shares a plane with production blocking
    val maxIdx = DocQueries.LshTableLadder.map { case (p, l) => l * p }.max
    assert(maxIdx < 4096, s"production plane index $maxIdx reaches the sampler offset")
  }

  test("lshPlanesFor: expected bucket occupancy stays in [20, 80] across 9 decades") {
    // the whole point of the adaptive ladder: N / 2^p ≈ 40 at any corpus
    // size between the clamp floors (p = 5 below ~1.3k docs) and the 2^30
    // ceiling (~43 B docs)
    var n = 2000L
    while (n <= 20000000000L) {
      val p = DocQueries.lshPlanesFor(n)
      val occ = n.toDouble / (1L << p)
      assert(occ >= 20.0 && occ <= 80.0,
        s"n=$n p=$p occupancy $occ escaped the design band")
      n *= 10
    }
  }

  test("recallSamplerPlanesFor: kept-cell count >= 32 at any stride; 10 planes at bench scales") {
    // backwards-compat: every committed measurement (sf0.01 .. sf1,
    // stride <= 32) keeps the original 10-plane sampler
    for (stride <- Seq(1L, 2L, 17L, 32L))
      assert(DocQueries.recallSamplerPlanesFor(stride) == 10)
    // the census cliff: the FIXED 10-plane sampler collapses to one cell
    // past stride 1024; the adaptive one holds >= 32 expected kept cells
    // across 13 decades of stride
    var stride = 33L
    while (stride <= (1L << 45)) {
      val p = DocQueries.recallSamplerPlanesFor(stride)
      assert(p < 63, s"stride=$stride blew the bucket-id width")
      val keptCells = (1L << p).toDouble / stride
      assert(keptCells >= 32.0,
        s"stride=$stride p=$p keeps only $keptCells expected cells")
      stride *= 7
    }
  }
}
