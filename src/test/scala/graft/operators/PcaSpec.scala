package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Eigensolver accuracy on known matrices, and the end-to-end spectrum
  * query's trace-identity certificate. */
class PcaSpec extends SparkSpec {

  test("jacobi eigenvalues: known 2x2 and 3x3 symmetric matrices") {
    // [[2,1],[1,2]] -> {3, 1}
    val e2 = Pca.jacobiEigenvalues(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(e2(0) - 3.0) < 1e-10 && math.abs(e2(1) - 1.0) < 1e-10)
    // diag(5, 2, 7) -> {7, 5, 2} (already diagonal: zero sweeps needed)
    val e3 = Pca.jacobiEigenvalues(Array(
      Array(5.0, 0.0, 0.0), Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 7.0)))
    assert(e3.toSeq === Seq(7.0, 5.0, 2.0))
  }

  test("covarianceSpectrum recovers planted axis variances") {
    import spark.implicits._
    // 2k points on two orthogonal axes with variances ~4 and ~1 in a
    // 6-dim space: top eigenvalues must approximate (4, 1), rest ~0
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { _ =>
      val a = rnd.nextGaussian() * 2.0
      val b = rnd.nextGaussian() * 1.0
      Tuple1(Seq(a, b, 0.0, 0.0, 0.0, 0.0))
    }
    val df = rows.toDF("embedding")
    val out = Pca.covarianceSpectrum(df, "embedding", topK = 6)
      .orderBy("rank").collect()
    val eig = out.map(_.getDouble(1))
    assert(math.abs(eig(0) - 4.0) < 0.4, s"top eigenvalue ${eig(0)} far from 4")
    assert(math.abs(eig(1) - 1.0) < 0.15, s"second eigenvalue ${eig(1)} far from 1")
    assert(eig.drop(2).forall(math.abs(_) < 1e-6), "dead dimensions must read ~0")
    // the certificate: trace identity holds in the emitted rows
    assert(out.forall(_.getDouble(5) < 1e-6), "trace_gap must certify ~0")
  }

  test("q_embed_pca: certificate holds and shares sum to <= 1") {
    val rows = graft.SparkEntry.queries("q_embed_pca")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getDouble(5) < 1e-6), "trace identity violated")
    val shares = rows.map(_.getDouble(2))
    assert(shares.sum <= 1.0 + 1e-9 && shares.forall(_ >= 0.0))
    assert(shares.sorted.reverse.toSeq === shares.toSeq, "spectrum must be descending")
  }

  test("q_embed_top_eigen: Rayleigh estimate is bounded by the Jacobi top eigenvalue") {
    val dir = "/root/testdata/sf0.001"
    val pe = graft.SparkEntry.queries("q_embed_top_eigen")(spark, dir).head()
    val ray = pe.getDouble(pe.fieldIndex("top_eig"))
    val resid = pe.getDouble(pe.fieldIndex("resid_rel"))
    val trace = pe.getDouble(pe.fieldIndex("trace"))
    // the Rayleigh quotient of ANY vector lies in [λ_min, λ_max]
    val jacobiTop = graft.SparkEntry.queries("q_embed_pca")(spark, dir)
      .head().getDouble(1)
    assert(ray <= jacobiTop + 1e-6, s"Rayleigh $ray exceeds λ_max $jacobiTop")
    assert(ray >= jacobiTop * 0.5,
      s"power iterate $ray too far below λ_max $jacobiTop for 12 rounds")
    assert(ray > trace / 64 - 1e-9, "estimate must beat the mean eigenvalue")
    assert(resid >= 0.0 && resid < 1.0, s"residual certificate $resid out of range")
  }
}
