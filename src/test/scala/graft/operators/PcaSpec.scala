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

  test("deflatedSpectrum matches Jacobi tightly on a steep planted spectrum") {
    import spark.implicits._
    // steep spectrum (4, 1, ~0...): 12 power rounds converge to ~(1/4)^12,
    // so the deflated Rayleigh estimates must agree with the exact Jacobi
    // eigenvalues to ~1e-4 relative — the cross-validation that the TWO
    // eigensolvers (the hashable one and the exact one) see the same matrix
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map { _ =>
      val a = rnd.nextGaussian() * 2.0
      val b = rnd.nextGaussian() * 1.0
      Tuple1(Seq(a, b, 0.0, 0.0, 0.0, 0.0))
    }
    val df = rows.toDF("embedding")
    val jac = Pca.covarianceSpectrum(df, "embedding", topK = 2)
      .orderBy("rank").collect().map(_.getDouble(1))
    val pow = Pca.deflatedSpectrum(df, "embedding", topK = 2, rounds = 12)
      .orderBy("rank").collect()
    (0 until 2).foreach { i =>
      val ray = pow(i).getDouble(1)
      val resid = pow(i).getDouble(3)
      assert(math.abs(ray - jac(i)) <= math.max(1e-4 * jac(i), 1e-6),
        s"rank ${i + 1}: deflated $ray vs Jacobi ${jac(i)}")
      assert(resid < 1e-3, s"steep spectrum must converge; resid_rel=$resid")
    }
  }

  test("q_embed_pca: power estimates bounded by the Jacobi spectrum, certificates sane") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, dir).select(col("embedding"))
    val rows = graft.SparkEntry.queries("q_embed_pca")(spark, dir)
      .orderBy("rank").collect()
    assert(rows.length === 8)
    val jacTop = Pca.covarianceSpectrum(emb, "embedding", topK = 1)
      .head().getDouble(1)
    rows.foreach { r =>
      val eig = r.getDouble(1); val share = r.getDouble(2)
      val resid = r.getDouble(3); val trace = r.getDouble(4)
      // every Rayleigh quotient lies in [λ_min, λ_max] of its (deflated)
      // matrix, whose top is <= the original λ_max + accumulated
      // deflation error (bounded by the residuals seen so far)
      assert(eig > 0.0 && eig <= jacTop * 1.5 + 1e-6,
        s"rank ${r.getInt(0)}: estimate $eig vs Jacobi top $jacTop")
      assert(share >= 0.0 && math.abs(share - eig / trace) < 1e-5)
      assert(resid >= 0.0 && resid < 0.25,
        s"rank ${r.getInt(0)}: residual certificate $resid out of range")
    }
    assert(rows.map(_.getDouble(2)).sum <= 1.0 + 1e-9,
      "top-8 shares cannot exceed the whole trace")
  }

  test("q_embed_top_eigen: equals q_embed_pca rank 1 and is bounded by Jacobi") {
    val dir = "/root/testdata/sf0.001"
    val pe = graft.SparkEntry.queries("q_embed_top_eigen")(spark, dir).head()
    val ray = pe.getDouble(pe.fieldIndex("top_eig"))
    val resid = pe.getDouble(pe.fieldIndex("resid_rel"))
    val trace = pe.getDouble(pe.fieldIndex("trace"))
    // rank 1 of the deflated spectrum IS the same algorithm (ones start,
    // 12 max-norm rounds, Rayleigh) — bitwise equal after fp6
    val r1 = graft.SparkEntry.queries("q_embed_pca")(spark, dir)
      .orderBy("rank").head()
    assert(r1.getDouble(1) === ray, "q_embed_pca rank 1 must replay q_embed_top_eigen")
    assert(r1.getDouble(3) === resid)
    // the Rayleigh quotient of ANY vector lies in [λ_min, λ_max]
    val jacobiTop = Pca.covarianceSpectrum(
      graft.Tables.embeddings(spark, dir).select(col("embedding")),
      "embedding", topK = 1).head().getDouble(1)
    assert(ray <= jacobiTop + 1e-6, s"Rayleigh $ray exceeds λ_max $jacobiTop")
    assert(ray >= jacobiTop * 0.5,
      s"power iterate $ray too far below λ_max $jacobiTop for 12 rounds")
    assert(ray > trace / 64 - 1e-9, "estimate must beat the mean eigenvalue")
    assert(resid >= 0.0 && resid < 1.0, s"residual certificate $resid out of range")
  }
}
