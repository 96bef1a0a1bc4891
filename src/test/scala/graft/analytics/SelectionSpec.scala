package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Invariant coverage for the round-8 wave-3 operators beyond the DuckDB
  * hash gate: the decision-procedure properties a hash can't express
  * (monotonicity, prefix structure, coverage floors, bound checks). */
class SelectionSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"

  private def rows(name: String): Array[Row] =
    graft.SparkEntry.queries(name)(spark, Dir).collect()

  test("q_bh_fdr: the rejected set is a PREFIX of the p-sorted order") {
    val r = rows("q_bh_fdr") // already ordered by p_ppm
    val flags = r.map(x => x.getLong(x.fieldIndex("rejected")))
    // once a 0 appears, no 1 may follow — the defining step-up property
    val firstZero = flags.indexOf(0L)
    if (firstZero >= 0)
      assert(flags.drop(firstZero).forall(_ == 0L),
        s"BH rejections are not a prefix: ${flags.mkString(",")}")
    // p-values are valid ppm
    assert(r.forall { x =>
      val p = x.getLong(x.fieldIndex("p_ppm")); p >= 0L && p <= 1000000L
    })
  }

  test("q_conformal: finite-sample coverage lands near the 90% target in every stratum") {
    val r = rows("q_conformal")
    assert(r.length == 5)
    r.foreach { x =>
      val cov = x.getDouble(x.fieldIndex("coverage_pct"))
      val hw = x.getDouble(x.fieldIndex("halfwidth_usd"))
      assert(hw > 0.0, s"degenerate interval: $x")
      // conformal guarantee is E[coverage] >= 90%; with n_test ~ 150 a
      // 78% floor is > 4 sigma below target — failure means real breakage
      assert(cov >= 78.0 && cov <= 100.0, s"coverage out of band: $x")
    }
  }

  test("q_sprt: decisions are consistent with the LLR at the stop row") {
    rows("q_sprt").foreach { x =>
      val nTot = x.getLong(x.fieldIndex("n_total"))
      val nDec = x.getLong(x.fieldIndex("n_decision"))
      val llr = x.getLong(x.fieldIndex("llr_ppm_at_stop"))
      val d = x.getString(x.fieldIndex("decision"))
      assert(nDec >= 1L && nDec <= nTot)
      d match {
        case "accept_h1"  => assert(llr >= 2890372L)
        case "accept_h0"  => assert(llr <= -2251292L)
        case "undecided"  => assert(llr < 2890372L && llr > -2251292L && nDec == nTot)
        case other        => fail(s"unknown decision $other")
      }
    }
  }

  test("q_isotonic: the fitted curve is monotone non-decreasing and a [0,1] rate") {
    val r = rows("q_isotonic") // ordered by ventile
    val fit = r.map(x => x.getDouble(x.fieldIndex("fitted_rate")))
    // value-level bucketing keeps ties together — heavy ties can merge
    // a boundary, so the bucket count is data-dependent but near 20
    assert(fit.length >= 10 && fit.length <= 20)
    fit.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 1e-12, s"isotonic fit decreased: ${fit.mkString(",")}")
    }
    assert(fit.forall(v => v >= 0.0 && v <= 1.0))
    // pooling preserves the overall mean rate (PAVA is a projection):
    // the count-weighted means of raw and fitted agree to rounding noise
    val n = r.map(_.getLong(r.head.fieldIndex("n")))
    val raw = r.map(x => x.getDouble(x.fieldIndex("raw_rate")))
    val wRaw = n.zip(raw).map { case (c, v) => c * v }.sum / n.sum
    val wFit = n.zip(fit).map { case (c, v) => c * v }.sum / n.sum
    assert(math.abs(wRaw - wFit) < 1e-4, s"PAVA lost mass: $wRaw vs $wFit")
  }

  test("q_kendall_tau: tau-b bounded and sign-consistent with spearman") {
    val kt = rows("q_kendall_tau").head
    val tau = kt.getDouble(kt.fieldIndex("tau_b"))
    assert(tau >= -1.0 && tau <= 1.0)
    val sp = rows("q_spearman").head
    val rho = sp.getDouble(sp.fieldIndex("spearman_qty_price"))
    // both near-zero is fine; a strong disagreement in sign is not
    if (math.abs(rho) > 0.05)
      assert(tau * rho >= 0.0, s"tau $tau contradicts rho $rho")
  }

  test("q_permutation_test: p-value is a valid (k+1)/(B+1) rational") {
    val r = rows("q_permutation_test").head
    val p = r.getDouble(r.fieldIndex("p_value"))
    val k = r.getLong(r.fieldIndex("n_extreme"))
    assert(p >= 1.0 / 65.0 - 1e-9 && p <= 1.0)
    assert(math.abs(p - (k + 1.0) / 65.0) < 1e-6)
  }

  test("q_fellegi_sunter: full agreement outscores every other pattern") {
    val r = rows("q_fellegi_sunter") // ordered by score desc
    assert(r.length <= 16)
    val top = r.head
    Seq("a_name", "a_nation", "a_segment", "a_balance").foreach { f =>
      assert(top.getLong(top.fieldIndex(f)) == 1L,
        s"top-scoring pattern is not full agreement: $top")
    }
    // weights are field-separable: score strictly decreases when any
    // agreement bit drops (checked via the sorted order being strict)
    val scores = r.map(_.getLong(r.head.fieldIndex("score_ppm")))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("q_coreset: coverage radius is non-increasing in k") {
    val r = rows("q_coreset")
    val radii = r.map(_.getLong(r.head.fieldIndex("radius_q")))
    assert(radii.length == 8)
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"adding a center grew the radius: ${radii.mkString(",")}")
    }
    // all selected centers distinct
    val ids = r.map(_.getLong(r.head.fieldIndex("center_id")))
    assert(ids.distinct.length == ids.length)
  }

  test("q_dsir: the 20% quota is exact and selection respects it per corpus") {
    val r = rows("q_dsir")
    val nDocs = r.map(_.getLong(r.head.fieldIndex("n_docs"))).sum
    val nSel = r.map(_.getLong(r.head.fieldIndex("n_selected"))).sum
    assert(nSel == nDocs / 5, s"quota drifted: $nSel of $nDocs")
    r.foreach { x =>
      assert(x.getLong(x.fieldIndex("n_selected")) <= x.getLong(x.fieldIndex("n_docs")))
    }
  }

  test("q_compaction_plan: shards are contiguous from 0 and cover all bytes") {
    val r = rows("q_compaction_plan")
    val bySource = r.groupBy(_.getString(0))
    bySource.foreach { case (_, shards) =>
      val idx = shards.map(_.getLong(shards.head.fieldIndex("shard"))).sorted
      assert(idx.head == 0L && idx.zipWithIndex.forall { case (v, i) => v == i.toLong },
        s"shard indices not contiguous: ${idx.mkString(",")}")
    }
    val totalBytes = r.map(_.getLong(r.head.fieldIndex("bytes"))).sum
    val expected = graft.Tables.documents(spark, Dir)
      .agg(org.apache.spark.sql.functions.sum("n_chars")).head().getLong(0)
    assert(totalBytes == expected, s"plan lost bytes: $totalBytes vs $expected")
  }

  test("q_holt_winters: 24 forecast hours per series, finite values") {
    val r = rows("q_holt_winters")
    val byType = r.groupBy(_.getString(0))
    byType.foreach { case (t, hs) =>
      assert(hs.length == 24, s"$t has ${hs.length} forecast hours")
      assert(hs.forall { x =>
        val fc = x.getDouble(x.fieldIndex("fc")); !fc.isNaN && !fc.isInfinite
      })
    }
  }
}
