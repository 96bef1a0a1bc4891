package graft.analytics

import graft.SparkSpec

/** Behavioral invariants of the round-15 retrieval/curation audits
  * beyond their hash oracles: the properties that must hold for ANY
  * corpus (monotonicity, bounds, cross-query consistency), asserted on
  * the gated testdata so a future parameter change that silently
  * breaks the audit's meaning — not just its hash — fails here. */
class RetrievalAuditSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"

  test("q_prefix_dim_recall: recall is monotone in the prefix and exact at full d") {
    val rows = graft.SparkEntry.queries("q_prefix_dim_recall")(spark, Dir)
      .collect()
    val byD = rows.groupBy(_.getAs[Long]("prefix_d")).map { case (d, rs) =>
      val rec = rs.map(_.getAs[Long]("recall_ppm")).distinct
      assert(rec.length == 1, s"prefix $d: recall differs within the block")
      (d, rec.head)
    }.toSeq.sortBy(_._1)
    assert(byD.map(_._1) == Seq(16L, 32L, 64L))
    // a longer prefix sees strictly more of every true distance: its
    // top-20 can only agree more with the full ranking on THIS ladder
    // (not a theorem for adversarial data — asserted as a property of
    // the gated corpora, where it held at every SF measured)
    assert(byD.map(_._2) == byD.map(_._2).sorted,
      s"recall not monotone in prefix: $byD")
    assert(byD.last._2 == 1000000L, "full-dimension rung must be the identity")
  }

  test("q_intrinsic_dim: estimate is positive, finite, and at most ambient d") {
    val r = graft.SparkEntry.queries("q_intrinsic_dim")(spark, Dir)
      .collect().head
    val nSlice = r.getAs[Long]("n_slice")
    val nUsed = r.getAs[Long]("n_used")
    val id = r.getAs[Double]("id_twonn")
    assert(nUsed > 0 && nUsed <= nSlice, s"n_used $nUsed of $nSlice")
    assert(!id.isNaN && !id.isInfinite && id > 0.0, s"degenerate estimate $id")
    // TwoNN can overshoot ambient d on noise, but not by much; a value
    // far above d means the ratio sum collapsed (duplicate handling bug)
    assert(id <= 64.0 * 1.5, s"estimate $id far above ambient 64")
  }

  test("q_semdedup_sweep: monotone in tau and consistent with q_semdedup at 0.9") {
    val sweep = graft.SparkEntry.queries("q_semdedup_sweep")(spark, Dir)
      .collect().sortBy(_.getAs[Long]("tau_pct"))
    assert(sweep.map(_.getAs[Long]("tau_pct")).toSeq ==
      Seq(50L, 80L, 90L, 95L, 99L))
    // raising tau can only shrink both the pair surface and the drop set
    val pairs = sweep.map(_.getAs[Long]("n_pairs")).toSeq
    val drops = sweep.map(_.getAs[Long]("n_dropped")).toSeq
    assert(pairs == pairs.sorted.reverse, s"n_pairs not antitone: $pairs")
    assert(drops == drops.sorted.reverse, s"n_dropped not antitone: $drops")
    val corpusN = drops.zip(sweep.map(_.getAs[Long]("n_survivors")))
      .map { case (d, s) => d + s }.distinct
    assert(corpusN.length == 1, s"dropped+survivors differs across rungs: $corpusN")
    sweep.foreach { r =>
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_pairs"),
        "distinct dropped ids cannot exceed surviving pairs")
    }
    // cross-query consistency: the 0.90 rung IS q_semdedup's drop set
    val semTotal = graft.SparkEntry.queries("q_semdedup")(spark, Dir)
      .groupBy().sum("n_dropped").collect().head.getLong(0)
    val rung90 = sweep.find(_.getAs[Long]("tau_pct") == 90L).get
    assert(rung90.getAs[Long]("n_dropped") == semTotal,
      s"sweep@0.90 ${rung90.getAs[Long]("n_dropped")} != q_semdedup $semTotal")
  }

  test("q_ivf_probe_sweep: recall monotone and mass strictly increasing in nprobe") {
    val rows = graft.SparkEntry.queries("q_ivf_probe_sweep")(spark, Dir)
      .collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size > 1, "expected a multi-query batch")
    byQ.foreach { case (qid, qr) =>
      val ladder = qr.sortBy(_.getAs[Long]("nprobe"))
        .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("n_cand"),
          r.getAs[Long]("recall_ppm"))).toSeq
      assert(ladder.map(_._1) == Seq(1L, 2L, 4L), s"qid=$qid: $ladder")
      // a deeper probe's candidate set is a superset, and any candidate
      // that displaces an exact-top-20 member from the served list must
      // itself be exact-top-20 (cosine is the global order, tie-breaks
      // shared) — so recall can only rise; mass strictly rises because
      // probed cells are nonempty at these corpus sizes
      assert(ladder.map(_._2) == ladder.map(_._2).sorted &&
        ladder.map(_._2).distinct.length == ladder.length,
        s"qid=$qid: candidate mass not strictly increasing: $ladder")
      assert(ladder.map(_._3) == ladder.map(_._3).sorted,
        s"qid=$qid: recall not monotone in nprobe: $ladder")
    }
  }

  test("q_opq_recall: same budget, same query, both recalls in range") {
    val opq = graft.SparkEntry.queries("q_opq_recall")(spark, Dir).collect()
    val pq = graft.SparkEntry.queries("q_pq_recall")(spark, Dir).collect()
    assert(opq.length == pq.length, "the two audits must rank the same k")
    Seq(opq, pq).foreach { rows =>
      val rec = rows.map(_.getAs[Long]("recall_ppm")).distinct
      assert(rec.length == 1 && rec.head >= 0L && rec.head <= 1000000L)
    }
    // the permutation must not lose or duplicate ids: top-k ids unique
    assert(opq.map(_.getAs[Long]("vec_id")).distinct.length == opq.length)
  }
}
