package graft.operators

import graft.SparkSpec
import graft.expressions.UnigramExpect
import org.apache.spark.sql.functions._

/** Soft-EM expectation kernel: posterior expected counts over ALL
  * segmentations — checked against a plain-double forward–backward
  * reference, plus the structural invariants (coverage mass, the
  * single-path degenerate case, code points) and the registered
  * query's hard-vs-soft divergence. */
class UnigramSoftEmSpec extends SparkSpec {

  private def expect(word: String, v: Seq[(String, Long)]): Map[String, Long] = {
    import spark.implicits._
    val vocab = UnigramLm.Vocab(v.map(_._1), v.map(_._2))
    val costs = UnigramLm.logCosts(vocab)
    Seq(word).toDF("w")
      .select(explode(UnigramLm.expect($"w", vocab, costs)).as("e"))
      .select($"e.p", $"e.mc").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
  }

  /** Plain-double forward–backward over code points — the textbook
    * E-step the fixed-point kernel approximates to ~0.3%. */
  private def reference(word: String, v: Seq[(String, Long)]): Map[String, Double] = {
    val total = v.map(_._2).sum.toDouble
    val prob = v.map { case (p, c) => p -> (math.max(c, 1L) / total) }.toMap
    val maxLen = v.map(_._1.length).max
    val L = word.length
    val a = Array.fill(L + 1)(0.0); a(0) = 1.0
    for (t <- 1 to L; l <- 1 to math.min(maxLen, t))
      prob.get(word.substring(t - l, t)).foreach(p => a(t) += a(t - l) * p)
    val b = Array.fill(L + 1)(0.0); b(L) = 1.0
    for (t <- (L - 1) to 0 by -1; l <- 1 to math.min(maxLen, L - t))
      prob.get(word.substring(t, t + l)).foreach(p => b(t) += p * b(t + l))
    val z = a(L)
    val acc = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    for (t <- 1 to L; l <- 1 to math.min(maxLen, t)) {
      val p = word.substring(t - l, t)
      prob.get(p).foreach(pp => acc(p) += a(t - l) * pp * b(t) / z)
    }
    acc.toMap
  }

  test("two-path lattice: posteriors match the closed form (3/4 vs 1/4)") {
    // vocab {a, b, ab} at equal count: P([ab]) = (1/3) / (1/3 + 1/9) = 3/4
    val got = expect("ab", Seq("a" -> 5L, "b" -> 5L, "ab" -> 5L))
    assert(math.abs(got("ab") - 750000L) <= 2000L, s"ab -> ${got("ab")}")
    assert(math.abs(got("a") - 250000L) <= 2000L, s"a -> ${got("a")}")
    assert(math.abs(got("b") - 250000L) <= 2000L, s"b -> ${got("b")}")
  }

  test("kernel tracks the plain-double reference within the quantization budget") {
    val v = Seq("s" -> 3L, "p" -> 9L, "a" -> 7L, "r" -> 2L, "k" -> 5L,
      "sp" -> 11L, "ar" -> 6L, "park" -> 4L, "spark" -> 8L, "spa" -> 1L)
    Seq("spark", "sparkspark", "parks").foreach { w =>
      val got = expect(w, v)
      val ref = reference(w, v)
      ref.foreach { case (p, e) =>
        val g = got.getOrElse(p, 0L) / UnigramExpect.WScale.toDouble
        assert(math.abs(g - e) <= math.max(0.004, e * 0.004),
          s"$w/$p: kernel $g vs reference $e")
      }
    }
  }

  test("coverage-mass invariant: expected lengths sum to the word length") {
    val v = Seq("a" -> 3L, "b" -> 2L, "ab" -> 4L, "ba" -> 1L, "aba" -> 2L)
    Seq("ababab", "aab", "ba").foreach { w =>
      val got = expect(w, v)
      val mass = got.map { case (p, mc) => p.length.toLong * mc }.sum
      val want = UnigramExpect.WScale * w.length
      // each DP cell contributes <= 0.5e-4 nats of quantization and each
      // occurrence weight one more rounding — ~0.1% of mass end to end
      assert(math.abs(mass - want) <= want / 1000L,
        s"$w: covered mass $mass vs ${want}")
    }
  }

  test("single-path word: every piece carries exactly one full expected use") {
    // only one segmentation exists -> posterior 1.0 exactly (the LSE of
    // a single candidate is exact: ln(exp(0)) = 0)
    val got = expect("xy", Seq("x" -> 3L, "y" -> 7L))
    assert(got === Map("x" -> UnigramExpect.WScale, "y" -> UnigramExpect.WScale))
  }

  test("non-BMP characters walk code points (no lone surrogates)") {
    val a = "𝕒"
    val got = expect(s"${a}b", Seq(a -> 2L, "b" -> 2L, s"${a}b" -> 2L))
    // same 3/4-1/4 lattice as the BMP case — the pair is ONE position
    assert(math.abs(got(s"${a}b") - 750000L) <= 2000L)
    assert(math.abs(got(a) - 250000L) <= 2000L)
  }

  test("unsegmentable word fails loudly") {
    val ex = intercept[Exception] { expect("ax", Seq("a" -> 1L)) }
    assert(causeMessages(ex).exists(_.contains("unsegmentable")), s"got: $ex")
  }

  test("forward-segmentable but backward-stuck word still fails loudly") {
    // vocab {a, ab}: forward covers 'ab' (A(1) via 'a', A(2) via 'ab'),
    // but nothing STARTS at 'b' — the backward pass must throw, never
    // feed an empty candidate set into the LSE (which would overflow
    // into garbage posteriors)
    val ex = intercept[Exception] { expect("ab", Seq("a" -> 1L, "ab" -> 1L)) }
    assert(causeMessages(ex).exists(_.contains("unsegmentable")), s"got: $ex")
  }

  test("softCounts: the overflow-null guard sits over the rollup, values stay non-null") {
    import spark.implicits._
    val v = UnigramLm.Vocab(Seq("ab", "a", "b"), Seq(5L, 3L, 2L))
    val costs = UnigramLm.logCosts(v)
    val sc = UnigramLm.softCounts(Seq(("ab", 2L)).toDF("w", "n"), "w", "n", v, costs)
    val rows = sc.collect()
    // normal regime: every piece that occurs rolls up to a NON-null count
    assert(rows.nonEmpty && rows.forall(!_.isNullAt(1)))
    // past the DECIMAL(38,0) envelope Spark's non-ANSI mode NULLs the
    // rollup, which a downstream coalesce(…, 0) would launder into a
    // plausible zero while the DuckDB oracle throws — the raise_error
    // guard must sit in the plan so overflow is equally loud here
    val plan = sc.queryExecution.analyzed.toString
    assert(plan.contains("raise_error"), s"overflow guard missing:\n${plan.take(600)}")
  }

  test("q_unigram_em_round at sf0.001: the vocab trajectory contracts toward a fixed point") {
    val WS = UnigramExpect.WScale
    val rows = graft.analytics.DocQueries.qUnigramEmRound
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val r0 = rows.head
    val (nSeed, nR1, nR2) = (r0.getAs[Long]("n_vocab_seed"),
      r0.getAs[Long]("n_vocab_r1"), r0.getAs[Long]("n_vocab_r2"))
    // the prune must actually prune (the seed's speculative top-K
    // substrings include pieces soft EM never commits a full use to),
    // and the trajectory can only contract: r2 filters r1 filters seed
    assert(nSeed > nR1, s"round-0 prune dropped nothing ($nSeed -> $nR1)")
    assert(nR1 >= nR2)
    rows.foreach { r =>
      val p = r.getAs[String]("piece")
      // every emitted piece SURVIVED the round-0 prune by the stated rule
      assert(p.length == 1 || r.getAs[Long]("soft_mc_r0") >= WS, s"'$p'")
      // totality: single chars are unprunable
      if (p.length == 1) assert(r.getAs[Long]("in_next") === 1L, s"'$p'")
      // in_next is exactly the next prune's rule applied to round 1
      val expected = if (r.getAs[Long]("soft_mc_r1") >= WS || p.length == 1) 1L else 0L
      assert(r.getAs[Long]("in_next") === expected, s"'$p'")
    }
  }

  test("q_unigram_em3 at sf0.001: monotone contraction, flag matches the last prune") {
    val rows = graft.analytics.DocQueries.qUnigramEm3
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 3)
    val nv = rows.map(_.getAs[Long]("n_vocab"))
    val np = rows.map(_.getAs[Long]("n_pruned"))
    // each round's vocab is the previous round's survivors
    assert(nv(1) === nv(0) - np(0))
    assert(nv(2) === nv(1) - np(1))
    // round 0 must agree with q_unigram_em_round's trajectory head
    val emr = graft.analytics.DocQueries.qUnigramEmRound
      .run(spark, "/root/testdata/sf0.001").head()
    assert(nv(0) === emr.getAs[Long]("n_vocab_seed"))
    assert(nv(1) === emr.getAs[Long]("n_vocab_r1"))
    assert(nv(2) === emr.getAs[Long]("n_vocab_r2"))
    val converged = rows.head.getAs[Long]("converged")
    assert(converged === (if (np(2) == 0L) 1L else 0L))
    // the top piece concentrates mass: never below its previous round
    // would be too strong (the vocab shrinks under it), but it must
    // always exist with positive expected mass
    rows.foreach(r => assert(r.getAs[Long]("top_soft_mc") > 0L))
  }

  test("q_unigram_soft_em at sf0.001: soft vocab strictly contains the hard vocab") {
    val rows = graft.analytics.DocQueries.qUnigramSoftEm
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val r0 = rows.head
    val (nSoft, nHard, nCommon) = (r0.getAs[Long]("n_vocab_soft"),
      r0.getAs[Long]("n_vocab_hard"), r0.getAs[Long]("n_common"))
    // soft expectation spreads mass over alternatives: every
    // Viterbi-used piece gets soft mass >= its hard commitment, so the
    // hard vocab embeds in the soft one; the gap is the pieces Viterbi
    // never commits to
    assert(nCommon === nHard, "a hard-vocab piece fell out of the soft vocab")
    assert(nSoft >= nHard)
    // every single char is in both (totality floor)
    rows.filter(r => r.getAs[String]("piece").length == 1).foreach { r =>
      assert(r.getAs[Long]("in_soft") === 1L)
      assert(r.getAs[Long]("in_hard") === 1L)
    }
  }
}
