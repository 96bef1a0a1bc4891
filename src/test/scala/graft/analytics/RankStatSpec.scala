package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant coverage for the rank-statistics family beyond the DuckDB
  * hash gate: properties a hash comparison can't express (bounds, known
  * closed-form values on constructed inputs, noise-mechanism sanity). */
class RankStatSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"

  test("q_spearman: rho in [-1,1] and matches built-in corr on the ranks") {
    val r = graft.SparkEntry.queries("q_spearman")(spark, Dir).head()
    val rho = r.getDouble(r.fieldIndex("spearman_qty_price"))
    assert(rho >= -1.0 && rho <= 1.0)
    // independent recomputation: Spark's CORR aggregate over the same
    // doubled-rank columns (float accumulation vs our exact decimal
    // moments) must agree to float tolerance
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, Dir).select($"l_quantity", $"l_extendedprice")
    def rank2(v: String) = li.groupBy(col(v)).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum($"c").over(
        org.apache.spark.sql.expressions.Window.orderBy(col(v))))
      .select(col(v), (lit(2L) * ($"cum" - $"c") + $"c" + lit(1L)).as(s"r_$v"))
    val direct = li.join(rank2("l_quantity"), "l_quantity")
      .join(rank2("l_extendedprice"), "l_extendedprice")
      .agg(corr($"r_l_quantity", $"r_l_extendedprice")).head().getDouble(0)
    assert(math.abs(rho - direct) < 1e-6, s"decimal-moment rho $rho vs corr $direct")
  }

  test("spearman rank kernel: perfect monotone map gives rho = 1 exactly") {
    // y = x^3 is nonlinear but strictly monotone: Pearson < 1, Spearman = 1.
    // Exercises the doubled-rank algebra end to end on a constructed input
    // (with ties in neither column) through the same moment formula.
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, i.toDouble * i * i)).toDF("x", "y")
    val n = df.count().toDouble
    val ranked = df // ranks ARE the values' order; reuse the query path via SQL-free check
    val rho = {
      val rx = ranked.selectExpr("x", "y",
        "2 * (rank() OVER (ORDER BY x) - 1) + 2 AS rx", // no ties: avgRank = rank
        "2 * (rank() OVER (ORDER BY y) - 1) + 2 AS ry")
      val m = rx.agg(
        sum($"rx" * $"ry").as("sxy"), sum($"rx").as("sx"), sum($"ry").as("sy"),
        sum($"rx" * $"rx").as("sxx"), sum($"ry" * $"ry").as("syy")).head()
      val (sxy, sx, sy, sxx, syy) =
        (m.getLong(0).toDouble, m.getLong(1).toDouble, m.getLong(2).toDouble,
          m.getLong(3).toDouble, m.getLong(4).toDouble)
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    assert(math.abs(rho - 1.0) < 1e-12)
  }

  test("q_mannwhitney: U within [0, n1*n2] and consistent with z sign") {
    val r = graft.SparkEntry.queries("q_mannwhitney")(spark, Dir).head()
    val n1 = r.getLong(r.fieldIndex("n1"))
    val n2 = r.getLong(r.fieldIndex("n2"))
    val u1 = r.getDouble(r.fieldIndex("u1"))
    val z = r.getDouble(r.fieldIndex("z"))
    assert(u1 >= 0.0 && u1 <= n1.toDouble * n2)
    // z and (U1 - mu) must share a sign
    val mu = n1.toDouble * n2 / 2.0
    assert((u1 - mu) * z >= 0.0)
  }

  test("q_auc: AUC in [0,1]; complement label flips it to 1-AUC") {
    val r = graft.SparkEntry.queries("q_auc")(spark, Dir).head()
    val auc = r.getDouble(r.fieldIndex("auc"))
    assert(auc >= 0.0 && auc <= 1.0)
    val npos = r.getLong(r.fieldIndex("n_pos"))
    val nneg = r.getLong(r.fieldIndex("n_neg"))
    assert(npos > 0 && nneg > 0, "both classes must be present for AUC")
    // complement symmetry, computed through the same rank identity:
    // AUC(pos) + AUC(neg-as-pos) = 1 under average-rank tie handling
    import spark.implicits._
    val scored = graft.Tables.documents(spark, Dir)
      .select(($"lang" =!= "en").cast("int").as("pos"),
        graft.functions.TextAnalysis.qualityScore($"text").as("q"))
    val ranks = scored.groupBy($"q").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum($"c").over(
        org.apache.spark.sql.expressions.Window.orderBy($"q")))
      .select($"q", (lit(2L) * ($"cum" - $"c") + $"c" + lit(1L)).as("r2"))
    val m = scored.join(ranks, "q").agg(
      sum($"pos".cast("long")).as("np"),
      sum(lit(1L) - $"pos".cast("long")).as("nn"),
      sum(when($"pos" === 1, $"r2").otherwise(lit(0L))).as("r2p")).head()
    val (np, nn, r2p) = (m.getLong(0), m.getLong(1), m.getLong(2))
    val aucFlipped = (r2p - np.toDouble * (np + 1)) / (2.0 * np * nn)
    assert(math.abs(auc + aucFlipped - 1.0) < 1e-6,
      s"AUC symmetry broken: $auc + $aucFlipped != 1")
  }

  test("q_bootstrap_ci: interval is ordered, brackets the point estimate, tight") {
    val r = graft.SparkEntry.queries("q_bootstrap_ci")(spark, Dir).head()
    val mean = r.getDouble(r.fieldIndex("mean_price"))
    val lo = r.getDouble(r.fieldIndex("ci_lo"))
    val hi = r.getDouble(r.fieldIndex("ci_hi"))
    assert(lo < hi, s"degenerate interval [$lo, $hi]")
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket mean $mean")
    // n=60k: the bootstrap SE of the mean is ~sigma/sqrt(n); the 95% CI
    // must be a small fraction of the mean, not a degenerate wide band
    assert((hi - lo) / mean < 0.05, s"CI width ${hi - lo} implausibly wide")
  }

  test("q_bm25: scores positive, descending, and hit docs contain a query term") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_bm25")(spark, Dir).collect()
    assert(rows.length === 20)
    val scores = rows.map(r => r.getDouble(r.fieldIndex("score_bm25")))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sortBy(-_)), "must be score-descending")
    val ids = rows.map(_.getLong(0))
    val hasTerm = graft.Tables.documents(spark, Dir)
      .filter($"doc_id".isin(ids: _*))
      .select($"doc_id",
        arrays_overlap(graft.functions.TextAnalysis.tokens($"text"),
          typedLit(Seq("hash", "join", "stream", "window"))).as("hit"))
      .collect()
    assert(hasTerm.forall(_.getBoolean(1)), "every ranked doc must contain a term")
  }

  test("q_mmr_diversify: 5 distinct picks, relevance-first, diversity-penalized") {
    val rows = graft.SparkEntry.queries("q_mmr_diversify")(spark, Dir).collect()
    assert(rows.length === 5)
    val ids = rows.map(r => r.getLong(r.fieldIndex("vec_id")))
    assert(ids.distinct.length === 5, "picks must be distinct")
    val rels = rows.map(r => r.getDouble(r.fieldIndex("rel")))
    val mmrs = rows.map(r => r.getDouble(r.fieldIndex("mmr")))
    // rank 1 is the pure-relevance argmax; later picks trade relevance
    // for diversity, so their mmr is strictly below their own relevance
    assert(mmrs(0) === rels(0))
    (1 until 5).foreach(i => assert(mmrs(i) < rels(i),
      s"pick $i must pay a diversity penalty"))
    // greedy invariant: the rank-2 pick maximizes 0.7*rel - 0.3*sim(to #1),
    // so no unpicked candidate may beat it (spot-check the ordering is real:
    // mmr scores are non-increasing down the selection)
    (1 until 4).foreach(i => assert(mmrs(i) >= mmrs(i + 1) - 1e-9))
  }

  test("q_ndcg: in (0,1], consistent with its own ppm terms") {
    val r = graft.SparkEntry.queries("q_ndcg")(spark, Dir).head()
    val dcg = r.getLong(r.fieldIndex("dcg_ppm"))
    val idcg = r.getLong(r.fieldIndex("idcg_ppm"))
    val ndcg = r.getDouble(r.fieldIndex("ndcg"))
    assert(idcg > 0 && dcg >= 0 && dcg <= idcg, s"dcg=$dcg idcg=$idcg")
    assert(math.abs(ndcg - dcg.toDouble / idcg) < 1e-6)
    // ideal DCG of gains 10..1 at positions 1..10 in ppm, computed directly
    val expIdcg = (1 to 10).map(i =>
      math.floor((11 - i) * 1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong).sum
    assert(idcg === expIdcg, s"idcg $idcg != closed-form $expIdcg")
  }

  test("q_anova: F >= 0, eta^2 in [0,1), and F agrees with a direct computation") {
    val r = graft.SparkEntry.queries("q_anova")(spark, Dir).head()
    val f = r.getDouble(r.fieldIndex("f_stat"))
    val eta = r.getDouble(r.fieldIndex("eta_sq"))
    assert(f >= 0.0 && eta >= 0.0 && eta < 1.0)
    // direct recomputation from per-group double moments (different
    // aggregation path; tolerance for float accumulation order)
    import spark.implicits._
    val g = graft.Tables.events(spark, Dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("double").as("n"), sum($"value").as("s"),
        sum($"value" * $"value").as("ss"))
      .collect()
    val nTot = g.map(_.getDouble(1)).sum
    val sTot = g.map(_.getDouble(2)).sum
    val grand = sTot * sTot / nTot
    val ssb = g.map(r0 => r0.getDouble(2) * r0.getDouble(2) / r0.getDouble(1)).sum - grand
    val sst = g.map(_.getDouble(3)).sum - grand
    val fDirect = (ssb / (g.length - 1)) / ((sst - ssb) / (nTot - g.length))
    assert(math.abs(f - fDirect) < 1e-3, s"F $f vs direct $fDirect")
  }

  test("q_adamic_adar: pairs non-adjacent, scores positive and consistent") {
    val rows = graft.SparkEntry.queries("q_adamic_adar")(spark, Dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue())
      assert(a < b, "pair must be ordered")
      val nCommon = r.getLong(r.fieldIndex("n_common"))
      val ppm = r.getLong(r.fieldIndex("aa_ppm"))
      // each common neighbor contributes at most 1/ln(2) and at least
      // 1/ln(maxDeg): aa_ppm must sit inside those integer-ppm envelopes
      assert(ppm > 0 && ppm <= math.floor(nCommon * 1e6 / math.log(2.0) + 0.5),
        s"pair ($a,$b) ppm $ppm out of envelope for $nCommon common")
    }
  }

  test("q_cdc_chunks: chunk accounting closes against the token count") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_cdc_chunks")(spark, Dir).collect()
    assert(rows.length === 20) // one row per source
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_chunks"))
      val d = r.getLong(r.fieldIndex("n_distinct"))
      assert(d > 0 && d <= n)
      val avg = r.getDouble(r.fieldIndex("avg_chunk_tokens"))
      // modulus 16 -> expected length 16; allow a generous band
      assert(avg > 4.0 && avg < 64.0, s"implausible avg chunk length $avg")
    }
    // total chunk tokens across sources == total corpus tokens (no token
    // lost or duplicated by the boundary rule)
    val totTokens = graft.Tables.documents(spark, Dir)
      .select(size(graft.functions.TextAnalysis.tokens($"text")).cast("long").as("n"))
      .agg(sum($"n")).head().getLong(0)
    val chunkTokens = rows.map(r =>
      math.round(r.getDouble(r.fieldIndex("avg_chunk_tokens")) *
        r.getLong(r.fieldIndex("n_chunks")))).sum
    assert(math.abs(chunkTokens - totTokens) <= rows.length,
      s"chunk token mass $chunkTokens vs corpus $totTokens")
  }

  test("q_theil_sen and q_mk_trend: robust pair agrees with itself and with OLS direction") {
    val ts = graft.SparkEntry.queries("q_theil_sen")(spark, Dir).collect()
    val mk = graft.SparkEntry.queries("q_mk_trend")(spark, Dir).collect()
    assert(ts.length === 5 && mk.length === 5)
    val mkByType = mk.map(r => r.getString(0) -> r).toMap
    ts.foreach { r =>
      val t = r.getString(0)
      val nDays = r.getLong(r.fieldIndex("n_days"))
      val nPairs = r.getLong(r.fieldIndex("n_pairs"))
      assert(nPairs === nDays * (nDays - 1) / 2, s"$t pair count wrong")
      val slope = r.getDouble(r.fieldIndex("slope"))
      val m = mkByType(t)
      val s = m.getLong(m.fieldIndex("s_stat"))
      // Theil-Sen slope and Mann-Kendall S share a sign by construction
      // (S counts the same pairwise differences the slopes divide)
      assert(slope * s >= 0.0, s"$t: slope $slope vs S $s disagree on direction")
      assert(math.abs(s) <= nPairs, s"$t: |S| cannot exceed pair count")
      val z = m.getDouble(m.fieldIndex("z"))
      val varS = m.getDouble(m.fieldIndex("var_s"))
      assert(varS > 0.0)
      assert(z * s >= 0.0, s"$t: z sign must follow S")
    }
  }

  test("theil-sen median is outlier-robust where OLS is not") {
    // y = 2x with one catastrophic outlier: OLS slope moves far from 2,
    // the pairwise-slope median stays exactly 2 (same formula shape as
    // the query: explicit middle order statistics of pairwise slopes)
    import spark.implicits._
    val pts = ((0 until 30).map(i => (i.toLong, 2L * i)) :+ (30L, 100000L))
      .toDF("x", "y")
    val p = pts.as("a").join(pts.as("b"), col("a.x") < col("b.x"))
      .select(((col("b.y") - col("a.y")).cast("double") /
        (col("b.x") - col("a.x"))).as("slope"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"slope")
    val ranked = p.withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val med = ranked.filter($"rn" === (($"np" + 1) / 2).cast("long") ||
        $"rn" === (($"np" + 2) / 2).cast("long"))
      .agg(avg($"slope")).head().getDouble(0)
    assert(med === 2.0, s"robust median slope $med != 2.0")
    val ols = pts.agg(
      (count(lit(1)) * sum($"x" * $"y") - sum($"x") * sum($"y")).cast("double") /
        (count(lit(1)) * sum($"x" * $"x") - sum($"x") * sum($"x"))).head().getDouble(0)
    assert(math.abs(ols - 2.0) > 10.0, s"OLS $ols should be wrecked by the outlier")
  }

  test("q_skyline: window formulation equals the brute-force NOT-EXISTS dominance check") {
    import spark.implicits._
    val sky = graft.SparkEntry.queries("q_skyline")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(sky.nonEmpty)
    // frontier shape: along ascending price, sizes strictly increase
    val sizes = sky.sortBy(x => (x._2, x._1)).map(_._3)
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a < b },
      s"frontier sizes must strictly increase: ${sizes.mkString(",")}")
    // brute force on the same data (n=2000: the O(n^2) check is fine here)
    val pts = graft.Tables.part(spark, Dir)
      .select($"p_partkey", $"p_retailprice", $"p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = pts.filter { case (k, p, sz) =>
      !pts.exists { case (k2, p2, sz2) =>
        k2 != k && p2 <= p && sz2 >= sz && (p2 < p || sz2 > sz)
      }
    }.map(_._1).toSet
    assert(sky.map(_._1).toSet === brute,
      s"window skyline ${sky.map(_._1).toSet} != brute force $brute")
  }

  test("q_rrf_fusion: ppm terms reproduce the ranks; ordering is total") {
    val rows = graft.SparkEntry.queries("q_rrf_fusion")(spark, Dir).collect()
    assert(rows.length === 20)
    def ppm(rank: Any): Long = rank match {
      case null => 0L
      case i: Int => math.floor(1e6 / (60 + i) + 0.5).toLong
    }
    rows.foreach { r =>
      val expected = ppm(r.get(r.fieldIndex("rank_bm25"))) +
        ppm(r.get(r.fieldIndex("rank_quality")))
      assert(r.getLong(r.fieldIndex("rrf_ppm")) === expected)
      assert(r.get(r.fieldIndex("rank_bm25")) != null ||
        r.get(r.fieldIndex("rank_quality")) != null,
        "a fused row must come from at least one system")
    }
    val ppms = rows.map(_.getLong(rows.head.fieldIndex("rrf_ppm")))
    assert(ppms.zip(ppms.tail).forall { case (a, b) => a >= b },
      "fusion output must be score-descending")
  }

  test("q_huber_mean: sits between median and mean on right-skewed spend") {
    val r = graft.SparkEntry.queries("q_huber_mean")(spark, Dir).head()
    val med = r.getDouble(r.fieldIndex("median"))
    val hub = r.getDouble(r.fieldIndex("mu_huber"))
    val mean = r.getDouble(r.fieldIndex("mean_plain"))
    val c = r.getDouble(r.fieldIndex("clip_width"))
    assert(c > 0.0)
    // spend is right-skewed: the robust location must be pulled DOWN
    // from the mean toward the median, but not past it
    assert(mean > med, "precondition: skewed data")
    assert(hub < mean && hub > med,
      s"huber $hub must sit strictly between median $med and mean $mean")
  }

  test("q_raking: both margins converge to uniform targets, mass is conserved") {
    val rows = graft.SparkEntry.queries("q_raking")(spark, Dir).collect()
    assert(rows.length === 25)
    val n = rows.map(r => r.getLong(r.fieldIndex("n"))).sum.toDouble
    val target = n / 5.0
    val bySeg = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(r => r.getDouble(r.fieldIndex("weight"))).sum }
    val byReg = rows.groupBy(_.getString(1))
      .map { case (_, rs) => rs.map(r => r.getDouble(r.fieldIndex("weight"))).sum }
    bySeg.foreach(s => assert(math.abs(s - target) / target < 1e-3,
      s"row margin $s vs target $target"))
    byReg.foreach(s => assert(math.abs(s - target) / target < 1e-3,
      s"col margin $s vs target $target"))
    val mass = rows.map(r => r.getDouble(r.fieldIndex("weight"))).sum
    assert(math.abs(mass - n) / n < 1e-3, s"total mass $mass vs $n")
    rows.foreach(r => assert(r.getLong(r.fieldIndex("row_err_ppm")) < 1000,
      "reported row error must certify convergence under 0.1%"))
  }

  test("q_dp_counts: noise is bounded, keyed, and nonzero somewhere") {
    val rows = graft.SparkEntry.queries("q_dp_counts")(spark, Dir).collect()
    assert(rows.length === 5)
    var anyNoise = false
    rows.foreach { r =>
      val nTrue = r.getLong(r.fieldIndex("n_true")).toDouble
      val nNoisy = r.getDouble(r.fieldIndex("n_noisy"))
      // Laplace(b=1) inverse-CDF from u in (0,1): |noise| <= ln(P) ~ 20.7
      assert(math.abs(nNoisy - nTrue) <= 21.0,
        s"noise out of the inverse-CDF range for ${r.getString(0)}")
      if (nNoisy != nTrue) anyNoise = true
    }
    assert(anyNoise, "at least one group must receive nonzero noise")
    // determinism: same key -> same noise on a rerun
    val again = graft.SparkEntry.queries("q_dp_counts")(spark, Dir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }
}
