package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[FixedPointKMeans.fitTwoLevel]]/[[FixedPointKMeans.assignTwoLevel]]
  * — the hierarchical (coarse √k → within-cell fine) fit: the dyn
  * kernel must agree bit-for-bit with the flat kernel, the two-level
  * assignment must equal a driver-side replay of both argmins, and the
  * registered query must keep the SemDeDup recall floor. */
class TwoLevelKMeansSpec extends SparkSpec {

  // deterministic pseudo-random 4-dim vectors in [-2, 2]
  private def vec(id: Long): Seq[Double] =
    (0 until 4).map(i => (((id * 37 + i * 101 + 13) % 400) - 200) / 100.0)

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i =>
      (i.toLong, FixedPointKMeans.quantizeLocal(vec(i.toLong))))
      .toDF("vec_id", "v")
  }

  test("graft_kmeans_assign_dyn equals the flat kernel on identical candidates") {
    import spark.implicits._
    val cents: Seq[(Int, Seq[Long])] = (0 until 5).map(j =>
      (j, FixedPointKMeans.quantizeLocal(vec(1000L + j)))).toSeq
    val ids = cents.map(_._1).toArray
    val flat = cents.flatMap(_._2).toArray
    val both = corpus(50)
      .withColumn("a", FixedPointKMeans.bestOf(col("v"), cents))
      .withColumn("b", call_function("graft_kmeans_assign_dyn",
        col("v"), typedLit(ids), typedLit(flat)))
    assert(both.filter($"a.j" =!= $"b.j" || $"a.d" =!= $"b.d").count() === 0L)
  }

  test("dyn kernel: empty candidates yield (-1, Long.MaxValue); dim mismatch throws") {
    import spark.implicits._
    val r = corpus(1).withColumn("b", call_function("graft_kmeans_assign_dyn",
      col("v"), typedLit(Array.empty[Int]), typedLit(Array.empty[Long]))).head()
    assert(r.getStruct(2).getInt(0) === -1)
    assert(r.getStruct(2).getLong(1) === Long.MaxValue)
    val ex = intercept[Exception] {
      corpus(1).withColumn("b", call_function("graft_kmeans_assign_dyn",
        col("v"), typedLit(Array(0)), typedLit(Array(1L, 2L)))).collect()
    }
    assert(causeMessages(ex).exists(_.contains("dims")), s"got $ex")
  }

  test("graft_kmeans_assign_f64 equals the declarative HOF argmin bit for bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    val cents: Seq[Seq[Double]] = (0 until 7).map(_ =>
      (0 until 16).map(_ => rnd.nextDouble() * 4 - 2))
    val df = (0 until 200).map(i =>
      (i.toLong, (0 until 16).map(_ => rnd.nextDouble() * 4 - 2)))
      .toDF("id", "v")
    // the exact declarative form cellOf replaced
    def sqDistCol(vec: org.apache.spark.sql.Column, c: Seq[Double]) =
      aggregate(zip_with(vec, typedLit(c), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    val dists = array(cents.map(c => sqDistCol($"v", c)): _*)
    val declarative = (array_position(dists, array_min(dists)) - 1).cast("int")
    val fused = IvfIndex.cellOf($"v", IvfIndex.Model(cents))
    assert(df.filter(declarative =!= fused).count() === 0L)
    // duplicate centroid: exact tie must keep the EARLIEST index in both
    val dup = cents.take(3) ++ Seq(cents(0)) // index 3 duplicates index 0
    val tie = df.select(IvfIndex.cellOf($"v", IvfIndex.Model(dup)).as("c"))
    assert(tie.filter($"c" === 3).count() === 0L, "tie must resolve to index 0")
  }

  test("f64 kernel: a NaN coordinate fails loudly (never phantom cell -1)") {
    import spark.implicits._
    val cents = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))
    val ex = intercept[Exception] {
      Seq((1L, Seq(Double.NaN, 0.5))).toDF("id", "v")
        .select(IvfIndex.cellOf($"v", IvfIndex.Model(cents)).as("c")).collect()
    }
    assert(causeMessages(ex).exists(_.contains("NaN")), s"got $ex")
  }

  test("f64 kernel: an INFINITE coordinate fails loudly too (Inf < Inf never fires)") {
    import spark.implicits._
    val cents = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))
    val ex = intercept[Exception] {
      Seq((1L, Seq(Double.PositiveInfinity, 0.5))).toDF("id", "v")
        .select(IvfIndex.cellOf($"v", IvfIndex.Model(cents)).as("c")).collect()
    }
    assert(causeMessages(ex).exists(_.contains("non-finite")), s"got $ex")
  }

  test("assignFine on an unseeded coarse cell fails loudly, never drops rows") {
    import spark.implicits._
    // fine centroids only for cell 0; a vector routed to cell 1 is a
    // contract breach — the guard must raise, not silently vanish the row
    val tl = FixedPointKMeans.TwoLevelCentroids(
      coarse = Seq(
        (0, FixedPointKMeans.quantizeLocal(Seq(0.0, 0.0))),
        (1, FixedPointKMeans.quantizeLocal(Seq(2.0, 2.0)))),
      kf = 2,
      fine = Seq((0, FixedPointKMeans.quantizeLocal(Seq(0.1, 0.1)))))
    val q = Seq((7L, FixedPointKMeans.quantizeLocal(Seq(2.0, 2.0))))
      .toDF("vec_id", "v")
    val ex = intercept[Exception] {
      FixedPointKMeans.assignTwoLevel(q, "v", tl).collect()
    }
    assert(causeMessages(ex).exists(_.contains("no fine centroids")), s"got $ex")
  }

  test("fitTwoLevel: fine ids stay inside their coarse cell and members agree") {
    val q = corpus(120).cache()
    val tl = FixedPointKMeans.fitTwoLevel(q, "vec_id", "v",
      kCoarse = 3, kf = 4, rounds = 2)
    // every fine centroid's global id decodes to a coarse cell the
    // coarse fit actually produced
    val coarseIds = tl.coarse.map(_._1).toSet
    tl.fine.foreach { case (fj, _) =>
      assert(coarseIds.contains(fj / tl.kf), s"fine $fj in unknown cell")
    }
    // members land in the fine cluster OF their coarse cell
    val asg = FixedPointKMeans.assignTwoLevel(q, "v", tl)
    val coarseOnly = FixedPointKMeans.assign(q, "v", tl.coarse)
      .select(col("vec_id"), col("cluster").as("cc_direct"))
    val joined = asg.join(coarseOnly, "vec_id")
      .filter(floor(col("cluster") / tl.kf) =!= col("cc_direct"))
    assert(joined.count() === 0L,
      "fine assignment crossed a coarse boundary")
    q.unpersist()
  }

  test("assignTwoLevel equals the driver-side two-stage argmin replay") {
    val q = corpus(80).cache()
    val tl = FixedPointKMeans.fitTwoLevel(q, "vec_id", "v",
      kCoarse = 3, kf = 3, rounds = 1)
    val got = FixedPointKMeans.assignTwoLevel(q, "v", tl)
      .select(col("vec_id"), col("cluster"), col("dist"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val fineByCell = tl.fine.groupBy(_._1 / tl.kf)
    (0 until 80).foreach { i =>
      val v = FixedPointKMeans.quantizeLocal(vec(i.toLong))
      // stage 1: flat argmin over coarse (ascending id keeps ties)
      val cc = tl.coarse.minBy { case (j, c) =>
        (FixedPointKMeans.sqDistLocal(v, c), j) }._1
      // stage 2: argmin over that cell's fine centroids only
      val (fj, d) = fineByCell(cc).map { case (j, c) =>
        (j, FixedPointKMeans.sqDistLocal(v, c)) }
        .minBy { case (j, d) => (d, j) }
      assert(got(i.toLong) === ((fj, d)), s"vec $i")
    }
    q.unpersist()
  }

  test("fine init seeds are the kf smallest ids per cell") {
    val q = corpus(60).cache()
    // rounds = 0: fit returns the seeds themselves
    val tl = FixedPointKMeans.fitTwoLevel(q, "vec_id", "v",
      kCoarse = 2, kf = 3, rounds = 0)
    val byCell = FixedPointKMeans.assign(q, "v", tl.coarse)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._2).map { case (cc, m) => (cc, m.map(_._1).sorted) }
    tl.fine.foreach { case (fj, c) =>
      val cc = fj / tl.kf
      val rank = fj % tl.kf
      val seedId = byCell(cc)(rank)
      assert(c === FixedPointKMeans.quantizeLocal(vec(seedId)),
        s"fine $fj should seed from vec $seedId")
    }
    q.unpersist()
  }

  test("fine init plans through the bounded-heap TopKPerKey, not a full-sort window") {
    val q = corpus(60).cache()
    val coarse = FixedPointKMeans.fit(q, "vec_id", "v", 2, 1)
    val asg = FixedPointKMeans.assign(q, "v", coarse)
      .select(col("vec_id"), col("v"), col("cluster").as("cc"))
    val plan = FixedPointKMeans.fineInit(asg, "vec_id", "v", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"plan lost the bounded heap:\n$plan")
    q.unpersist()
  }

  test("graft_kmeans_assign2: top-2 equals the (distance, candidate-order) rank replay") {
    val cents: Seq[(Int, Seq[Long])] = (0 until 7).map(j =>
      (j * 3, FixedPointKMeans.quantizeLocal(vec(1000L + j)))).toSeq
    val got = FixedPointKMeans.assignTop2(corpus(100), "v", cents)
      .select(col("vec_id"), col("cluster"), col("cluster2"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    (0 until 100).foreach { i =>
      val v = FixedPointKMeans.quantizeLocal(vec(i.toLong))
      // the oracle's replay: sort by (distance, candidate order), take 2
      val ranked = cents.map { case (j, c) =>
        (FixedPointKMeans.sqDistLocal(v, c), j) }.sorted.map(_._2)
      assert(got(i.toLong) === ((ranked(0), ranked(1))), s"vec $i")
    }
  }

  test("graft_kmeans_assign2: tie-breaks keep the earliest candidate in BOTH slots") {
    import spark.implicits._
    val c0 = FixedPointKMeans.quantizeLocal(Seq(1.0, 0.0))
    val cx = FixedPointKMeans.quantizeLocal(Seq(0.0, 1.0))
    // candidates 0 and 1 duplicate c0; 2 duplicates cx: the winner must
    // be 0 (earliest at distance 0) and the runner-up 1 (earliest of the
    // REMAINING, still at distance 0) — never 2
    val cents = Seq((10, c0), (11, c0), (12, cx))
    val r = Seq((1L, c0)).toDF("vec_id", "v")
      .select(FixedPointKMeans.best2Of(col("v"), cents).as("b")).head().getStruct(0)
    assert((r.getInt(0), r.getInt(2)) === ((10, 11)))
    assert((r.getLong(1), r.getLong(3)) === ((0L, 0L)))
    // single candidate: slot 2 stays at the zero-iteration accumulator
    val r1 = Seq((1L, c0)).toDF("vec_id", "v")
      .select(FixedPointKMeans.best2Of(col("v"), Seq((5, cx))).as("b"))
      .head().getStruct(0)
    assert(r1.getInt(0) === 5)
    assert(r1.getInt(2) === -1 && r1.getLong(3) === Long.MaxValue)
  }

  test("assignFine requireSeeded=false: unseeded runner-up cells contribute nothing") {
    import spark.implicits._
    val tlFine = Seq((0, FixedPointKMeans.quantizeLocal(Seq(0.1, 0.1))))
    // cell 1 has no fine centroids: inner-join mode drops the row
    // (legal for the secondary probe) instead of raising
    val q = Seq(
      (7L, FixedPointKMeans.quantizeLocal(Seq(2.0, 2.0)), 1),
      (8L, FixedPointKMeans.quantizeLocal(Seq(0.0, 0.0)), 0))
      .toDF("vec_id", "v", "cc")
    val rows = FixedPointKMeans.assignFine(q, "v", "cc", 2, tlFine,
      requireSeeded = false).select($"vec_id", $"fj").collect()
    assert(rows.map(_.getLong(0)).toSet === Set(8L))
    assert(rows.head.getInt(1) === 0)
  }

  test("multi-probe recall at sf0.01 recovers at least the single-probe 2l recall") {
    val mp = graft.analytics.CorpusStatsQueries.qSemdedup2lMp
      .run(spark, "/root/testdata/sf0.01").collect()
    val sp = graft.analytics.CorpusStatsQueries.qSemdedup2l
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(mp.nonEmpty && sp.nonEmpty)
    val mpPpm = mp.head.getAs[Long]("planted_drop_ppm")
    val spPpm = sp.head.getAs[Long]("planted_drop_ppm")
    // the union of memberships is a superset of the primary membership,
    // so the drop set — and with it the planted recall — can only grow
    assert(mpPpm >= spPpm, s"multi-probe $mpPpm < single-probe $spPpm")
    // conservation: stats stay keyed by the primary assignment
    val nMembers = mp.map(_.getAs[Long]("n_members")).sum
    val nPlanted = mp.head.getAs[Long]("n_planted")
    assert(nMembers === 500L + nPlanted)
  }

  test("router: flat at the measured sf1 point, two-level+mp at the measured sf10 point") {
    // the solo-bench measurements the threshold rests on (SCALING.md
    // round-13/14/15; BENCH_SF10_PROBE_MP.json): flat wins at
    // n = 22 500 (3.3 vs 5.4 s) through the round-15 bracket points
    // n = 67 500 (6.64 vs 6.90 s) and n = 101 250 (9.70 vs 10.51 s);
    // 2l_mp wins from n = 144 000 (12.18 vs 12.34 s) to n = 225 000
    // (19.0 vs 28.2 s AND +2.6 pp recall). The 1e5 threshold sits in
    // the measured plateau: the two sub-threshold points route flat,
    // the two decisive 2l_mp points route two-level, and the one
    // mis-routed bracket point (101 250 → 2l_mp at an 8% measured
    // cost, inside ambient scatter) buys the recall-winning path
    assert(!SemDeDup.routeTwoLevel(22500L))
    assert(!SemDeDup.routeTwoLevel(67500L))
    assert(SemDeDup.routeTwoLevel(101250L))
    assert(SemDeDup.routeTwoLevel(144000L))
    assert(SemDeDup.routeTwoLevel(225000L))
  }

  test("q_semdedup_auto at sf0.01 routes flat and matches q_semdedup row for row") {
    val auto = graft.analytics.CorpusStatsQueries.qSemdedupAuto
      .run(spark, "/root/testdata/sf0.01").collect()
    val flat = graft.analytics.CorpusStatsQueries.qSemdedup
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(auto.nonEmpty && auto.length === flat.length)
    auto.foreach(r => assert(r.getAs[String]("mode") === "flat"))
    auto.zip(flat).foreach { case (a, f) =>
      Seq("cluster", "n_members", "n_dropped", "n_planted", "planted_drop_ppm")
        .foreach(c => assert(a.getAs[Any](c) === f.getAs[Any](c), c))
    }
  }

  test("q_semdedup_2l at sf0.01: conservation and the planted recall floor hold") {
    val rows = graft.analytics.CorpusStatsQueries.qSemdedup2l
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val nMembers = rows.map(_.getAs[Long]("n_members")).sum
    val nDropped = rows.map(_.getAs[Long]("n_dropped")).sum
    val nPlanted = rows.head.getAs[Long]("n_planted")
    val ppm = rows.head.getAs[Long]("planted_drop_ppm")
    assert(nMembers === 500L + nPlanted)
    assert(nDropped <= nPlanted)
    assert(ppm === nDropped * 1000000L / nPlanted)
    // the hierarchical partition adds coarse boundaries clones can
    // split across, but the recall floor must stay in the flat fit's
    // regime (flat measured 984126 ppm at sf0.01)
    assert(ppm >= 900000L, s"planted_drop_ppm=$ppm")
  }
}
