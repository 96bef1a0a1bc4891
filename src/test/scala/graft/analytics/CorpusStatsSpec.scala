package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants the DuckDB hash gate can't see for the corpus-stats
  * family: KMeans partition/inertia properties, KL non-negativity,
  * Heaps monotonicity against a direct distinct count, Zipf shape. */
class CorpusStatsSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"

  test("q_kmeans: clusters partition the vectors; deterministic across runs") {
    val rows = graft.SparkEntry.queries("q_kmeans")(spark, Dir).collect()
    assert(rows.length <= 4 && rows.nonEmpty)
    val total = rows.map(_.getLong(rows.head.fieldIndex("n_members"))).sum
    val n = graft.Tables.embeddings(spark, Dir).count()
    assert(total === n, "every vector lands in exactly one cluster")
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("inertia")) >= 0.0,
        "inertia is a sum of squares")
    }
    val again = graft.SparkEntry.queries("q_kmeans")(spark, Dir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq,
      "fixed-point Lloyd must be run-to-run deterministic")
  }

  test("q_kmeans: integer Lloyd assignment matches a double-arithmetic argmin") {
    // the quantized integer argmin must agree with a plain double
    // nearest-centroid assignment computed directly from the SAME
    // centroids (quantization distorts distances by < 1ulp-of-1e-6 per
    // dim — ties aside, the argmin is unchanged)
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, Dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val init = emb.toSeq.sortBy(_._1).take(4).map(_._2)
    // one Lloyd round in doubles
    def nearest(cs: Seq[Array[Double]], v: Array[Double]): Int =
      cs.zipWithIndex.minBy { case (c, j) =>
        (c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, j)
      }._2
    val assign1 = emb.map { case (id, v) => id -> nearest(init, v) }
    val upd = (0 until 4).map { j =>
      val members = assign1.collect { case (id, jj) if jj == j => emb(id) }
      val d = members.head.length
      Array.tabulate(d)(i => members.map(_(i)).sum / members.size)
    }
    val assign2 = emb.map { case (id, v) => id -> nearest(upd, v) }
    val sizes = assign2.groupBy(_._2).view.mapValues(_.size).toMap
    // the registered query runs 2 integer update rounds then assigns;
    // compare ROUND-2 sizes (double path) vs the query's round-2 sizes
    // only loosely — quantization can flip knife-edge vectors, so allow
    // a small divergence budget rather than exact equality
    val q = graft.SparkEntry.queries("q_kmeans")(spark, Dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val drift = (0 until 4).map(j =>
      math.abs(q.getOrElse(j, 0L) - sizes.getOrElse(j, 0).toLong)).sum
    assert(drift <= emb.size / 10,
      s"integer vs double assignment drift $drift exceeds 10% of ${emb.size}")
  }

  test("FixedPointKMeans: duplicate-point init collapses clusters consistently") {
    // degenerate input — every vector identical: init yields k identical
    // centroids, the (distance, cluster) tie-break routes everything to
    // cluster 0, and the update SHRINKS the centroid list to the one
    // surviving cluster (the oracle's GROUP BY drops empties the same
    // way — the shrink must be deterministic, never an error)
    import spark.implicits._
    import graft.operators.FixedPointKMeans
    val df = Seq.tabulate(6)(i => (i.toLong, Seq.fill(4)(1.0)))
      .toDF("id", "embedding")
    val q = df.select($"id", FixedPointKMeans.quantize($"embedding").as("v"))
    val cents = FixedPointKMeans.fit(q, "id", "v", k = 4, rounds = 2)
    assert(cents.map(_._1) === Seq(0), s"expected single surviving cluster, got $cents")
    val clusters = FixedPointKMeans.assign(q, "v", cents)
      .select("cluster").distinct().collect().map(_.getInt(0)).toSeq
    assert(clusters === Seq(0))
  }

  test("FixedPointKMeans: NaN coordinate fails loudly on BOTH quantize paths") {
    // the range guard is written as NOT(in-range) precisely because the
    // naive (x < -16 || x > 16) form differs between engines on NaN
    // (Java IEEE: both false → silent pass; Spark totals-order: NaN is
    // greater-than-all → true). The negated form rejects NaN under
    // either semantics, keeping the two "bit-identical" paths identical
    // on exactly the invalid-input class the guard exists for.
    import spark.implicits._
    import graft.operators.FixedPointKMeans
    val bad = Seq((1L, Seq(0.5, Double.NaN, 0.25))).toDF("id", "embedding")
    val e = intercept[Exception] {
      bad.select(FixedPointKMeans.quantize($"embedding").as("v")).collect()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      FixedPointKMeans.quantizeLocal(Seq(0.5, Double.NaN, 0.25))
    }
    // and the in-range path still agrees bit-for-bit after the rewrite
    val ok = Seq((1L, Seq(-16.0, 0.123456, 16.0))).toDF("id", "embedding")
    val dist = ok.select(FixedPointKMeans.quantize($"embedding").as("v"))
      .collect().head.getSeq[Long](0)
    assert(dist === FixedPointKMeans.quantizeLocal(Seq(-16.0, 0.123456, 16.0)))
  }

  test("q_pq_recall: ADC ranking is consistent and recall is a sane fraction") {
    val rows = graft.SparkEntry.queries("q_pq_recall")(spark, Dir)
      .collect()
    assert(rows.length === 20)
    val dists = rows.map(_.getLong(rows.head.fieldIndex("adc_dist")))
    assert(dists.sameElements(dists.sorted), "ADC top-k must be ascending")
    assert(dists.forall(_ >= 0L), "integer squared distances are non-negative")
    val recall = rows.map(_.getLong(rows.head.fieldIndex("recall_ppm"))).distinct
    assert(recall.length === 1, "recall is one number for the whole result")
    assert(recall.head >= 0L && recall.head <= 1000000L)
    assert(recall.head % 50000L === 0L, "recall_ppm must be hits x 50000 exactly")
    // 4-byte codes on structureless synthetic embeddings: recall should
    // be far from 0 (codes carry signal) without being pinned to 1
    assert(recall.head >= 100000L,
      s"recall ${recall.head} ppm suspiciously low — encoding may be broken")
  }

  test("q_source_kl: divergences are non-negative and sources cover the corpus") {
    val rows = graft.SparkEntry.queries("q_source_kl")(spark, Dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("kl")) >= -1e-6,
        s"KL must be >= 0 for ${r.getString(0)}")
    }
    val totalToks = rows.map(_.getLong(rows.head.fieldIndex("n_tokens"))).sum
    import spark.implicits._
    val direct = graft.Tables.documents(spark, Dir)
      .select(explode(graft.functions.TextAnalysis.tokens($"text"))).count()
    assert(totalToks === direct)
  }

  test("q_heaps_law: cumulative vocab is monotone and ends at the true vocabulary size") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_heaps_law")(spark, Dir)
      .collect().sortBy(_.getInt(0))
    assert(rows.length === 10)
    val cv = rows.map(_.getLong(rows.head.fieldIndex("cum_vocab")))
    assert(cv.zip(cv.tail).forall { case (a, b) => a <= b }, "monotone growth")
    val trueVocab = graft.Tables.documents(spark, Dir)
      .select(explode(graft.functions.TextAnalysis.tokens($"text")).as("t"))
      .select($"t").distinct().count()
    assert(cv.last === trueVocab, s"${cv.last} vs $trueVocab")
    val docs = rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum
    assert(docs === graft.Tables.documents(spark, Dir).count())
  }

  test("q_zipf_fit: slope is non-positive and r2 is a valid fit quality") {
    import spark.implicits._
    val r = graft.SparkEntry.queries("q_zipf_fit")(spark, Dir).head()
    val vocab = graft.Tables.documents(spark, Dir)
      .select(explode(graft.functions.TextAnalysis.tokens($"text")).as("t"))
      .distinct().count()
    assert(r.getLong(r.fieldIndex("n_terms")) === math.min(200L, vocab))
    // frequencies are non-increasing in rank, so the fitted slope can
    // never be positive. The synthetic corpus is a ~31-token template
    // vocabulary, so the slope is NEAR-FLAT (≈ −0.18) — exactly the
    // "templated corpus" signal the query exists to surface; natural
    // text sits near −1.
    val slope = r.getDouble(r.fieldIndex("slope"))
    assert(slope <= 0.0 && slope > -3.0, s"slope $slope out of range")
    val r2 = r.getDouble(r.fieldIndex("r2"))
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 $r2 out of range")
  }
}
