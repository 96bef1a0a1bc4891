package graft.expressions

import graft.SparkSpec
import graft.operators.FixedPointKMeans
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The fixed-point native kernels (graft_kmeans_assign, graft_dot_long,
  * graft_eq_count) — bit-identity against the declarative HOF
  * formulations they replaced, plus the sharp edges (ties, empty
  * centroids, nulls, dimension mismatch). Raw seeded ScalaCheck Gen
  * (the scalatest bridge isn't in the offline cache). */
class FixedPointKernelsSpec extends SparkSpec {

  private def forAll[A, B](ga: Gen[A], gb: Gen[B], reps: Int = 8)(
      f: (A, B) => Unit): Unit =
    (1 to reps).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } f(a, b)
    }

  import org.apache.spark.sql.Column

  /** The ORIGINAL declarative argmin fold, kept as the kernel's
    * cross-check oracle (this was FixedPointKMeans.bestOf before the
    * fused kernel). */
  private def bestOfDeclarative(v: Column,
      cents: Seq[(Int, Seq[Long])]): Column = {
    val cs = array(cents.map { case (j, c) =>
      struct(lit(j).as("j"), typedLit(c).as("c")) }: _*)
    aggregate(cs, struct(lit(-1).as("j"), lit(Long.MaxValue).as("d")),
      (acc, cj) => {
        val dist = aggregate(zip_with(v, cj("c"), (a, b) => (a - b) * (a - b)),
          lit(0L), (s2, x) => s2 + x)
        when(dist < acc("d"), struct(cj("j").as("j"), dist.as("d")))
          .otherwise(acc)
      })
  }

  test("graft_kmeans_assign: bit-identical to the declarative fold on random input") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dims = 8
    val rows = (0 until 200).map(i =>
      (i.toLong, Seq.fill(dims)(rnd.nextInt(2000000).toLong)))
    // non-contiguous labels (Lloyd rounds can empty clusters)
    val cents = Seq(0, 2, 3, 7).map(j =>
      (j, Seq.fill(dims)(rnd.nextInt(2000000).toLong)))
    val df = rows.toDF("id", "v")
    val both = df.select($"id",
      FixedPointKMeans.bestOf($"v", cents).as("k"),
      bestOfDeclarative($"v", cents).as("h")).collect()
    both.foreach { r =>
      assert(r.getStruct(1) === r.getStruct(2), s"mismatch at id ${r.getLong(0)}")
    }
  }

  test("graft_kmeans_assign: distance tie keeps the EARLIEST candidate") {
    import spark.implicits._
    val c = Seq(5L, 5L)
    // two centroids at identical positions but labels 3 then 9:
    // strict < must keep 3 (array order), matching the HOF fold
    val cents = Seq((3, c), (9, c))
    val r = Seq((1L, Seq(7L, 1L))).toDF("id", "v")
      .select(FixedPointKMeans.bestOf($"v", cents).as("k")).head()
    assert(r.getStruct(0).getInt(0) === 3)
  }

  test("graft_kmeans_assign: empty centroid list yields the fold's zero accumulator") {
    import spark.implicits._
    val r = Seq((1L, Seq(7L, 1L))).toDF("id", "v")
      .select(FixedPointKMeans.bestOf($"v", Seq.empty).as("k")).head()
    assert(r.getStruct(0).getInt(0) === -1)
    assert(r.getStruct(0).getLong(1) === Long.MaxValue)
  }

  test("graft_kmeans_assign: dimension mismatch throws, never truncates") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq((1L, Seq(7L, 1L, 9L))).toDF("id", "v")
        .select(FixedPointKMeans.bestOf($"v", Seq((0, Seq(1L, 2L)))).as("k"))
        .collect()
    }
    assert(ex.getMessage.contains("dims") ||
      Option(ex.getCause).exists(_.getMessage.contains("dims")))
  }

  test("graft_dot_long: matches the zip_with fold, including null elements and overhang") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Long](2L, 3L, null), Seq[java.lang.Long](4L, 5L, 6L)),
      (2L, Seq[java.lang.Long](7L), Seq[java.lang.Long](2L, 100L)),
      (3L, Seq[java.lang.Long](-5L, 8L), Seq[java.lang.Long](3L, -2L))
    ).toDF("id", "a", "b")
    val got = df.select($"id",
        call_function("graft_dot_long", $"a", $"b").as("k"),
        aggregate(zip_with($"a", $"b", (x, y) => coalesce(x * y, lit(0L))),
          lit(0L), (acc, x) => acc + x).as("h"))
      .collect()
    got.foreach(r => assert(r.getLong(1) === r.getLong(2), s"id ${r.getLong(0)}"))
  }

  test("graft_eq_count: matches the when/zip_with fold on random signatures") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val a = Seq.fill(32)(rnd.nextInt(4).toLong)
      val b = Seq.fill(32)(rnd.nextInt(4).toLong)
      (i.toLong, a, b)
    }
    val got = rows.toDF("id", "a", "b").select($"id",
        call_function("graft_eq_count", $"a", $"b").as("k"),
        aggregate(zip_with($"a", $"b", (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).as("h"))
      .collect()
    got.foreach(r => assert(r.getInt(1) === r.getInt(2), s"id ${r.getLong(0)}"))
  }

  test("graft_eq_count: null elements and length overhang count 0; null array is null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Long](null, 2L, 3L), Seq[java.lang.Long](null, 2L, 4L)),
      (2L, Seq[java.lang.Long](5L, 6L), Seq[java.lang.Long](5L, 6L, 7L))
    ).toDF("id", "a", "b")
    val got = df.select($"id",
      call_function("graft_eq_count", $"a", $"b").as("k")).collect()
    assert(got.find(_.getLong(0) == 1L).get.getInt(1) === 1) // null==null is NOT a match
    assert(got.find(_.getLong(0) == 2L).get.getInt(1) === 2) // overhang ignored
    val nul = Seq((3L, null: Seq[java.lang.Long], Seq[java.lang.Long](1L)))
      .toDF("id", "a", "b")
      .select(call_function("graft_eq_count", $"a", $"b").as("k")).head()
    assert(nul.isNullAt(0))
  }

  test("graft_intcos_ge: exact boundary and the band around it route through the BigInteger fallback") {
    // dot = 3e12, na = 1e12, nb = 25e12 → cos = 0.6 EXACTLY: the double
    // fast path cannot separate lhs from rhs (relative diff 0) and must
    // fall through to the exact compare
    assert(IntCosGe.decide(3000000000000L, 1000000000000L, 25000000000000L, 3, 5))
    // one integer below the boundary: relative diff ~6.7e-13 is INSIDE
    // the 1e-12 guard band — only the exact fallback gets this right
    assert(!IntCosGe.decide(2999999999999L, 1000000000000L, 25000000000000L, 3, 5))
    assert(!IntCosGe.decide(-1L, 1L, 1L, 0, 1)) // negative dot never matches
    assert(!IntCosGe.decide(0L, 0L, 1L, 0, 1))  // zero norm never matches
    assert(IntCosGe.decide(0L, 1L, 1L, 0, 1))   // τ=0: any non-negative dot
  }

  test("graft_intcos_ge via SQL matches decide() and handles nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, java.lang.Long.valueOf(12L), java.lang.Long.valueOf(16L),
        java.lang.Long.valueOf(16L)),
      (2L, java.lang.Long.valueOf(12L), null.asInstanceOf[java.lang.Long],
        java.lang.Long.valueOf(16L))
    ).toDF("id", "dot", "na", "nb")
    val got = df.select($"id", call_function("graft_intcos_ge",
      $"dot", $"na", $"nb", lit(3L), lit(4L)).as("ge")).collect()
    // cos = 12/16 = 0.75 ≥ 3/4 exactly
    assert(got.find(_.getLong(0) == 1L).get.getBoolean(1))
    assert(got.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  test("property: graft_dot_long equals a driver-side exact dot on random vectors") {
    import spark.implicits._
    val gen = Gen.listOfN(16, Gen.chooseNum(-1000000L, 1000000L))
    forAll(gen, gen) { (a, b) =>
      val expected = a.zip(b).map { case (x, y) => x * y }.sum
      val got = Seq((a, b)).toDF("a", "b")
        .select(call_function("graft_dot_long", $"a", $"b")).head().getLong(0)
      assert(got === expected)
    }
  }
}
