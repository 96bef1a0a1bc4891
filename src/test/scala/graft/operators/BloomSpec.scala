package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi-join ≡ plain semi-join (no false negatives). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoinLong equals the plain left-semi join, row for row") {
    val big = (1L to 5000L).map(i => (i, i % 97)).toDF("id", "key")
    val small = Seq(3L, 17L, 42L, 96L, 1234L).toDF("k") // 1234 ∉ key domain
    val viaBloom = Bloom.semiJoinLong(big, "key", small, "k", expectedItems = 16, fpp = 0.05)
      .orderBy($"id").collect().map(_.getLong(0))
    val plain = big.join(broadcast(small.select($"k".as("key"))), Seq("key"), "left_semi")
      .orderBy($"id").collect().map(_.getLong(0))
    assert(viaBloom.sameElements(plain))
    assert(plain.nonEmpty) // non-vacuous: the keys 3/17/42/96 do occur
  }

  test("nulls on the probe side never match") {
    val big = Seq(Some(1L), None, Some(2L)).toDF("key")
    val small = Seq(1L).toDF("k")
    val got = Bloom.semiJoinLong(big, "key", small, "k", expectedItems = 4)
      .collect().map(_.get(0))
    assert(got.toSeq == Seq(1L))
  }

  test("a tiny undersized filter still returns the exact result") {
    // expectedItems deliberately far below reality: fpp degrades, the
    // confirm join must absorb every false positive
    val big = (1L to 2000L).toDF("key")
    val small = (1L to 1000L).filter(_ % 3 == 0).toDF("k")
    val n = Bloom.semiJoinLong(big, "key", small, "k", expectedItems = 2, fpp = 0.01).count()
    assert(n == 333)
  }
}
