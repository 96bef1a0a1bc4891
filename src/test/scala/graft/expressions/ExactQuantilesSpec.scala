package graft.expressions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** ExactQuantiles must agree bit-for-bit with the built-in `percentile`
  * (same interpolating definition) — it exists purely as a faster state
  * representation. */
class ExactQuantilesSpec extends SparkSpec {

  test("matches built-in percentile on lineitem extendedprice") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.99, 1.0)
    val fast = li.agg(ExactQuantiles.quantiles(col("l_extendedprice"), ps))
      .collect()(0).getSeq[Double](0)
    val ref = li.agg(expr(
        "percentile(l_extendedprice, array(0.0D,0.25D,0.5D,0.75D,0.99D,1.0D))"))
      .collect()(0).getSeq[Double](0)
    assert(fast.size === ref.size)
    fast.zip(ref).foreach { case (a, b) => assert(a === b) }
  }

  test("null-only and empty inputs evaluate to null; nulls are skipped") {
    import spark.implicits._
    val mixed = Seq(Some(1.0), None, Some(3.0), None, Some(2.0)).toDF("v")
    val got = mixed.agg(ExactQuantiles.quantiles(col("v"), Seq(0.5)))
      .collect()(0).getSeq[Double](0)
    assert(got === Seq(2.0))
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    assert(allNull.agg(ExactQuantiles.quantiles(col("v"), Seq(0.5))).collect()(0).isNullAt(0))
    assert(allNull.filter($"v".isNotNull)
      .agg(ExactQuantiles.quantiles(col("v"), Seq(0.5))).collect()(0).isNullAt(0))
  }

  test("integer child is implicitly cast (no per-row ClassCastException)") {
    import spark.implicits._
    val got = Seq(1, 2, 3, 4).toDF("v")
      .agg(ExactQuantiles.quantiles(col("v"), Seq(0.5)))
      .collect()(0).getSeq[Double](0)
    assert(got === Seq(2.5))
  }

  test("single-row input returns that value at every percentage") {
    import spark.implicits._
    val one = Seq(42.5).toDF("v")
    val got = one.agg(ExactQuantiles.quantiles(col("v"), Seq(0.0, 0.5, 1.0)))
      .collect()(0).getSeq[Double](0)
    assert(got === Seq(42.5, 42.5, 42.5))
  }

  test("interpolation across partitions: quantile of 1..1000 shuffled") {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(
      scala.util.Random.shuffle((1 to 1000).toList), 13).toDF("v")
    val got = df.agg(ExactQuantiles.quantiles(col("v"), Seq(0.25, 0.5, 0.9)))
      .collect()(0).getSeq[Double](0)
    // pos = p*(n-1): 0.25*999 = 249.75 -> 250.75; 0.5*999 = 499.5 -> 500.5
    assert(got(0) === 250.75)
    assert(got(1) === 500.5)
    assert(math.abs(got(2) - 900.1) < 1e-9)
  }
}
