package graft.expressions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** KMV sketch accuracy + exactness below k + distributed merge. */
class KmvSketchSpec extends SparkSpec {

  test("exact below k") {
    import spark.implicits._
    val df = (1 to 100).map(i => i % 37).toDF("v")
    val got = df.agg(KmvSketch.kmvDistinct(col("v"), 256).as("d"))
      .collect()(0).getLong(0)
    assert(got === 37L)
  }

  test("estimates within ~3 standard errors above k") {
    import spark.implicits._
    val n = 50000
    val df = (1 to n).toDF("v").repartition(8) // force partial + merge paths
    val k = 256
    val got = df.agg(KmvSketch.kmvDistinct(col("v"), k).as("d"))
      .collect()(0).getLong(0)
    val se = 1.0 / math.sqrt(k - 2)
    assert(math.abs(got - n).toDouble / n < 3 * se,
      s"estimate $got for $n (rel err ${math.abs(got - n).toDouble / n})")
  }

  test("kmvJaccard estimates pairwise set overlap from sketches alone") {
    import spark.implicits._
    // two overlapping id sets: |A|=8000, |B|=8000, |A∩B|=4000 → J = 1/3
    val a = (1 to 8000).map(i => ("a", i.toLong))
    val b = (4001 to 12000).map(i => ("b", i.toLong))
    val df = (a ++ b).toDF("src", "v")
    val sk = df.groupBy($"src").agg(KmvSketch.kmvSet($"v", 256).as("sk"))
    val j = sk.as("x").join(sk.as("y"), col("x.src") < col("y.src"))
      .select(KmvSketch.kmvJaccard(col("x.sk"), col("y.sk"), 256).as("j"))
      .collect()(0).getDouble(0)
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"jaccard estimate $j vs 0.333")
  }

  test("PORTABLE hash family: estimates stay accurate (long AND string values)") {
    import spark.implicits._
    val n = 50000
    val df = (1 to n).toDF("v").repartition(8)
    val k = 256
    val se = 1.0 / math.sqrt(k - 2)
    // sequential longs — the adversarial input for a congruential hash
    val gotL = df.agg(KmvSketch.kmvDistinct(col("v"), k, portable = true).as("d"))
      .collect()(0).getLong(0)
    assert(math.abs(gotL - n).toDouble / n < 3 * se,
      s"portable long estimate $gotL for $n")
    // string values through the polynomial path
    val gotS = df.select(concat(lit("tok_"), col("v")).as("s"))
      .agg(KmvSketch.kmvDistinct(col("s"), k, portable = true).as("d"))
      .collect()(0).getLong(0)
    assert(math.abs(gotS - n).toDouble / n < 3 * se,
      s"portable string estimate $gotS for $n")
    // exactness below capacity is hash-family-independent
    val small = (1 to 100).map(i => i % 37).toDF("v")
    assert(small.agg(KmvSketch.kmvDistinct(col("v"), 256, portable = true))
      .collect()(0).getLong(0) === 37L)
  }

  test("group-wise sketches on the star schema vs exact") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val approx = li.groupBy(col("l_returnflag"))
      .agg(KmvSketch.kmvDistinct(col("l_orderkey"), 512).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, ex) =>
      val rel = math.abs(approx(g) - ex).toDouble / ex
      assert(rel < 0.15, s"group $g: $rel ($ex vs ${approx(g)})")
    }
  }
}
