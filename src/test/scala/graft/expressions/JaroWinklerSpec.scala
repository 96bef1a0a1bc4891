package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the JW kernel to DuckDB's jaro_winkler_similarity on reference
  * pairs computed directly in DuckDB (an independent C++ implementation
  * of the same jellyfish algorithm), plus the algebraic properties. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches DuckDB reference values bit-for-bit") {
    // values probed from: SELECT jaro_winkler_similarity(a, b) in DuckDB
    val ref = Seq(
      ("martha", "marhta", 0.9611111111111111),    // 1 transposition + prefix 3
      ("dixon", "dicksonx", 0.8133333333333332),   // prefix 2, boost applies
      ("jellyfish", "smellyfish", 0.8962962962962964), // no common prefix
      ("crate", "trace", 0.7333333333333334),      // above 0.7, prefix 0
      ("dwayne", "duane", 0.8400000000000001),
      ("spark", "sprak", 0.9466666666666665),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), ("a", "", 0.0), ("", "", 0.0), // DuckDB: empty -> 0
      ("ab", "ba", 0.0),                            // window 0: no matches
      ("abcdef", "abzzzz", 0.5555555555555555),    // jaro <= 0.7: NO boost
      ("aaaaaaaaaa", "aabbbbbbbb", 0.4666666666666666))
    ref.foreach { case (a, b, expected) =>
      assert(jw(a, b) === expected, s"jw($a, $b)")
    }
  }

  test("symmetry, range, and identity properties") {
    val words = Seq("customer", "cusotmer", "custom", "supplier", "x", "customer#1")
    for (a <- words; b <- words) {
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0)
      assert(v === jw(b, a), s"asymmetric on ($a, $b)")
      if (a == b) assert(v === 1.0)
    }
  }

  test("SQL registration and codegen path agree with the kernel") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("spark", "sprak"))
      .toDF("a", "b")
    val viaExpr = df.select(
      JaroWinklerExpr.jaroWinkler($"a", $"b")).collect().map(_.getDouble(0))
    val viaSql = df.selectExpr("graft_jaro_winkler(a, b)")
      .collect().map(_.getDouble(0))
    val direct = Seq(jw("martha", "marhta"), jw("dixon", "dicksonx"), jw("spark", "sprak"))
    assert(viaExpr.toSeq === direct)
    assert(viaSql.toSeq === direct)
    // null propagates
    val n = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
      .selectExpr("graft_jaro_winkler(a, b)").collect()(0)
    assert(n.isNullAt(0))
  }
}
