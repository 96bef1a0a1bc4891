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

  test("damerau-levenshtein matches DuckDB (UNRESTRICTED variant) on reference pairs") {
    def dl(a: String, b: String): Int =
      StringMetricKernels.damerauLevenshtein(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // values probed from DuckDB damerau_levenshtein; ("ca","abc") = 2 is
    // the unrestricted-vs-OSA witness (OSA would answer 3)
    val ref = Seq(
      ("ca", "abc", 2), ("abcdef", "abcfad", 3), ("martha", "marhta", 1),
      ("kitten", "sitting", 3), ("abc", "abc", 0), ("", "abc", 3),
      ("abc", "", 3), ("spark", "sprak", 1))
    ref.foreach { case (a, b, expected) =>
      assert(dl(a, b) === expected, s"damerau($a, $b)")
      assert(dl(b, a) === expected, s"damerau symmetry ($a, $b)")
    }
  }

  test("hamming and char-jaccard kernels: DuckDB semantics") {
    def h(a: String, b: String): Int =
      StringMetricKernels.hamming(UTF8String.fromString(a), UTF8String.fromString(b))
    def j(a: String, b: String): Double =
      StringMetricKernels.charJaccard(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(h("abcde", "abcdf") === 1)           // DuckDB: hamming = 1
    assert(h("abc", "abc") === 0)
    assert(h("ab", "abc") === Int.MinValue)     // mismatch sentinel -> NULL
    assert(j("spark", "sprak") === 1.0)         // set semantics
    assert(j("aab", "ab") === 1.0)              // multiset collapses
    assert(j("abc", "xyz") === 0.0)
    assert(j("", "abc").isNaN)                  // empty sentinel -> NULL
    // SQL surface returns NULL for the sentinel cases
    import spark.implicits._
    val r = Seq(("ab", "abc")).toDF("a", "b")
      .selectExpr("graft_hamming(a, b)", "graft_char_jaccard('', b)").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
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
