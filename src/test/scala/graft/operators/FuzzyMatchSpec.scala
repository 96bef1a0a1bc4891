package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Blocking semantics of the fuzzy matcher: what the prefix key can and
  * cannot catch, and the df-cap rail on degenerate name columns. */
class FuzzyMatchSpec extends SparkSpec {

  test("tail-edit duplicates pair; head-edit duplicates are documented misses") {
    import spark.implicits._
    val df = Seq(
      (1L, "acme-corp-01"), (2L, "acme-corp-02"), // tail edit: same block
      (3L, "bcme-corp-01"), // head edit vs id 1: different block, missed
      (4L, "zzz-unrelated")).toDF("id", "name")
    val pairs = FuzzyMatch.nameDupPairs(df, "id", "name", maxDist = 1, tailDrop = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      "tail-edit pair found; head-edit pair is outside the blocking key by design")
  }

  test("a degenerate constant name column cannot go O(N^2): df-cap drops the block") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, "same-name-everywhere")).toDF("id", "name")
    val n = FuzzyMatch.nameDupPairs(df, "id", "name", maxDist = 1,
      tailDrop = 2, maxBlock = 100).count()
    assert(n === 0L, "over-full block must be dropped before the self-join")
  }

  test("levenshtein verify rejects same-block non-duplicates") {
    import spark.implicits._
    // same prefix block (tailDrop=2 strips '99'/'xy'), distance 2 > 1
    val df = Seq((1L, "prefix99"), (2L, "prefixxy")).toDF("id", "name")
    val n = FuzzyMatch.nameDupPairs(df, "id", "name", maxDist = 1, tailDrop = 2).count()
    assert(n === 0L)
  }
}
