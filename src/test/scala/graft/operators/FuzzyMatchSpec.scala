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

  test("q-gram blocking catches head, MID and indel edits the prefix key misses") {
    import spark.implicits._
    val df = Seq(
      (1L, "acme-corp-01"),
      (2L, "bcme-corp-01"),  // head edit vs 1 — prefix blocking misses it
      (3L, "acme-xorp-01"),  // mid edit vs 1
      (4L, "acmecorp-01"),   // deletion vs 1 (indel)
      (5L, "zzz-unrelated")).toDF("id", "name")
    val pairs = FuzzyMatch.nameDupPairsQgram(df, "id", "name", maxDist = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((1L, 4L)),
      s"all three single-edit classes must block together, got $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "unrelated stays unpaired")
    // each candidate pair is verified once despite sharing many grams
    val verified = FuzzyMatch.nameDupPairsQgram(df, "id", "name", maxDist = 1)
      .select("id_a", "id_b").collect()
    assert(verified.length === verified.distinct.length, "no duplicate pair rows")
  }

  test("q-gram df-cap drops template grams, not the whole match") {
    import spark.implicits._
    // 200 templated names sharing every gram except the discriminative
    // tail digits; the planted pair differs in the FIRST char so only
    // gram blocking can see it, through the surviving low-df grams
    // (the "050" gram occurs in ~2 names; template grams occur in 200+
    // and are capped away)
    val base = (1L to 200L).map(i => (i, f"Customer#000000$i%03d"))
    val df = (base :+ (999L, "Xustomer#000000050")).toDF("id", "name")
    val pairs = FuzzyMatch.nameDupPairsQgram(df, "id", "name",
        maxDist = 1, maxBlock = 100)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((50L, 999L)),
      s"head-edit dup must survive via discriminative grams, got ${pairs.size} pairs")
  }
}
