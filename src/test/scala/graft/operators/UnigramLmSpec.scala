package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram tokenizer: DP optimality (including a case greedy
  * longest-match gets wrong), the full tie-break chain, totality,
  * prune-and-rescore, and the registered query's invariants. */
class UnigramLmSpec extends SparkSpec {

  private def seg(word: String, v: Seq[(String, Long)]): Seq[String] = {
    import spark.implicits._
    Seq(word).toDF("w")
      .select(UnigramLm.segment($"w",
        UnigramLm.Vocab(v.map(_._1), v.map(_._2))).as("p"))
      .head().getSeq[String](0)
  }

  test("DP beats greedy longest-match: 'aabbb' splits aa+bbb, not aab+b+b") {
    // greedy takes the longest prefix 'aab' and strands 'bb' into singles
    // (3 pieces); the DP finds the 2-piece cover
    val v = Seq("aa" -> 10L, "aab" -> 10L, "bbb" -> 10L, "a" -> 1L, "b" -> 1L)
    assert(seg("aabbb", v) === Seq("aa", "bbb"))
  }

  test("equal piece count: higher total score wins") {
    val v = Seq("ab" -> 10L, "aba" -> 5L, "a" -> 1L, "b" -> 1L)
    // [ab, ab] scores 20 vs [aba, b] scores 6 — both 2 pieces
    assert(seg("abab", v) === Seq("ab", "ab"))
  }

  test("equal count and score: lexicographically smaller piece sequence wins") {
    val v = Seq("ab" -> 5L, "c" -> 5L, "a" -> 5L, "bc" -> 5L)
    // [a, bc] vs [ab, c]: both n=2, score=10; 'a' < 'ab'
    assert(seg("abc", v) === Seq("a", "bc"))
  }

  test("non-BMP characters segment at code-point boundaries (no lone surrogates)") {
    // "𝕒" is a UTF-16 surrogate pair; the DP must treat it as ONE
    // position — a code-unit walk would try lone-surrogate candidates
    // that no codepoint-substring vocab contains and throw
    val a = "𝕒"
    assert(seg(s"${a}b$a", Seq(a -> 1L, "b" -> 1L, s"${a}b" -> 10L))
      === Seq(s"${a}b", a))
  }

  test("unsegmentable word fails loudly") {
    val ex = intercept[Exception] { seg("ax", Seq("a" -> 1L)) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("unsegmentable")), s"got: $ex")
  }

  test("refit prunes unused multi-char pieces and keeps characters at score 0") {
    import spark.implicits._
    val segmented = Seq(
      ("spark", 10L, Seq("sp", "ark")),
      ("spar", 5L, Seq("sp", "ar"))).toDF("token", "n", "pieces")
    val v = UnigramLm.refit(segmented, "n", "pieces", chars = Seq("s", "p", "a", "r", "k"))
    val m = v.pieces.zip(v.scores).toMap
    assert(m("sp") === 15L)
    assert(m("ark") === 10L)
    assert(m("ar") === 5L)
    // characters unused by the segmentation stay for totality, at 0
    Seq("s", "p", "a", "r", "k").foreach(c => assert(m(c) === 0L, s"char $c"))
    // nothing else survives
    assert(v.pieces.toSet === Set("sp", "ark", "ar", "s", "p", "a", "r", "k"))
  }

  test("q_unigram_tokenizer: rounds converge to a total, reassembling segmentation") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    val w = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(TextAnalysis.tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("n"))
    val seed = UnigramLm.seedVocab(w, "token", "n", topK = 48, maxLen = 6)
    val chars = seed.pieces.filter(_.length == 1)
    val seg1 = w.select($"token", $"n", UnigramLm.segment($"token", seed).as("pieces"))
    val v2 = UnigramLm.refit(seg1, "n", "pieces", chars)
    // prune is real: round-2 vocab never exceeds the seed
    assert(v2.pieces.length <= seed.pieces.length)
    val seg2 = w.select($"token", UnigramLm.segment($"token", v2).as("pieces")).collect()
    seg2.foreach { r =>
      assert(r.getSeq[String](1).mkString === r.getString(0),
        s"'${r.getString(0)}' failed to reassemble")
    }
    val rows = graft.analytics.DocQueries.qUnigramTokenizer
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length === 40)
    val fert = rows.head.getAs[Long]("fertility_ppm")
    assert(fert >= 1000000L && fert <= 6000000L, s"fertility_ppm=$fert")
  }
}
