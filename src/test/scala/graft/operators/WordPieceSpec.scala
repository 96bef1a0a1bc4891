package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WordPiece greedy longest-match semantics, vocab totality, and the
  * registered query's corpus-level invariants. */
class WordPieceSpec extends SparkSpec {

  private def enc(word: String, start: Seq[String], cont: Seq[String]): Seq[String] = {
    import spark.implicits._
    Seq(word).toDF("w")
      .select(WordPiece.encode($"w", WordPiece.Vocab(start, cont)).as("p"))
      .head().getSeq[String](0)
  }

  test("greedy longest-match-first with class-aware pieces") {
    assert(enc("unable", Seq("un", "u"), Seq("able", "a", "b", "l", "e"))
      === Seq("un", "##able"))
    // the 5-char start piece wins over shorter prefixes
    assert(enc("tables", Seq("table", "tab", "t"), Seq("s", "a", "b", "l", "e"))
      === Seq("table", "##s"))
  }

  test("a continuation-only piece never matches at word start") {
    // "able" exists ONLY as continuation: the start must fall back to singles
    assert(enc("able", Seq("a"), Seq("able", "b", "l", "e"))
      === Seq("a", "##b", "##l", "##e"))
  }

  test("non-BMP characters segment at code-point boundaries (no lone surrogates)") {
    // "𝕒" (U+1D552, MATHEMATICAL DOUBLE-STRUCK SMALL A) is a surrogate
    // pair in UTF-16; vocabs built from Spark/DuckDB codepoint substrings
    // contain the full pair, so a UTF-16-unit walker would slice it into
    // unmatched lone surrogates and falsely throw "unsegmentable"
    val a = "𝕒"
    assert(enc(s"${a}b", Seq(a, "b"), Seq("b")) === Seq(a, "##b"))
    // a multi-codepoint piece containing the pair must still win greedily
    assert(enc(s"x${a}y", Seq(s"x$a", "x"), Seq(a, "y")) === Seq(s"x$a", "##y"))
  }

  test("vocab without totality fails loudly, never emits a silent UNK") {
    val ex = intercept[Exception] {
      enc("ax", Seq("a"), Seq("b"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("totality")), s"got: $ex")
  }

  test("learnVocab includes every corpus char in both classes and ranks multis deterministically") {
    import spark.implicits._
    val w = Seq(("spark", 10L), ("spar", 5L), ("park", 3L)).toDF("word", "n")
    val v = WordPiece.learnVocab(w, "word", "n", topK = 4, maxLen = 4)
    // chars at word-initial positions: s, p; at continuation: p,a,r,k
    assert(Set("s", "p").subsetOf(v.startPieces.toSet))
    assert(Set("p", "a", "r", "k").subsetOf(v.contPieces.toSet))
    // every multi piece is 2..4 chars in its class form
    assert(v.startPieces.forall(p => p.length >= 1 && p.length <= 4))
    assert(v.contPieces.forall(p => p.length >= 1 && p.length <= 4))
    // determinism: same input → identical vocab
    val v2 = WordPiece.learnVocab(w, "word", "n", topK = 4, maxLen = 4)
    assert(v === v2)
  }

  test("q_wordpiece_encode: pieces reassemble the corpus, fertility is sane") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    val dir = "/root/testdata/sf0.001"
    val w = graft.Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("n"))
    val vocab = WordPiece.learnVocab(w, "token", "n", topK = 48, maxLen = 6)
    val encd = w.select($"token", WordPiece.encode($"token", vocab).as("pieces"))
      .collect()
    assert(encd.nonEmpty)
    encd.foreach { r =>
      val token = r.getString(0)
      val pieces = r.getSeq[String](1)
      // round-trip: stripping ## and concatenating recovers the word
      val rebuilt = pieces.head + pieces.tail.map { p =>
        assert(p.startsWith("##"), s"non-initial piece '$p' of '$token' lacks ##")
        p.drop(2)
      }.mkString
      assert(rebuilt === token, s"'$token' re-assembled as '$rebuilt'")
      assert(!pieces.head.startsWith("##"), s"initial piece of '$token' has ##")
    }
    // the registered query's headline number
    val rows = graft.analytics.DocQueries.qWordpieceEncode
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length === 40)
    val fert = rows.head.getAs[Long]("fertility_ppm")
    assert(fert >= 1000000L && fert <= 6000000L, s"fertility_ppm=$fert")
  }
}
