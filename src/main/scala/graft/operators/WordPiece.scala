package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece vocabulary learning + encoding (Wu et al. 2016) — the
  * second major subword family next to [[Bpe]]: where BPE LEARNS by
  * iterative pair merging and encodes by replaying merges, WordPiece
  * encodes by greedy longest-match against a fixed two-class vocab
  * (word-initial vs `##`-continuation pieces).
  *
  * Vocabulary model (deterministic, oracle-replayable): the vocab is
  * the corpus's own substring statistics — every word-internal
  * substring of length 2..maxLen, classed by position (word-initial or
  * not), weighted by word frequency; the top-K by (weighted count
  * DESC, display ASC) become the multi-char pieces, and every corpus
  * character is included in BOTH classes so segmentation is total.
  * (Production WordPiece trains by likelihood; the substring-frequency
  * vocab keeps the entire learn step one declarative rollup while
  * exercising the identical ENCODER contract.)
  *
  * Scale shape: learning runs on the DISTINCT-word relation (vocab ×
  * ~len·maxLen substring grid — vocabulary-sized, never the corpus);
  * the driver holds topK + alphabet strings. Encoding is the BPE
  * pattern: a map-side native kernel
  * ([[graft.expressions.WordPieceEncode]]) over the distinct vocab,
  * broadcast-joined back to the token stream — encode cost scales with
  * the vocabulary, not the 100 TB corpus. */
object WordPiece {

  final case class Vocab(startPieces: Seq[String], contPieces: Seq[String])

  /** Learn the vocab from a (word, freq) relation. */
  def learnVocab(words: DataFrame, wordCol: String, freqCol: String,
      topK: Int, maxLen: Int): Vocab = {
    require(topK >= 0 && maxLen >= 2, s"topK=$topK maxLen=$maxLen")
    val w = words.select(col(wordCol).as("w"), col(freqCol).cast("long").as("n"))
    val grid = w
      .select(col("w"), col("n"), explode(expr("sequence(1, length(w))")).as("i"))
      .select(col("w"), col("n"), col("i"),
        explode(expr(s"sequence(2, $maxLen)")).as("l"))
      .filter(col("i") + col("l") - lit(1) <= length(col("w")))
      .select(when(col("i") === 1, expr("substring(w, i, l)"))
        .otherwise(concat(lit("##"), expr("substring(w, i, l)"))).as("display"),
        col("n"))
    val multi = grid.groupBy(col("display")).agg(sum(col("n")).as("c"))
      .orderBy(col("c").desc, col("display")).limit(topK)
      .select(col("display")).collect().map(_.getString(0)).toSeq
    val startSingles = w.select(substring(col("w"), 1, 1).as("c"))
      .distinct().collect().map(_.getString(0)).toSeq
    val contSingles = w.filter(length(col("w")) >= 2)
      .select(explode(expr("sequence(2, length(w))")).as("i"), col("w"))
      .select(expr("substring(w, i, 1)").as("c"))
      .distinct().collect().map(_.getString(0)).toSeq
    Vocab(
      startPieces = (multi.filterNot(_.startsWith("##")) ++ startSingles).distinct,
      contPieces = (multi.filter(_.startsWith("##")).map(_.drop(2)) ++ contSingles).distinct)
  }

  /** Greedy longest-match-first encoding of a word column →
    * array<string> display pieces (continuations `##`-prefixed). */
  def encode(wordCol: Column, v: Vocab): Column =
    call_function("graft_wordpiece_encode", wordCol,
      typedLit(v.startPieces.toArray), typedLit(v.contPieces.toArray))
}
