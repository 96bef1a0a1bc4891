package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-style subword tokenizer (the hard-EM shape of Kudo 2018's
  * unigram LM / SentencePiece) — the THIRD subword family, completing
  * the trio: [[Bpe]] learns by merging, [[WordPiece]] encodes greedily
  * against a fixed vocab, and this one segments OPTIMALLY (DP over the
  * piece lattice, [[graft.expressions.UnigramSegment]]) and iterates
  * segment → prune-to-used → re-segment:
  *
  *  1. seed vocab = the corpus's top-K weighted substrings (length
  *     2..maxLen) + every corpus character (totality), scored by
  *     weighted substring count;
  *  2. segment every distinct word optimally under (fewest pieces,
  *     then max Σ score, then lexicographic) — the integer-exact MDL
  *     stand-in for max-likelihood (log-probabilities would break the
  *     cross-engine determinism the oracle gate needs);
  *  3. re-score pieces by their USE in the segmentation and PRUNE the
  *     multi-char pieces that went unused (characters stay, score 0 —
  *     totality again); re-segment under the refit vocab.
  *
  * The prune step is what makes round 2 structurally different from
  * round 1 — exactly unigram-LM's EM-with-pruning loop in hard
  * (Viterbi) form. The SOFT E-step (production SentencePiece trains on
  * EXPECTED counts over all segmentations, not the Viterbi path's) is
  * implemented too — [[expect]]/[[softCounts]] below over the
  * integer-fixed-point forward–backward kernel
  * [[graft.expressions.UnigramExpect]] (q_unigram_soft_em carries the
  * full DP replay under the hash gate); the hard round stays the
  * default because its purely-integer objective needs no log table.
  *
  * Scale shape: identical to the other two families — everything after
  * the one corpus token rollup runs on the DISTINCT-word relation; the
  * driver holds topK + alphabet (pieces, score) pairs per round; the
  * segmenter is a map-side native kernel broadcast back to the
  * stream. */
object UnigramLm {

  final case class Vocab(pieces: Seq[String], scores: Seq[Long]) {
    require(pieces.length == scores.length)
  }

  /** Weighted substring counts (length 1..maxLen) over (word, freq). */
  def substringCounts(words: DataFrame, wordCol: String, freqCol: String,
      maxLen: Int): DataFrame = {
    val w = words.select(col(wordCol).as("w"), col(freqCol).cast("long").as("n"))
    w.select(col("w"), col("n"), explode(expr("sequence(1, length(w))")).as("i"))
      .select(col("w"), col("n"), col("i"),
        explode(expr(s"sequence(1, $maxLen)")).as("l"))
      .filter(col("i") + col("l") - lit(1) <= length(col("w")))
      .select(expr("substring(w, i, l)").as("p"), col("n"))
      .groupBy(col("p")).agg(sum(col("n")).as("c"))
  }

  /** Seed vocab: top-K multi-char substrings by (count DESC, piece ASC)
    * + every corpus character, scored by weighted substring count. */
  def seedVocab(words: DataFrame, wordCol: String, freqCol: String,
      topK: Int, maxLen: Int): Vocab = {
    require(topK >= 0 && maxLen >= 2, s"topK=$topK maxLen=$maxLen")
    val gc = substringCounts(words, wordCol, freqCol, maxLen)
    val multi = gc.filter(length(col("p")) >= 2)
      .orderBy(col("c").desc, col("p")).limit(topK)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val singles = gc.filter(length(col("p")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = multi ++ singles
    Vocab(all.map(_._1).toSeq, all.map(_._2).toSeq)
  }

  /** Optimal segmentation column under `v` (array<string> pieces). */
  def segment(wordCol: Column, v: Vocab): Column =
    call_function("graft_unigram_segment", wordCol,
      typedLit(v.pieces.toArray), typedLit(v.scores.toArray))

  /** The prune-and-rescore step: pieces keep the weighted count of
    * their USE in `segmented` (token, freqCol, piecesCol); unused
    * multi-char pieces drop out, unused characters stay at score 0. */
  def refit(segmented: DataFrame, freqCol: String, piecesCol: String,
      chars: Seq[String]): Vocab = {
    val used = segmented
      .select(explode(col(piecesCol)).as("p"), col(freqCol).cast("long").as("n"))
      .groupBy(col("p")).agg(sum(col("n")).as("score"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val usedSet = used.map(_._1).toSet
    val zeroChars = chars.filterNot(usedSet).map(c => (c, 0L))
    val all = used ++ zeroChars
    Vocab(all.map(_._1).toSeq, all.map(_._2).toSeq)
  }

  // ---- soft EM (the production SentencePiece E-step) -------------------

  /** Integer log-costs for the soft E-step: cost(p) =
    * round(LogScale · ln(total / cᵢ)) with cᵢ = max(count, 1) (the
    * zero-count floor keeps characters finite) and total = Σ raw
    * counts — ONE double division then ONE ln, the same expression the
    * oracle interpolates, so both engines round the identical double.
    * Pieces keep [[Vocab]] order. */
  def logCosts(v: Vocab): Seq[Long] = {
    // addExact, not sum: the EM round feeds MICRO-COUNT scores (1e6×
    // the raw counts), so near the documented ~10 TB envelope the total
    // approaches 2⁶³ — a silent Long wrap would compute wrong costs (or
    // trip the require with a misleading "empty corpus") while the
    // oracle's HUGEINT sum throws; overflow must be equally loud here
    val total = v.scores.foldLeft(0L)(Math.addExact)
    require(total > 0, "logCosts: empty corpus")
    v.scores.map { c =>
      val cf = math.max(c, 1L)
      graft.expressions.UnigramExpect.roundHalfUp(
        graft.expressions.UnigramExpect.LogScale *
          math.log(total.toDouble / cf.toDouble))
    }
  }

  /** The SOFT expectation column: per word, array<struct<p, mc>> of
    * expected piece-use counts in micro-units, marginalized over ALL
    * segmentations by integer-fixed-point forward–backward
    * ([[graft.expressions.UnigramExpect]] — see there for the
    * determinism contract). The hard-EM divergence this closes:
    * [[refit]] counts only the Viterbi path's pieces; this counts every
    * path, weighted. */
  def expect(wordCol: Column, v: Vocab, costs: Seq[Long]): Column =
    call_function("graft_unigram_expect", wordCol,
      typedLit(v.pieces.toArray), typedLit(costs.toArray))

  /** Corpus-level soft expected counts: Σ over words of freq × the
    * word's per-piece micro-counts — (p, soft_mc DECIMAL(38,0)) in
    * micro-units. Map-side kernel + one piece-keyed partial-aggregated
    * rollup; nothing corpus-sized leaves the executors.
    *
    * Integer bounds: per-word micro-counts reach ~word-length × 1e6
    * and word frequencies reach corpus size, so the PRODUCT alone can
    * pass 2⁶³ around ~10 TB of text — inside the design envelope.
    * Both the multiply and the rollup therefore run in DECIMAL(38,0)
    * (headroom ~1e38; the DuckDB mirror's HUGEINT is the same move),
    * and callers that need a long cast down explicitly where THEIR
    * corpus bound justifies it.
    *
    * Past even the DECIMAL(38,0) headroom, Spark's default non-ANSI
    * mode turns the overflowing multiply/SUM into NULL — which a
    * downstream `coalesce(…, 0)` would launder into a plausible zero
    * count while the DuckDB mirror's HUGEINT→BIGINT cast throws. Every
    * group here holds ≥ 1 occurrence row, so a NULL rollup can ONLY
    * mean overflow (a piece with no occurrences has no group at all —
    * absence, not null, is the join-miss signal): the guard raises on
    * it, keeping the engine as loud as the oracle at EVERY boundary,
    * not just the 2⁶³ one. */
  def softCounts(words: DataFrame, wordCol: String, freqCol: String,
      v: Vocab, costs: Seq[Long]): DataFrame =
    words.select(explode(expect(col(wordCol), v, costs)).as("e"),
        // a NULL frequency would null the product below and masquerade
        // as the overflow raise — that is a BAD-INPUT error, not an
        // envelope one, so it gets its own message at the source
        when(col(freqCol).isNull,
          raise_error(concat(lit("UnigramLm.softCounts: null "),
            lit(freqCol), lit(" for word '"), col(wordCol),
            lit("' — frequencies must be non-null"))).cast("long"))
          .otherwise(col(freqCol).cast("long")).as("n"))
      .select(col("e.p").as("p"),
        (col("e.mc").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("n")).as("wmc_raw"))
      // the PER-ROW multiply can overflow DECIMAL(38,0) too — non-ANSI
      // Spark NULLs it and SUM would silently SKIP the row, returning a
      // plausible non-null UNDERCOUNT the rollup guard below cannot see.
      // mc and n are now non-null by construction (kernel output × the
      // null-guarded long above), so a null product can only mean
      // overflow: raise here
      .select(col("p"),
        when(col("wmc_raw").isNull,
          raise_error(concat(lit("UnigramLm.softCounts: DECIMAL(38,0) " +
            "overflow in a per-word micro-count product for piece '"),
            col("p"), lit("' — corpus is past the micro-count envelope")))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .otherwise(col("wmc_raw")).as("wmc"))
      .groupBy(col("p"))
      .agg(sum(col("wmc")).cast(
        org.apache.spark.sql.types.DecimalType(38, 0)).as("soft_mc_raw"))
      .select(col("p"),
        when(col("soft_mc_raw").isNull,
          raise_error(concat(lit("UnigramLm.softCounts: DECIMAL(38,0) " +
            "overflow rolling up piece '"), col("p"),
            lit("' — corpus is past the micro-count envelope")))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .otherwise(col("soft_mc_raw")).as("soft_mc"))
}
