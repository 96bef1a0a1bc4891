package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SOFT-EM expectation step for the unigram tokenizer (Kudo
  * 2018's unigram LM, the forward–backward E-step the repo's hard-EM
  * variant replaces with Viterbi counts): per word, the EXPECTED number
  * of times each vocab piece is used, marginalized over ALL
  * segmentations weighted by their probability.
  *
  * Cross-engine determinism is the whole design: floating log-space
  * forward–backward would never hash-match another engine, so every
  * quantity that crosses a DP cell is an INTEGER —
  *
  *  - piece log-costs arrive as integers in [[UnigramExpect.LogScale]]
  *    units of a nat (1e-4 nat fixed point);
  *  - the forward pass is A(0) = 0,
  *    A(t) = LSE over candidate pieces ending at t of
  *    (A(t−|p|) + cost(p)), where LSE(c₁..cₘ) =
  *    min − round(LogScale · ln(Σⱼ exp((min − cⱼ)/LogScale))) — ONE
  *    ln/exp cluster per cell, summed in PIECE-LENGTH-ASCENDING order
  *    (IEEE addition is order-sensitive; the oracle's list fold
  *    replays the identical order), rounded back to an integer before
  *    it feeds any further arithmetic;
  *  - the backward pass mirrors it from the word's end;
  *  - each occurrence (piece p covering [s,e)) contributes the integer
  *    weight round(WScale · exp((A(L) − A(s) − cost(p) − B(e)) /
  *    LogScale)) — its posterior probability in micro-units.
  *
  * The double noise of ln/exp (~1e-14 nats) sits ten orders below the
  * 1e-4-nat quantum, the q_source_kl rounding discipline; after the
  * per-cell round, all sums are exact integer arithmetic in any
  * engine. Totality is the caller's contract (single-char pieces for
  * every corpus character); an unsegmentable word throws loudly.
  *
  * Children: (word string, pieces foldable array<string>, costs
  * foldable array<long>, positionally matched). Returns
  * array<struct<p string, mc long>> — this word's per-piece expected
  * counts in micro-units, pieces ascending. Code-point walking via
  * [[CodePoints]], like the kernel's siblings. */
case class UnigramExpect(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_unigram_expect expects a string word, got ${first.dataType.simpleString}")
    else if (!(second.dataType.isInstanceOf[ArrayType] &&
        second.dataType.asInstanceOf[ArrayType].elementType == StringType &&
        second.foldable))
      TypeCheckResult.TypeCheckFailure(
        "graft_unigram_expect expects a foldable array<string> piece list")
    else if (!(third.dataType.isInstanceOf[ArrayType] &&
        third.dataType.asInstanceOf[ArrayType].elementType == LongType &&
        third.foldable))
      TypeCheckResult.TypeCheckFailure(
        "graft_unigram_expect expects a foldable array<long> cost list")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", StringType, nullable = false),
    StructField("mc", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_unigram_expect"

  @transient private lazy val table: UnigramExpect.Table = {
    val ps = second.eval(null).asInstanceOf[ArrayData]
    val cs = third.eval(null).asInstanceOf[ArrayData]
    require(ps.numElements() == cs.numElements(),
      s"graft_unigram_expect: ${ps.numElements()} pieces vs ${cs.numElements()} costs")
    new UnigramExpect.Table(
      (0 until ps.numElements()).map(ps.getUTF8String(_).toString).toArray,
      cs.toLongArray())
  }

  override def nullSafeEval(w: Any, p: Any, c: Any): Any =
    table.expect(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, _, _) => {
      val t = ctx.addReferenceObj("ueTable", table,
        classOf[UnigramExpect.Table].getName)
      s"${ev.value} = $t.expect($w);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): UnigramExpect =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object UnigramExpect {

  /** Integer log-cost unit: 1e-4 nats. Coarse enough that the ln/exp
    * double noise (~1e-14 nats) can essentially never flip a rounding
    * (collision band ~1e-10 of the quantum), fine enough that the
    * per-cell quantization (≤ 0.5e-4 nats, ≤ ~2e-3 over a word)
    * perturbs posteriors by < 0.3%. */
  val LogScale = 10000L

  /** Expected-count unit: micro-counts (1e-6 of one occurrence). */
  val WScale = 1000000L

  /** round-half-up shared with the quantize family. */
  def roundHalfUp(x: Double): Long = math.floor(x + 0.5).toLong

  final class Table(pieces: Array[String], costs: Array[Long])
      extends Serializable {
    private val cost = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.indices.foreach(i => cost.put(pieces(i), costs(i)))
    // measured in CODE POINTS, matching the walk below
    private val maxLen: Int = pieces.iterator.map(CodePoints.count).foldLeft(1)(math.max)

    /** LSE of the candidate costs buffer (l-ascending order), as the
      * scaladoc's integer formula. `m` is the exact integer min.
      * n = 0 would compute MaxValue − MinValue = −1 (silent garbage),
      * so emptiness is the CALLER's loud-throw responsibility. */
    private def lse(cands: Array[Long], n: Int): Long = {
      require(n > 0, "graft_unigram_expect: LSE of an empty candidate set")
      var m = Long.MaxValue
      var i = 0
      while (i < n) { if (cands(i) < m) m = cands(i); i += 1 }
      var s = 0.0
      i = 0
      while (i < n) {
        s += math.exp((m - cands(i)).toDouble / LogScale)
        i += 1
      }
      m - roundHalfUp(LogScale * math.log(s))
    }

    def expect(word: UTF8String): GenericArrayData = {
      val s = word.toString
      val bounds = CodePoints.boundaries(s)
      val L = bounds.length - 1
      val cands = new Array[Long](maxLen)
      // forward: A(t) over code-point prefixes
      val A = new Array[Long](L + 1)
      var t = 1
      while (t <= L) {
        var n = 0
        var l = 1
        val lim = math.min(maxLen, t)
        while (l <= lim) {
          val c = cost.get(s.substring(bounds(t - l), bounds(t)))
          if (c != null) { cands(n) = A(t - l) + c.longValue(); n += 1 }
          l += 1
        }
        if (n == 0)
          throw new IllegalArgumentException(
            s"graft_unigram_expect: '$s' is unsegmentable — the vocab lacks single-char totality")
        A(t) = lse(cands, n)
        t += 1
      }
      // backward: B(t) over code-point suffixes
      val B = new Array[Long](L + 1)
      t = L - 1
      while (t >= 0) {
        var n = 0
        var l = 1
        val lim = math.min(maxLen, L - t)
        while (l <= lim) {
          val c = cost.get(s.substring(bounds(t), bounds(t + l)))
          if (c != null) { cands(n) = c.longValue() + B(t + l); n += 1 }
          l += 1
        }
        // forward totality (a piece ENDING at every prefix) does NOT
        // imply a piece STARTING at every suffix position — e.g. vocab
        // {a, ab} segments 'ab' forward but has nothing starting at
        // 'b'. The sibling kernels throw on the same contract breach;
        // silence here would feed lse an empty set and emit garbage
        // posteriors (single-char totality makes this unreachable for
        // well-formed vocabs)
        if (n == 0)
          throw new IllegalArgumentException(
            s"graft_unigram_expect: '$s' is unsegmentable from code point $t — " +
              "the vocab lacks single-char totality")
        B(t) = lse(cands, n)
        t -= 1
      }
      val C = A(L)
      // per-occurrence posterior weights, aggregated per piece
      val acc = new java.util.TreeMap[String, java.lang.Long]()
      t = 1
      while (t <= L) {
        var l = 1
        val lim = math.min(maxLen, t)
        while (l <= lim) {
          val p = s.substring(bounds(t - l), bounds(t))
          val c = cost.get(p)
          if (c != null) {
            val e = (C - A(t - l) - c.longValue() - B(t)).toDouble / LogScale
            val w = roundHalfUp(WScale * math.exp(e))
            if (w > 0L) {
              val prev = acc.get(p)
              acc.put(p, if (prev == null) w else prev.longValue() + w)
            }
          }
          l += 1
        }
        t += 1
      }
      val out = new Array[Any](acc.size())
      val it = acc.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val en = it.next()
        out(i) = new GenericInternalRow(Array[Any](
          UTF8String.fromString(en.getKey), en.getValue.longValue()))
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
