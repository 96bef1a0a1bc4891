package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native OPTIMAL subword segmentation over a scored piece vocabulary —
  * the unigram-LM-shaped counterpart of [[WordPieceEncode]]'s greedy
  * matcher: dynamic programming picks the segmentation minimizing
  * (piece count, then −Σ score, then the piece sequence
  * lexicographically) — a total order that is translation-invariant
  * (prefix dominance survives any common suffix), so per-position DP
  * is exact. Greedy longest-match is NOT optimal under this objective
  * (spec pins a counterexample); the DP is, and because the objective
  * is all-integer with a deterministic full tie-break, the DuckDB
  * oracle can certify it by brute-force enumeration of every
  * segmentation.
  *
  * Children: (word string, pieces foldable array<string>, scores
  * foldable array<long>, positionally matched). Totality is the
  * caller's contract (every corpus char present); an unsegmentable
  * word throws loudly. */
case class UnigramSegment(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_unigram_segment expects a string word, got ${first.dataType.simpleString}")
    else if (!(second.dataType.isInstanceOf[ArrayType] &&
        second.dataType.asInstanceOf[ArrayType].elementType == StringType &&
        second.foldable))
      TypeCheckResult.TypeCheckFailure(
        "graft_unigram_segment expects a foldable array<string> piece list")
    else if (!(third.dataType.isInstanceOf[ArrayType] &&
        third.dataType.asInstanceOf[ArrayType].elementType == LongType &&
        third.foldable))
      TypeCheckResult.TypeCheckFailure(
        "graft_unigram_segment expects a foldable array<long> score list")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  @transient private lazy val table: UnigramSegment.Table = {
    val ps = second.eval(null).asInstanceOf[ArrayData]
    val ss = third.eval(null).asInstanceOf[ArrayData]
    require(ps.numElements() == ss.numElements(),
      s"graft_unigram_segment: ${ps.numElements()} pieces vs ${ss.numElements()} scores")
    new UnigramSegment.Table(
      (0 until ps.numElements()).map(ps.getUTF8String(_).toString).toArray,
      ss.toLongArray())
  }

  override def nullSafeEval(w: Any, p: Any, s: Any): Any =
    table.segment(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, _, _) => {
      val t = ctx.addReferenceObj("usTable", table,
        classOf[UnigramSegment.Table].getName)
      s"${ev.value} = $t.segment($w);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): UnigramSegment =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object UnigramSegment {

  final class Table(pieces: Array[String], scores: Array[Long])
      extends Serializable {
    private val score = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.indices.foreach(i => score.put(pieces(i), scores(i)))
    // measured in CODE POINTS, matching the DP walk below
    private val maxLen: Int = pieces.iterator.map(CodePoints.count).foldLeft(1)(math.max)

    /** lexicographic compare of equal-length piece sequences. */
    private def pathLt(a: Vector[String], b: Vector[String]): Boolean = {
      var i = 0
      while (i < a.length && i < b.length) {
        val c = a(i).compareTo(b(i))
        if (c != 0) return c < 0
        i += 1
      }
      a.length < b.length
    }

    def segment(word: UTF8String): GenericArrayData = {
      val s = word.toString
      // DP over CODE-POINT positions (see [[CodePoints]]): the vocab is
      // built from codepoint substrings, so candidate slicing must use
      // the same boundaries or non-BMP words become unsegmentable
      val bounds = CodePoints.boundaries(s)
      val L = bounds.length - 1
      val bn = Array.fill(L + 1)(Int.MaxValue)
      val bs = new Array[Long](L + 1)
      val bp = new Array[Vector[String]](L + 1)
      bn(0) = 0; bs(0) = 0L; bp(0) = Vector.empty
      var pos = 0
      while (pos < L) {
        if (bn(pos) != Int.MaxValue) {
          var l = 1
          val lim = math.min(maxLen, L - pos)
          while (l <= lim) {
            val cand = s.substring(bounds(pos), bounds(pos + l))
            val sc = score.get(cand)
            if (sc != null) {
              val t = pos + l
              val n2 = bn(pos) + 1
              val s2 = bs(pos) + sc.longValue()
              val better =
                n2 < bn(t) || (n2 == bn(t) && (s2 > bs(t) ||
                  (s2 == bs(t) && pathLt(bp(pos) :+ cand, bp(t)))))
              if (better) { bn(t) = n2; bs(t) = s2; bp(t) = bp(pos) :+ cand }
            }
            l += 1
          }
        }
        pos += 1
      }
      if (bn(L) == Int.MaxValue)
        throw new IllegalArgumentException(
          s"graft_unigram_segment: '$s' is unsegmentable — the vocab lacks single-char totality")
      new GenericArrayData(bp(L).map(UTF8String.fromString).toArray[Any])
    }
  }
}
