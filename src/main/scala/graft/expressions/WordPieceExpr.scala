package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece encoding (Wu et al. 2016 / BERT's tokenizer):
  * greedy LONGEST-MATCH-FIRST segmentation of a word against a
  * two-class vocabulary — word-initial pieces and continuation pieces
  * (emitted with the `##` prefix). Greedy longest-match is
  * deterministic (the match of a given length is unique), which is
  * what lets q_wordpiece_encode carry a full DuckDB replay of the
  * segmentation walk.
  *
  * Children: (word string, startPieces foldable array<string>,
  * contPieces foldable array<string>) — the vocab rides as literal
  * children (the [[KMeansAssignExpr]] pattern), extracted once into
  * per-length hash sets shared by interpreted eval and codegen.
  * Totality is the CALLER's contract: the vocab must contain every
  * single character the words can produce in both classes (learnVocab
  * guarantees it for the training corpus); an unmatched position
  * throws loudly rather than emitting a silent UNK. */
case class WordPieceEncode(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def strArr(e: Expression) = e.dataType match {
      case ArrayType(StringType, _) => e.foldable
      case _                        => false
    }
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_wordpiece_encode expects a string word, got ${first.dataType.simpleString}")
    else if (!strArr(second) || !strArr(third))
      TypeCheckResult.TypeCheckFailure(
        "graft_wordpiece_encode expects foldable array<string> piece lists")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"

  @transient private lazy val table: WordPieceEncode.Table = {
    def strs(e: Expression): Array[String] = {
      val ad = e.eval(null).asInstanceOf[ArrayData]
      (0 until ad.numElements()).map(ad.getUTF8String(_).toString).toArray
    }
    new WordPieceEncode.Table(strs(second), strs(third))
  }

  override def nullSafeEval(w: Any, s: Any, c: Any): Any =
    table.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, _, _) => {
      val t = ctx.addReferenceObj("wpTable", table,
        classOf[WordPieceEncode.Table].getName)
      s"${ev.value} = $t.encode($w);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): WordPieceEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Code-point walking shared by the tokenizer kernels: the vocabs are
  * built from CODE-POINT substrings (Spark's and DuckDB's `substring`
  * both index code points), so the kernels must slice at the same
  * boundaries — slicing Java's UTF-16 units would cut surrogate pairs
  * into lone-surrogate candidates that can never match a vocab entry
  * and falsely throw "unsegmentable" on any non-BMP character. */
private[expressions] object CodePoints {
  /** bounds(i) = UTF-16 offset of the i-th code point; bounds(n) = s.length. */
  def boundaries(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val b = new Array[Int](n + 1)
    var i = 0
    var off = 0
    while (i < n) { b(i) = off; off = s.offsetByCodePoints(off, 1); i += 1 }
    b(n) = s.length
    b
  }

  def count(s: String): Int = s.codePointCount(0, s.length)
}

object WordPieceEncode {

  /** The greedy matcher — JIT-hot shared body for eval and codegen. */
  final class Table(start: Array[String], cont: Array[String])
      extends Serializable {
    private val startSet: java.util.HashSet[String] = toSet(start)
    private val contSet: java.util.HashSet[String] = toSet(cont)
    private val maxLen: Int =
      (start.iterator ++ cont.iterator).map(CodePoints.count).foldLeft(1)(math.max)

    private def toSet(a: Array[String]): java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](a.length * 2)
      a.foreach(s.add)
      s
    }

    def encode(word: UTF8String): GenericArrayData = {
      val s = word.toString
      val bounds = CodePoints.boundaries(s)
      val n = bounds.length - 1
      val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      var pos = 0
      var isStart = true
      while (pos < n) {
        var l = math.min(maxLen, n - pos)
        var m: String = null
        var mcp = 0
        val set = if (isStart) startSet else contSet
        while (l >= 1 && m == null) {
          val cand = s.substring(bounds(pos), bounds(pos + l))
          if (set.contains(cand)) { m = cand; mcp = l }
          l -= 1
        }
        if (m == null)
          throw new IllegalArgumentException(
            s"graft_wordpiece_encode: no ${if (isStart) "start" else "continuation"} " +
              s"piece matches code point $pos of '$s' — the vocab lacks single-char totality")
        out += UTF8String.fromString(if (isStart) m else "##" + m)
        pos += mcp
        isStart = false
      }
      new GenericArrayData(out.toArray[Any])
    }
  }
}
