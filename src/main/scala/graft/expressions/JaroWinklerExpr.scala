package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd expression —
  * Spark has levenshtein built in but not Jaro-Winkler, and JW is the
  * record-linkage standard for short identifier-like strings (names,
  * SKUs) because it rewards shared prefixes and tolerates
  * transpositions that cost levenshtein 2.
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (itself the
  * classic jellyfish algorithm), verified empirically in
  * JaroWinklerSpec against DuckDB-computed values:
  *   - match window = max(|a|,|b|)/2 − 1 (floor, min 0);
  *   - transpositions = (mismatched matched-pairs)/2, integer division;
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3;
  *   - Winkler boost ONLY when jaro > 0.7: jw = jaro + 0.1·ℓ·(1−jaro),
  *     ℓ = common prefix length capped at 4;
  *   - either side empty → 0.0 (including both empty — DuckDB's choice);
  *     byte-equal inputs → 1.0.
  *
  * Operates on BYTES (exactly like DuckDB), so results agree on ASCII;
  * multi-byte UTF-8 compares byte-wise in both engines identically.
  * The O(|a|·window) inner loop lives in the static kernel; generated
  * code is a single method call (TextHashExprs convention — no giant
  * Janino expression trees). */
object JaroWinklerKernel {

  def jaroWinkler(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.getBytes
    val b = s2.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatch = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a(prefix) == b(prefix)) prefix += 1
    jaro + 0.1 * prefix * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaroWinklerKernel.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Companion kernels for the rest of the record-linkage metric panel —
  * all pinned to DuckDB's independent implementations in
  * JaroWinklerSpec (the cross-engine certification trick: two unrelated
  * codebases must produce identical integers). */
object StringMetricKernels {

  /** UNRESTRICTED Damerau-Levenshtein (true edit distance with
    * transpositions; DuckDB's damerau_levenshtein — NOT the restricted
    * OSA variant: dl("ca","abc") = 2, OSA would say 3). Classic
    * last-occurrence-table algorithm, byte alphabet. */
  def damerauLevenshtein(s1: UTF8String, s2: UTF8String): Int = {
    val a = s1.getBytes
    val b = s2.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = da(b(j - 1) & 0xff)
        val j1 = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da(a(i - 1) & 0xff) = i
      i += 1
    }
    d(la + 1)(lb + 1)
  }

  /** Byte-wise Hamming distance; length mismatch → MinValue sentinel
    * (the expression maps it to NULL — DuckDB raises instead, so
    * callers guard with a length equality the way the oracle must). */
  def hamming(s1: UTF8String, s2: UTF8String): Int = {
    val a = s1.getBytes
    val b = s2.getBytes
    if (a.length != b.length) return Int.MinValue
    var n = 0
    var i = 0
    while (i < a.length) { if (a(i) != b(i)) n += 1; i += 1 }
    n
  }

  /** Jaccard similarity of the DISTINCT byte sets (DuckDB's `jaccard`:
    * set semantics — jaccard("aab","ab") = 1). Empty input → NaN
    * sentinel (expression maps to NULL; DuckDB raises). */
  def charJaccard(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.getBytes
    val b = s2.getBytes
    if (a.length == 0 || b.length == 0) return Double.NaN
    val sa = new Array[Boolean](256)
    val sb = new Array[Boolean](256)
    var i = 0
    while (i < a.length) { sa(a(i) & 0xff) = true; i += 1 }
    i = 0
    while (i < b.length) { sb(b(i) & 0xff) = true; i += 1 }
    var inter = 0
    var union = 0
    i = 0
    while (i < 256) {
      if (sa(i) && sb(i)) inter += 1
      if (sa(i) || sb(i)) union += 1
      i += 1
    }
    inter.toDouble / union
  }
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_damerau expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_damerau"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringMetricKernels.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.StringMetricKernels.damerauLevenshtein($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hamming expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hamming"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = StringMetricKernels.hamming(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    if (v == Int.MinValue) null else v
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |${ev.value} = graft.expressions.StringMetricKernels.hamming($a, $b);
      |if (${ev.value} == Integer.MIN_VALUE) { ${ev.isNull} = true; ${ev.value} = -1; }
      """.stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

case class CharSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_jaccard expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_jaccard"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = StringMetricKernels.charJaccard(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    if (v.isNaN) null else v
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |${ev.value} = graft.expressions.StringMetricKernels.charJaccard($a, $b);
      |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; ${ev.value} = 0.0; }
      """.stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharSetJaccard =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}

  def jaroWinkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))
  def damerau(a: Column, b: Column): Column =
    column(DamerauLevenshtein(expression(a), expression(b)))
  def hammingDist(a: Column, b: Column): Column =
    column(HammingDistance(expression(a), expression(b)))
  def charJaccard(a: Column, b: Column): Column =
    column(CharSetJaccard(expression(a), expression(b)))
}
