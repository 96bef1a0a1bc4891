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

object JaroWinklerExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}

  def jaroWinkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))
}
