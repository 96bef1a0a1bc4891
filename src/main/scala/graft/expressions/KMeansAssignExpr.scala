package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Native fused k-means assignment: argmin over a centroid matrix of
  * integer squared distance, with the (distance, candidate-order)
  * tie-break of [[graft.operators.FixedPointKMeans.bestOf]] — strict
  * `<` keeps the EARLIEST candidate on equal distance, and callers
  * pass centroids in ascending-j order.
  *
  * This replaces the declarative nested-HOF formulation
  * (aggregate over a k-element struct literal, each candidate paying a
  * zip_with allocation + inner aggregate fold): Catalyst evaluates
  * higher-order lambdas interpreted, per element, which measured
  * ~100× slower than raw long arithmetic once k grew past a handful
  * (the q_semdedup k=⌊√N⌋ ladder: 68 s of fit time at sf1, vs the
  * N·k·d ≈ 2×10⁸ long ops ≈ 0.2 s this loop costs). The centroid
  * matrix rides as foldable literal children, extracted ONCE into
  * flat primitive arrays (a codegen reference object — never
  * re-materialized per row), and the whole argmin is a single fused
  * loop inside whole-stage codegen.
  *
  * Children: (v array<long>, labels array<int>, flat array<long>)
  * where flat is the k×d row-major centroid matrix; labels carries the
  * original cluster ids (Lloyd rounds can empty a cluster, so ids need
  * not be contiguous). Returns struct(j int, d long); empty labels
  * yield the fold's zero-iteration accumulator (j = −1,
  * d = Long.MaxValue), matching the HOF formulation exactly.
  * v's length must equal flat.length / labels.length — a mismatch
  * throws rather than silently truncating (a dimension bug upstream
  * must not yield a plausible wrong assignment). */
case class KMeansAssignExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isArr(dt: DataType, el: DataType) = dt match {
      case ArrayType(`el`, _) => true
      case _                  => false
    }
    if (!isArr(first.dataType, LongType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmeans_assign expects v: array<long>, got ${first.dataType.simpleString}")
    else if (!isArr(second.dataType, IntegerType) || !second.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_kmeans_assign expects labels: foldable array<int>")
    else if (!isArr(third.dataType, LongType) || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_kmeans_assign expects flat centroids: foldable array<long>")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("d", LongType, nullable = false)))
  override def prettyName: String = "graft_kmeans_assign"

  @transient private lazy val labelsArr: Array[Int] =
    second.eval(null).asInstanceOf[ArrayData].toIntArray()
  @transient private lazy val flatArr: Array[Long] =
    third.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val dims: Int = {
    val k = labelsArr.length
    require(k == 0 || flatArr.length % k == 0,
      s"graft_kmeans_assign: ${flatArr.length} matrix cells not divisible by k=$k")
    if (k == 0) 0 else flatArr.length / k
  }

  override def nullSafeEval(v: Any, l: Any, f: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    KMeansAssignExpr.assignRow(x, labelsArr, flatArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val labels = ctx.addReferenceObj("kmLabels", labelsArr, "int[]")
      val flat = ctx.addReferenceObj("kmFlat", flatArr, "long[]")
      s"${ev.value} = graft.expressions.KMeansAssignExpr.assignRow(" +
        s"$v, $labels, $flat);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): KMeansAssignExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object KMeansAssignExpr {

  /** The shared kernel body (interpreted eval AND generated code call
    * the same JIT-hot method). The row vector is copied to a primitive
    * long[] ONCE (UnsafeArrayData.toLongArray is one copyMemory), so
    * the k×d argmin loop runs over two primitive arrays — per-element
    * ArrayData.getLong calls measured ~3× slower across the whole
    * assignment pass at k=474 (sf10 census), because the copy
    * amortizes over all k candidates while the inner loop JIT-unrolls. */
  def assignRow(v: ArrayData, labels: Array[Int],
      flat: Array[Long]): GenericInternalRow = {
    val k = labels.length
    val d = if (k == 0) 0 else flat.length / k
    if (k > 0 && v.numElements() != d)
      throw new IllegalArgumentException(
        s"graft_kmeans_assign: vector has ${v.numElements()} dims, centroids have $d")
    val vv = if (k == 0) null else v.toLongArray()
    var best = Long.MaxValue
    var bj = -1
    var c = 0
    while (c < k) {
      var s = 0L
      var i = 0
      val base = c * d
      while (i < d) {
        val diff = vv(i) - flat(base + i)
        s += diff * diff
        i += 1
      }
      if (s < best) { best = s; bj = labels(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bj, best))
  }
}

/** TOP-2 sibling of [[KMeansAssignExpr]]: the same fused argmin sweep,
  * also emitting the RUNNER-UP candidate — struct(j, d, j2, d2). Built
  * for coarse MULTI-PROBE in the two-level SemDeDup ([[graft.operators
  * .FixedPointKMeans.assignTop2]]): the hierarchical fit's recall loss
  * comes from clone pairs split across a coarse boundary, and probing
  * each vector's two nearest coarse cells for CANDIDATE GENERATION
  * restores most of it at ≤2× verify mass — the sweep already visits
  * every centroid, so the runner-up costs one extra compare per
  * candidate, not a second pass.
  *
  * Tie-break contract extends the flat kernel's: both slots keep the
  * EARLIEST candidate on equal distance (strict `<` per slot), and the
  * runner-up is the best candidate excluding the winner — exactly the
  * rk ≤ 2 rows of `ROW_NUMBER() OVER (ORDER BY distance, candidate
  * order)`, which is how the DuckDB oracle replays it. k = 1 (or 0)
  * leaves slot 2 at its zero-iteration accumulator (j2 = −1,
  * d2 = Long.MaxValue); callers treat j2 = −1 as "no second probe". */
case class KMeansAssign2Expr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isArr(dt: DataType, el: DataType) = dt match {
      case ArrayType(`el`, _) => true
      case _                  => false
    }
    if (!isArr(first.dataType, LongType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmeans_assign2 expects v: array<long>, got ${first.dataType.simpleString}")
    else if (!isArr(second.dataType, IntegerType) || !second.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_kmeans_assign2 expects labels: foldable array<int>")
    else if (!isArr(third.dataType, LongType) || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_kmeans_assign2 expects flat centroids: foldable array<long>")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("j2", IntegerType, nullable = false),
    StructField("d2", LongType, nullable = false)))
  override def prettyName: String = "graft_kmeans_assign2"

  @transient private lazy val labelsArr: Array[Int] =
    second.eval(null).asInstanceOf[ArrayData].toIntArray()
  @transient private lazy val flatArr: Array[Long] =
    third.eval(null).asInstanceOf[ArrayData].toLongArray()

  override def nullSafeEval(v: Any, l: Any, f: Any): Any =
    KMeansAssign2Expr.assignRow2(v.asInstanceOf[ArrayData], labelsArr, flatArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val labels = ctx.addReferenceObj("km2Labels", labelsArr, "int[]")
      val flat = ctx.addReferenceObj("km2Flat", flatArr, "long[]")
      s"${ev.value} = graft.expressions.KMeansAssign2Expr.assignRow2(" +
        s"$v, $labels, $flat);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): KMeansAssign2Expr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object KMeansAssign2Expr {

  /** Shared kernel body — the flat kernel's loop with a two-slot
    * bounded insertion: `s < best` demotes the winner into slot 2;
    * otherwise `s < best2` fills slot 2 directly. Strict `<` in both
    * compares keeps the earliest candidate per slot on ties. */
  def assignRow2(v: ArrayData, labels: Array[Int],
      flat: Array[Long]): GenericInternalRow = {
    val k = labels.length
    val d = if (k == 0) 0 else flat.length / k
    if (k > 0 && flat.length % k != 0)
      throw new IllegalArgumentException(
        s"graft_kmeans_assign2: ${flat.length} matrix cells not divisible by k=$k")
    if (k > 0 && v.numElements() != d)
      throw new IllegalArgumentException(
        s"graft_kmeans_assign2: vector has ${v.numElements()} dims, centroids have $d")
    val vv = if (k == 0) null else v.toLongArray()
    var best = Long.MaxValue
    var bj = -1
    var best2 = Long.MaxValue
    var bj2 = -1
    var c = 0
    while (c < k) {
      var s = 0L
      var i = 0
      val base = c * d
      while (i < d) {
        val diff = vv(i) - flat(base + i)
        s += diff * diff
        i += 1
      }
      if (s < best) {
        best2 = best; bj2 = bj
        best = s; bj = labels(c)
      } else if (s < best2) {
        best2 = s; bj2 = labels(c)
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bj, best, bj2, best2))
  }
}

/** DOUBLE-precision sibling of [[KMeansAssignExpr]] for the IVF coarse
  * quantizer's map-only cell assignment ([[graft.operators.IvfIndex]]):
  * the former declarative form built k separate `aggregate(zip_with(…))`
  * folds per row — Catalyst evaluates higher-order lambdas interpreted
  * per element (k×d lambda evals + k array allocations per row, the
  * measured ~100× cliff), and at 100 TB the assignment IS the
  * corpus-sized pass that builds the partitioned index. Semantics are
  * bit-identical to `array_position(dists, array_min(dists)) - 1` over
  * those folds on NaN-FREE input: per-centroid accumulation runs in
  * the same element-ascending IEEE order, and strict `<` keeps the
  * EARLIEST centroid on an exact distance tie. The one deliberate
  * divergence: a NaN coordinate THROWS (the declarative form silently
  * parked such rows in cell 0 via Spark's NaN = NaN ordering
  * equality — see the kernel body). Children: (v array<double>,
  * labels foldable array<int>, flat foldable array<double> — k×d
  * row-major); returns struct(j int, d double); empty labels →
  * (−1, +∞). */
case class KMeansAssignF64(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isArr(dt: DataType, el: DataType) = dt match {
      case ArrayType(`el`, _) => true
      case _                  => false
    }
    if (!isArr(first.dataType, DoubleType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmeans_assign_f64 expects v: array<double>, got ${first.dataType.simpleString}")
    else if (!isArr(second.dataType, IntegerType) || !second.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_kmeans_assign_f64 expects labels: foldable array<int>")
    else if (!isArr(third.dataType, DoubleType) || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_kmeans_assign_f64 expects flat centroids: foldable array<double>")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("d", DoubleType, nullable = false)))
  override def prettyName: String = "graft_kmeans_assign_f64"

  @transient private lazy val labelsArr: Array[Int] =
    second.eval(null).asInstanceOf[ArrayData].toIntArray()
  @transient private lazy val flatArr: Array[Double] =
    third.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override def nullSafeEval(v: Any, l: Any, f: Any): Any =
    KMeansAssignF64.assignRowF64(v.asInstanceOf[ArrayData], labelsArr, flatArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val labels = ctx.addReferenceObj("kmLabelsD", labelsArr, "int[]")
      val flat = ctx.addReferenceObj("kmFlatD", flatArr, "double[]")
      s"${ev.value} = graft.expressions.KMeansAssignF64.assignRowF64(" +
        s"$v, $labels, $flat);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): KMeansAssignF64 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object KMeansAssignF64 {

  def assignRowF64(v: ArrayData, labels: Array[Int],
      flat: Array[Double]): GenericInternalRow = {
    val k = labels.length
    val d = if (k == 0) 0 else flat.length / k
    if (k > 0 && flat.length % k != 0)
      throw new IllegalArgumentException(
        s"graft_kmeans_assign_f64: ${flat.length} matrix cells not divisible by k=$k")
    if (k > 0 && v.numElements() != d)
      throw new IllegalArgumentException(
        s"graft_kmeans_assign_f64: vector has ${v.numElements()} dims, centroids have $d")
    val vv = if (k == 0) null else v.toDoubleArray()
    var best = Double.PositiveInfinity
    var bj = -1
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      val base = c * d
      while (i < d) {
        val diff = vv(i) - flat(base + i)
        s += diff * diff
        i += 1
      }
      // a NaN coordinate poisons every distance: strict < would never
      // fire and the row would land in phantom cell -1 — unreachable by
      // any probe, i.e. silently dropped from the index. (The
      // declarative form this kernel replaced parked such rows in cell
      // 0 via Spark's NaN = NaN ordering equality — ALSO wrong, just
      // quieter.) Fail loudly instead, the quantize-guard discipline.
      if (java.lang.Double.isNaN(s))
        throw new IllegalArgumentException(
          "graft_kmeans_assign_f64: NaN distance — the vector (or a centroid) " +
            "contains NaN; clean the embedding column first")
      if (s < best) { best = s; bj = labels(c) }
      c += 1
    }
    // Infinity is the same trap by another door: an infinite coordinate
    // makes every distance +Inf, 'Inf < Inf' never fires, and bj stays
    // -1 — the phantom cell again. Any assignment that ends with no
    // winner on a NON-empty candidate set is a poisoned row. Note the
    // row need not CONTAIN a non-finite coordinate: finite-but-huge
    // coordinates whose squared diffs overflow double to +Inf land here
    // too, so the message names both causes.
    if (k > 0 && bj == -1)
      throw new IllegalArgumentException(
        "graft_kmeans_assign_f64: no finite distance to any centroid — " +
          "the vector contains a non-finite coordinate, or coordinates large " +
          "enough that the squared distance overflows double; clean or rescale " +
          "the embedding column first")
    new GenericInternalRow(Array[Any](bj, best))
  }
}

/** Per-row-candidate variant of [[KMeansAssignExpr]] for the TWO-LEVEL
  * (hierarchical) k-means fit: in the fine stage each vector considers
  * ONLY its coarse cell's fine centroids, so the candidate matrix
  * differs per row (it arrives broadcast-joined on the cell id) and
  * cannot ride as a foldable literal. Children: (v array<long>,
  * labels array<int>, flat array<long>) with the same shapes, the same
  * (distance, candidate-order) tie-break, and the same struct(j, d)
  * result as the flat kernel — `assignRowDyn` on a literal-backed input
  * and `assignRow` agree bit for bit (spec-pinned).
  *
  * Memory shape: each matrix cell is read exactly ONCE per row, so the
  * kernel reads the candidate ArrayData in place — copying it would
  * cost kf×d long writes per row for zero amortization. Only the
  * vector, which is re-read once per candidate, is copied to a
  * primitive array. Null elements are the caller's contract (both
  * arrays are engine-built).
  *
  * QUANTIZED-INPUT CONTRACT (this kernel is registered as the
  * user-callable SQL function `graft_kmeans_assign_dyn`): the squared
  * distance accumulates in raw Long — `s += diff·diff` — and WRAPS
  * silently on unquantized input. Safety comes from the
  * [[graft.operators.FixedPointKMeans.quantize]] range guard upstream
  * (|coordinate| ≤ 3.2e7 after shift → per-vector distance ≤ ~6.5e16 at
  * d = 64, far inside 2⁶³); callers feeding vectors that did NOT pass
  * through the quantizer must enforce an equivalent bound themselves. */
case class KMeansAssignDyn(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isArr(dt: DataType, el: DataType) = dt match {
      case ArrayType(`el`, _) => true
      case _                  => false
    }
    if (!isArr(first.dataType, LongType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmeans_assign_dyn expects v: array<long>, got ${first.dataType.simpleString}")
    else if (!isArr(second.dataType, IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmeans_assign_dyn expects labels: array<int>, got ${second.dataType.simpleString}")
    else if (!isArr(third.dataType, LongType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmeans_assign_dyn expects flat centroids: array<long>, got ${third.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("d", LongType, nullable = false)))
  override def prettyName: String = "graft_kmeans_assign_dyn"

  override def nullSafeEval(v: Any, l: Any, f: Any): Any =
    KMeansAssignDyn.assignRowDyn(v.asInstanceOf[ArrayData],
      l.asInstanceOf[ArrayData], f.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, l, f) =>
      s"${ev.value} = graft.expressions.KMeansAssignDyn.assignRowDyn($v, $l, $f);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): KMeansAssignDyn =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object KMeansAssignDyn {

  /** Shared kernel body — semantics identical to
    * [[KMeansAssignExpr.assignRow]] with per-row candidate arrays. */
  def assignRowDyn(v: ArrayData, labels: ArrayData,
      flat: ArrayData): GenericInternalRow = {
    val k = labels.numElements()
    val nf = flat.numElements()
    if (k > 0 && nf % k != 0)
      throw new IllegalArgumentException(
        s"graft_kmeans_assign_dyn: $nf matrix cells not divisible by k=$k")
    val d = if (k == 0) 0 else nf / k
    if (k > 0 && v.numElements() != d)
      throw new IllegalArgumentException(
        s"graft_kmeans_assign_dyn: vector has ${v.numElements()} dims, centroids have $d")
    val vv = if (k == 0) null else v.toLongArray()
    var best = Long.MaxValue
    var bj = -1
    var c = 0
    while (c < k) {
      var s = 0L
      var i = 0
      val base = c * d
      while (i < d) {
        val diff = vv(i) - flat.getLong(base + i)
        s += diff * diff
        i += 1
      }
      if (s < best) { best = s; bj = labels.getInt(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bj, best))
  }
}

/** Native EXACT integer dot product of two long arrays — the
  * fixed-point sibling of [[DotProduct]] for the integer-arithmetic
  * dedup pipelines ([[graft.operators.SemDeDup]]'s pair verify, where
  * the declarative zip_with + aggregate fold pays an interpreted
  * lambda and an array allocation per PAIR). Single fused loop, full
  * codegen, no allocation. Overflow is the CALLER's contract (the
  * quantized |u| ≤ 1.6e7 bound keeps 64-dim dots < 2e16); null
  * elements read as 0; mismatched lengths truncate to the shorter
  * (same sharp edge as graft_dot — guard upstream if dims can vary). */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_long expects (array<long>, array<long>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0L else x.getLong(i)
      val yv = if (y.isNullAt(i)) 0L else y.getLong(i)
      dot += xv * yv
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xv = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |  long $yv = $b.isNullAt($i) ? 0L : $b.getLong($i);
         |  $dot += $xv * $yv;
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Native equal-position count of two long arrays — the MinHash
  * signature-agreement kernel: the per-candidate-pair HOF fold
  * (zip_with + when + aggregate over numHashes slots) pays an
  * interpreted lambda and an array allocation per PAIR in the
  * q_minhash_* candidate verify. Semantics mirror the declarative
  * form exactly: a null ELEMENT on either side (or a length overhang —
  * zip_with pads with null) contributes 0, never 1; null ARRAY →
  * null result. Returns int, like the 0/1-literal fold it replaces. */
case class EqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_eq_count expects (array<long>, array<long>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        eq += 1
      i += 1
    }
    eq
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = $eq;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqCount =
    copy(left = newLeft, right = newRight)
}

/** Native EXACT integer cosine-threshold test:
  * `graft_intcos_ge(dot, naSq, nbSq, tauNum, tauDen)` ⟺
  * `cos(a,b) ≥ tauNum/tauDen`, given the integer pair dot and the two
  * integer SQUARED norms — i.e.
  *
  *   dot ≥ 0  ∧  naSq > 0  ∧  nbSq > 0  ∧
  *   dot²·tauDen² ≥ tauNum²·naSq·nbSq
  *
  * The comparison operands need ~115 bits. The former DECIMAL(38,0)
  * formulation paid three BigDecimal multiplies + casts PER PAIR —
  * measured as the dominant term of q_semdedup's within-cluster verify
  * at sf10 (2.5×10⁸ pairs). Here the compare runs in DOUBLE with a
  * 1e-12 relative guard band (products of three exactly-converted
  * factors carry ≤ ~4·2⁻⁵³ ≈ 4.4e-16 relative error, four orders of
  * magnitude inside the band); only boundary cases — e.g. a pair
  * sitting EXACTLY on the threshold — fall through to an exact
  * BigInteger compare. The decision is therefore always identical to
  * exact integer arithmetic (the DuckDB oracle's HUGEINT replay).
  * Inputs must be non-negative norms and |values| < 2⁶³ (the
  * fixed-point pipeline's |u| ≤ 1.6e7 bound keeps every operand far
  * inside); any null child → null. */
case class IntCosGe(first: Expression, second: Expression, third: Expression,
    tauNum: Long, tauDen: Long) extends TernaryExpression {
  require(tauDen > 0 && tauNum >= 0,
    s"graft_intcos_ge: need tauDen > 0 and tauNum >= 0, got $tauNum/$tauDen")
  // decide() squares tauNum/tauDen in Long: bound them so the squares
  // can never overflow (2³¹·2³¹ = 2⁶² < Long.MaxValue). Thresholds are
  // small rationals (9/10-style), so this loses nothing.
  require(tauNum < (1L << 31) && tauDen < (1L << 31),
    s"graft_intcos_ge: tauNum/tauDen must stay below 2^31 " +
      s"(their Long squares would overflow), got $tauNum/$tauDen")

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_intcos_ge expects (dot: long, naSq: long, nbSq: long), got " +
        Seq(first, second, third).map(_.dataType.simpleString)
          .mkString("(", ", ", ")"))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_intcos_ge"

  override def nullSafeEval(dot: Any, na: Any, nb: Any): Any =
    IntCosGe.decide(dot.asInstanceOf[Long], na.asInstanceOf[Long],
      nb.asInstanceOf[Long], tauNum, tauDen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dot, na, nb) => s"${ev.value} = " +
      s"graft.expressions.IntCosGe.decide($dot, $na, $nb, ${tauNum}L, ${tauDen}L);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): IntCosGe =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object IntCosGe {

  /** The full decision (guards + guard-band compare + exact fallback). */
  def decide(dot: Long, naSq: Long, nbSq: Long,
      tauNum: Long, tauDen: Long): Boolean = {
    if (dot < 0L || naSq <= 0L || nbSq <= 0L) false
    else {
      val lhs = dot.toDouble * dot.toDouble * (tauDen * tauDen).toDouble
      val rhs = (tauNum * tauNum).toDouble * naSq.toDouble * nbSq.toDouble
      if (lhs >= rhs * 1.000000000001d) true
      else if (lhs <= rhs * 0.999999999999d) false
      else exactGe(dot, naSq, nbSq, tauNum, tauDen)
    }
  }

  /** Exact BigInteger compare — only reached inside the guard band.
    * tau squares here in BigInteger (unlike decide's Long fast path,
    * which is safe only under the constructor's 2³¹ bound), so this
    * entry point is overflow-proof for any caller. */
  def exactGe(dot: Long, naSq: Long, nbSq: Long,
      tauNum: Long, tauDen: Long): Boolean = {
    val b = java.math.BigInteger.valueOf(dot)
    val d = java.math.BigInteger.valueOf(tauDen)
    val n = java.math.BigInteger.valueOf(tauNum)
    val l = b.multiply(b).multiply(d.multiply(d))
    val r = n.multiply(n)
      .multiply(java.math.BigInteger.valueOf(naSq))
      .multiply(java.math.BigInteger.valueOf(nbSq))
    l.compareTo(r) >= 0
  }
}
