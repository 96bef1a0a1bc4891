package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays.
  *
  * The declarative formulation (zip_with + aggregate ×3) allocates
  * intermediate arrays and walks the vectors three times per pair; this is
  * the one hot-path case in the engine where a custom Expression genuinely
  * beats composed built-ins — a single fused loop, no allocation, full
  * whole-stage codegen via doGenCode (SURVEY.md §7.3's extension point).
  *
  * Null semantics: null input array → null result; null elements read as
  * 0.0 (parquet float lists are non-null in practice). Length mismatch →
  * truncate to the shorter (callers validate dims upstream).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |  double $yv = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native dot product of two double arrays — the cheaper sibling of
  * [[CosineSimilarity]] for pair pipelines that PRECOMPUTE row norms:
  * cosine recomputes both norms for every candidate pair (3 FMAs per
  * element), while norm(v) is a per-ROW quantity computed once in the
  * blocked relation; the per-PAIR work then drops to this single-FMA
  * loop plus one divide. Same null/length semantics as cosine,
  * including the sharp edge: a null ELEMENT contributes 0, and
  * mismatched array lengths are silently TRUNCATED to the shorter
  * array — a dimension-mismatch bug upstream yields a plausible (too
  * small) dot product, not an error. Callers that need strict
  * dimensions should guard with `size(a) = size(b)` in the plan. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
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
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |  double $yv = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |  $dot += $xv * $yv;
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Static kernels for the vector expressions (same pattern as
  * TextHashKernels: codegen emits one call, never a giant tree). */
object VectorKernels {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Fused portable-LSH bucket: quantize to floor(x·10⁶) longs and fold
    * the sign bits of the nPlanes Rademacher dot products — one pass per
    * plane over primitive longs, replacing nPlanes interpreted
    * aggregate/zip_with trees (each of which re-ran the quantize
    * transform). Plane signs are generated INLINE from the same
    * stir-square-stir formula as Similarity.rademacherPlanes (see there
    * for why the step must be non-linear) — the kernel, the declarative
    * fold, and the DuckDB oracle all derive the identical ±1 matrix from
    * (p·dim + d + 1). */
  def portableLshBucket(v: org.apache.spark.sql.catalyst.util.ArrayData,
      nPlanes: Int, dim: Int): Long = portableLshBucket(v, nPlanes, dim, 0)

  /** `planeOffset` selects an INDEPENDENT plane table from the same
    * Lehmer stream: table l of p planes uses global plane indices
    * l*p .. l*p+p-1 — the multi-table LSH variant that restores recall
    * when the adaptive plane count grows with the corpus. Offset 0 is
    * exactly the historical single-table formula. */
  def portableLshBucket(v: org.apache.spark.sql.catalyst.util.ArrayData,
      nPlanes: Int, dim: Int, planeOffset: Int): Long = {
    // `dim` parameterizes the plane formula (it must match the DECLARED
    // dimension the oracle uses). THIS KERNEL IS AUTHORITATIVE for the
    // portable semantics: a shorter vector contributes only its
    // elements and null elements read as 0. The declarative
    // Similarity.portableBucket cross-check matches it only on
    // well-formed input (length == dim, no nulls) — Spark's zip_with
    // PADS the shorter side with nulls, which null-poisons the fold
    // there rather than truncating.
    val n = math.min(v.numElements(), dim)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = if (v.isNullAt(i)) 0L
        else math.floor(v.getDouble(i) * 1000000.0).toLong
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var d = 0L
      i = 0
      while (i < n) {
        val x1 = (((planeOffset.toLong + p) * dim + i + 1) * 2654435761L) % 2147483647L
        val x2 = (x1 * x1) % 2147483647L
        d += (if ((48271L * x2) % 2147483647L < 1073741824L) q(i) else -q(i))
        i += 1
      }
      bucket = bucket * 2 + (if (d >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  /** Fused int8-quantization statistics: (v_min, v_max, mse) of the
    * per-vector affine uint8 quantization code = floor((x-mn)/sc + 0.5),
    * sc = (mx-mn)/255. Two passes over the array, zero allocation beyond
    * the 3-field result row. Math mirrors the q_embed_quantize oracle SQL
    * term-for-term (floor-based rounding — no engine-dependent ROUND
    * semantics; left-to-right error summation). The declarative HOF
    * formulation re-evaluated the captured min/max/scale subtrees per
    * ELEMENT (interpreted, O(dim²) per row — measured 9 s vs 0.3 s at
    * sf0.1); this is the CosineSimilarity lesson applied again. */
  def quantizeStats(v: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val n = v.numElements()
    if (n == 0) return new GenericInternalRow(Array[Any](0.0, 0.0, 0.0))
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      // fail LOUDLY on null elements: a fabricated 0.0 would silently
      // corrupt the min/max/error report (this is a data-quality
      // certificate), and no engine-consistent null semantics exist
      // (DuckDB's list_min skips nulls but its error fold null-poisons)
      if (v.isNullAt(i)) throw new IllegalArgumentException(
        "graft_quantize_stats: null embedding element — filter or impute upstream")
      val x = v.getDouble(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val sc = (mx - mn) / 255.0
    var s = 0.0
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val e =
        if (sc == 0.0) x - mn // constant vector: code 0, recon = mn
        else x - (mn + math.floor((x - mn) / sc + 0.5) * sc)
      s += e * e
      i += 1
    }
    new GenericInternalRow(Array[Any](mn, mx, s / n))
  }

  /** Fused Johnson-Lindenstrauss projection: quantize to 1e-6 fixed
    * point (null elements as 0, truncate to `dim` — the PortableLshBucket
    * conventions), dot against `nPlanes` Lehmer-hash Rademacher planes,
    * and emit struct(proj array<long>, q2, p2) in ONE pass over the
    * input: proj_p = Σ_d sign(p,d)·q_d, q2 = Σ q_d², p2 = Σ proj_p²
    * (p2 in index-order double accumulation — bit-identical to the
    * declarative left-to-right fold). The declarative HOF formulation
    * re-walks the vector once per PLANE in interpreted aggregates —
    * nPlanes × dim work per row plus per-element boxing. */
  def jlProject(v: org.apache.spark.sql.catalyst.util.ArrayData,
      nPlanes: Int, dim: Int): InternalRow = {
    val n = math.min(v.numElements(), dim)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = if (v.isNullAt(i)) 0L
        else math.floor(v.getDouble(i) * 1000000.0).toLong
      i += 1
    }
    val proj = new Array[Long](nPlanes)
    var p = 0
    while (p < nPlanes) {
      var d = 0L
      i = 0
      while (i < n) {
        val x1 = ((p.toLong * dim + i + 1) * 2654435761L) % 2147483647L
        val x2 = (x1 * x1) % 2147483647L
        d += (if ((48271L * x2) % 2147483647L < 1073741824L) q(i) else -q(i))
        i += 1
      }
      proj(p) = d
      p += 1
    }
    var q2 = 0L
    i = 0
    while (i < n) { q2 += q(i) * q(i); i += 1 }
    var p2 = 0.0
    p = 0
    while (p < nPlanes) { p2 += proj(p).toDouble * proj(p); p += 1 }
    new GenericInternalRow(Array[Any](
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(proj), q2, p2))
  }
}

/** Codegen'd Bloom-bitset probe over a long key: `false` for null keys
  * (a null can't be a member), never null — so it can sit directly in a
  * Filter. Holds the SERIALIZED filter and deserializes once per
  * executor-side instance (@transient lazy); the bytes ship inside the
  * stage's task binary, which Spark broadcasts once per stage — same
  * distribution cost as an explicit broadcast variable, without the UDF
  * boxing (the ScalaUDF formulation boxed every key to java.lang.Long).
  * Spark's own BloomFilterMightContain is not public API; this is the
  * same idea on the public sketch class. */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  def probe(v: Long): Boolean = filter.mightContainLong(v)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    v != null && filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainLong].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = !${c.isNull} && $ref.probe(${c.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

/** Portable-LSH bucket id of a double vector — see
  * [[VectorKernels.portableLshBucket]]. */
case class PortableLshBucket(child: Expression, nPlanes: Int, dim: Int,
    planeOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nPlanes > 0 && nPlanes < 63 && dim > 0 && planeOffset >= 0,
    s"nPlanes=$nPlanes must be in (0, 63), dim=$dim positive, planeOffset=$planeOffset >= 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.portableLshBucket(
      in.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], nPlanes, dim, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorKernels.portableLshBucket($c, $nPlanes, $dim, $planeOffset);")

  override protected def withNewChildInternal(newChild: Expression): PortableLshBucket =
    copy(child = newChild)
}

/** Int8-quantization report of a double vector:
  * struct(v_min, v_max, mse) — see [[VectorKernels.quantizeStats]]. */
case class QuantizeStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize_stats expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("v_min", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("v_max", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("mse", DoubleType, nullable = false)))
  override def prettyName: String = "graft_quantize_stats"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.quantizeStats(in.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorKernels.quantizeStats($c);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeStats =
    copy(child = newChild)
}

/** Fused JL projection of a double vector:
  * struct(proj array<long>, q2 bigint, p2 double) — see
  * [[VectorKernels.jlProject]]. */
case class JlProject(child: Expression, nPlanes: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nPlanes > 0 && dim > 0,
    s"nPlanes=$nPlanes and dim=$dim must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_jl_project expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("proj",
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false),
      nullable = false),
    org.apache.spark.sql.types.StructField("q2",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("p2", DoubleType, nullable = false)))
  override def prettyName: String = "graft_jl_project"

  override def nullSafeEval(in: Any): Any =
    VectorKernels.jlProject(
      in.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], nPlanes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorKernels.jlProject($c, $nPlanes, $dim);")

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}
