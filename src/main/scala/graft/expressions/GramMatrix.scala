package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Aggregation state of [[GramMatrix]]: fixed-point sums for the upper
  * triangle. `d = -1` until the first vector fixes the dimensionality.
  * State size is d(d+3)/2 + 1 longs (d=64 → ~17 KB) regardless of row
  * count — this is what makes the fused path the scale answer for wide
  * embeddings, where the explode formulation would generate N·d(d+1)/2
  * aggregation-input rows. */
final class GramBuf(var d: Int, var n: Long,
    var dims: Array[Long], var prods: Array[Long]) {
  def this() = this(-1, 0L, null, null)
  def init(dim: Int): Unit = {
    d = dim
    dims = new Array[Long](dim)
    prods = new Array[Long](dim * (dim + 1) / 2)
  }
}

/** Embedding covariance (upper triangle) as ONE fused
  * TypedImperativeAggregate: per row, a tight d²/2 multiply-add loop over
  * the vector updates fixed-point BIGINT sums — no per-pair row
  * materialization, no generator, bounded state. Emits the finished
  * array<struct<i,j,n_vecs,m2,cov>> so the caller just `inline`s it.
  *
  * Arithmetic is IDENTICAL (op for op) to the declarative explode
  * formulation and its DuckDB oracle: products quantize via
  * floor(x·y·10⁶ + 0.5) (left-to-right IEEE), sums are exact longs, and
  * the mean/covariance finalization repeats the same floor fixed-point
  * idiom — the kernel is a physical-plan swap, never a numeric one
  * (cross-checked cell-for-cell in GramMatrixSpec).
  *
  * Vectors must share one dimensionality; a ragged corpus fails loudly
  * rather than silently truncating. Null vectors are skipped. */
case class GramMatrix(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n_vecs", LongType, nullable = false),
    StructField("m2", DoubleType, nullable = false),
    StructField("cov", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "gram_matrix"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_matrix expects array<double>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): GramBuf = new GramBuf()

  override def update(buf: GramBuf, input: InternalRow): GramBuf = {
    val raw = child.eval(input)
    if (raw == null) return buf
    val arr = raw.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (buf.d == -1) buf.init(d)
    require(buf.d == d,
      s"gram_matrix: ragged corpus — saw vectors of length ${buf.d} and $d")
    // local copy: ArrayData.getDouble is a virtual call; the pair loop
    // reads each element d/2 times on average
    val v = arr.toDoubleArray()
    buf.n += 1
    var i = 0
    var idx = 0
    while (i < d) {
      val x = v(i)
      buf.dims(i) += math.floor(x * 1000000.0 + 0.5).toLong
      var j = i
      while (j < d) {
        buf.prods(idx) += math.floor(x * v(j) * 1000000.0 + 0.5).toLong
        idx += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    if (b.d == -1) return a
    if (a.d == -1) return b
    require(a.d == b.d,
      s"gram_matrix: ragged corpus — merging states of length ${a.d} and ${b.d}")
    a.n += b.n
    var i = 0
    while (i < a.dims.length) { a.dims(i) += b.dims(i); i += 1 }
    i = 0
    while (i < a.prods.length) { a.prods(i) += b.prods(i); i += 1 }
    a
  }

  override def eval(buf: GramBuf): Any = {
    if (buf.d == -1 || buf.n == 0L) return new GenericArrayData(Array.empty[Any])
    val d = buf.d
    val n = buf.n
    // identical finalization arithmetic to the declarative form: mean and
    // second moment re-quantize via floor(sum/n + 0.5)/1e6, cov re-rounds
    val means = new Array[Double](d)
    var i = 0
    while (i < d) {
      means(i) = math.floor(buf.dims(i).toDouble / n + 0.5) / 1000000.0
      i += 1
    }
    val out = new Array[Any](d * (d + 1) / 2)
    i = 0
    var idx = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val m2 = math.floor(buf.prods(idx).toDouble / n + 0.5) / 1000000.0
        val cov = math.floor((m2 - means(i) * means(j)) * 1000000.0 + 0.5) / 1000000.0
        out(idx) = InternalRow(i + 1, j + 1, n, m2, cov)
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: GramBuf): Array[Byte] = {
    if (buf.d == -1) return Array[Byte](-1, -1, -1, -1)
    val bb = java.nio.ByteBuffer.allocate(
      4 + 8 + 8 * (buf.dims.length + buf.prods.length))
    bb.putInt(buf.d).putLong(buf.n)
    buf.dims.foreach(bb.putLong)
    buf.prods.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    if (d == -1) return new GramBuf()
    val buf = new GramBuf()
    buf.init(d)
    buf.n = bb.getLong
    var i = 0
    while (i < d) { buf.dims(i) = bb.getLong; i += 1 }
    i = 0
    while (i < buf.prods.length) { buf.prods(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramMatrix =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramMatrix =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren.head)
}

object GramMatrix {
  import org.apache.spark.sql.Column

  /** Column API: the finished upper-triangle covariance report as
    * array<struct<i,j,n_vecs,m2,cov>> — `select(inline(...))` it. */
  def gram(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      GramMatrix(org.apache.spark.sql.graftshim.ColumnShim.expression(c))
        .toAggregateExpression())
}
