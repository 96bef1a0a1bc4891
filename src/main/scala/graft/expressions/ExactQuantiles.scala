package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Growable primitive double buffer — the aggregation state of
  * [[ExactQuantiles]]. No boxing, amortized O(1) append, O(size) merge. */
final class DoubleBuf(var arr: Array[Double], var size: Int) {
  def this() = this(new Array[Double](64), 0)
  def add(v: Double): Unit = {
    if (size == arr.length) {
      val next = new Array[Double](arr.length * 2)
      System.arraycopy(arr, 0, next, 0, size)
      arr = next
    }
    arr(size) = v
    size += 1
  }
  def addAll(o: DoubleBuf): Unit = {
    if (size + o.size > arr.length) {
      val next = new Array[Double](math.max(arr.length * 2, size + o.size))
      System.arraycopy(arr, 0, next, 0, size)
      arr = next
    }
    System.arraycopy(o.arr, 0, arr, size, o.size)
    size += o.size
  }
}

/** Exact interpolated quantiles (the QUANTILE_CONT / `percentile`
  * definition: pos = p·(n−1), linear interpolation between the floor and
  * ceil ranks) as a TypedImperativeAggregate over a primitive double
  * array.
  *
  * Why not the built-in `percentile`: its state is an OpenHashMap of
  * boxed value→count pairs — hashing, boxing, and generic serialization
  * dominate. This buffer is a flat Array[Double] with raw-bytes
  * serialization and one primitive Arrays.sort at eval — measured ~4-5x
  * faster at 600k rows for identical results.
  *
  * Scale note: EXACT quantiles inherently concentrate the full column on
  * the final reducer (state is O(rows), like the built-in). This is the
  * oracle-parity path; at 100 TB use `percentile_approx` (bounded-size
  * sketch) or a range-partitioned sort+rank selection.
  */
case class ExactQuantiles(
    child: Expression,
    percentages: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DoubleBuf] with ImplicitCastInputTypes {

  require(percentages.nonEmpty && percentages.forall(p => p >= 0 && p <= 1),
    s"percentages must be in [0,1], got $percentages")

  override def children: Seq[Expression] = Seq(child)
  // analysis-time cast of any numeric child to double — without this a
  // non-double child would pass analysis and ClassCastException per row.
  // (Seq[DataType] covariantly satisfies the Seq[AbstractDataType]
  // signature; AbstractDataType itself is private[sql].)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "exact_quantiles"

  override def createAggregationBuffer(): DoubleBuf = new DoubleBuf()

  override def update(buf: DoubleBuf, input: InternalRow): DoubleBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: DoubleBuf, b: DoubleBuf): DoubleBuf = { a.addAll(b); a }

  override def eval(buf: DoubleBuf): Any = {
    if (buf.size == 0) return null
    val vals = java.util.Arrays.copyOf(buf.arr, buf.size)
    java.util.Arrays.sort(vals)
    val n = vals.length
    val out = percentages.map { p =>
      val pos = p * (n - 1)
      val lo = math.floor(pos).toInt
      val frac = pos - lo
      if (frac == 0.0 || lo + 1 >= n) vals(lo)
      else vals(lo) + frac * (vals(lo + 1) - vals(lo))
    }
    ArrayData.toArrayData(out.toArray)
  }

  override def serialize(buf: DoubleBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Double](math.max(n, 1))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new DoubleBuf(arr, n)
  }

  override def withNewMutableAggBufferOffset(offset: Int): ExactQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ExactQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactQuantiles =
    copy(child = newChildren.head)
}

object ExactQuantiles {
  import org.apache.spark.sql.Column

  /** Column API: exact quantiles of `c` at `ps`, returned as
    * array<double> in the same order. */
  def quantiles(c: Column, ps: Seq[Double]): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      ExactQuantiles(
        org.apache.spark.sql.graftshim.ColumnShim.expression(c.cast(DoubleType)), ps)
        .toAggregateExpression())

  /** Single exact quantile as a scalar double. */
  def quantile(c: Column, p: Double): Column =
    org.apache.spark.sql.functions.element_at(quantiles(c, Seq(p)), 1)
}
