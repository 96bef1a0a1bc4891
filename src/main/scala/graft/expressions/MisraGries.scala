package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a TypedImperativeAggregate: one
  * pass, ≤ k counters of state, commutative mergeable summaries — the
  * frequent-items analogue of [[KmvSketch]] in the custom-sketch family.
  *
  * GUARANTEE (Misra & Gries '82; merge form Agarwal et al., PODS'12):
  * every item with true frequency > n/(k+1) is in the final candidate
  * set, under any partitioning and merge order. It may also contain
  * infrequent items and its counts are underestimates — so the
  * production pattern (and q_heavy_hitters) is sketch → candidate set →
  * ONE exact counting pass restricted to the ≤ k candidates → threshold.
  * The result is then EXACTLY the true heavy hitters (DuckDB-oracled),
  * with the full-cardinality groupBy replaced by a bounded-state sketch
  * plus a ≤ k-key aggregation: at 100 TB the token stream never shuffles
  * by token, only k counters per partition merge.
  */
case class MisraGries(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with ImplicitCastInputTypes {

  require(k > 0, s"k=$k must be positive")

  // analysis-time coercion: numeric/date inputs arrive as their string
  // form instead of a runtime ClassCastException from the blind
  // UTF8String cast in update(). (Seq[DataType] covariantly satisfies
  // the Seq[AbstractDataType] signature; AbstractDataType is private[sql].)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_candidates"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String buffers are reused by the row reader — copy to String
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1)
      else if (buf.size < k) buf.put(s, 1L)
      else decrementAll(buf) // classic MG: a miss at capacity debits everyone
    }
    buf
  }

  private def decrementAll(buf: java.util.HashMap[String, Long]): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1)
    }
  }

  override def merge(
      a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = if (a.containsKey(e.getKey)) a.get(e.getKey) else 0L
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > k) {
      // mergeable-summaries reduction: subtract the (k+1)-th largest
      // counter from everyone, drop the non-positive — ≤ k survive and
      // the error bound composes additively
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(a.size - k - 1) // (k+1)-th largest
      val eit = a.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= d) eit.remove() else e.setValue(e.getValue - d)
      }
    }
    a
  }

  /** Candidate items, sorted — the deterministic, bounded output. The
    * (underestimated) sketch counts are deliberately NOT exposed:
    * callers must recount exactly (see scaladoc). */
  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val arr = new Array[String](buf.size)
    buf.keySet().toArray(arr)
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
    ArrayData.toArrayData(arr.map(UTF8String.fromString))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      entries.add((b, e.getValue))
      bytes += 4 + b.length + 8
    }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(entries.size)
    entries.forEach { case (b, n) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(n)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  import org.apache.spark.sql.Column

  /** Column API: sorted candidate array covering every item with
    * frequency > n/(k+1). */
  def mgCandidates(c: Column, k: Int = 64): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      MisraGries(org.apache.spark.sql.graftshim.ColumnShim.expression(c), k)
        .toAggregateExpression())
}
