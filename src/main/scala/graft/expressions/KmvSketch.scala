package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType}

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate — the custom-sketch extension point
  * (SURVEY.md §2.10): fixed-size state (k longs), commutative merge, so
  * it runs as partial + final aggregation with map-side combine like any
  * built-in.
  *
  * Estimator: with the k smallest normalized hashes of the distinct
  * values, E[distinct] ≈ (k-1) / max_k where max_k is the k-th minimum
  * hash mapped to (0,1). Standard error ≈ 1/sqrt(k-2).
  *
  * vs approx_count_distinct (HLL++): KMV supports set-intersection
  * estimates (Jaccard of two sketches = overlap of their k-min sets),
  * which HLL cannot — the reason a training-data pipeline keeps one.
  */
case class KmvSketch(
    child: Expression,
    k: Int = 256,
    portable: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  // portable mode supports only the types portableHash can mirror in
  // SQL — reject others at ANALYSIS time, not per-row mid-stage
  override def checkInputDataTypes(): TypeCheckResult =
    if (!portable) TypeCheckResult.TypeCheckSuccess
    else child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"portable kmv_distinct supports integral/string values, got ${other.simpleString}")
    }

  private lazy val hasher = XxHash64(Seq(child), 42L)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(
      buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = if (portable) KmvSketch.portableHash(v)
        else hasher.eval(input).asInstanceOf[Long]
      add(buf, h)
    }
    buf
  }

  private def add(buf: java.util.TreeSet[Long], h: Long): Unit = {
    // keep the k smallest (unsigned order via flip of the sign bit)
    val key = h ^ Long.MinValue
    if (buf.size < k) buf.add(key)
    else if (key < buf.last()) {
      if (buf.add(key)) buf.pollLast()
    }
  }

  override def merge(
      a: java.util.TreeSet[Long], b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val key = it.next()
      if (a.size < k) a.add(key)
      else if (key < a.last()) { if (a.add(key)) a.pollLast() }
    }
    a
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    if (portable) KmvSketch.portableEstimateFromSortedKeys(arr, k)
    else KmvSketch.estimateFromSortedKeys(arr, k)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

object KmvSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** THE estimator formula, shared by the aggregate's eval and every
    * driver-side consumer of a kmvSet array (JoinSizeEstimator): exact
    * count below sketch capacity, else (k−1)/frac of the k-th minimum.
    * `keys` must be the sign-flipped unsigned-order k-min set, sorted
    * ascending — exactly what [[kmvSet]] evaluates to. One definition:
    * a change to the key encoding or the estimator lands everywhere. */
  def estimateFromSortedKeys(keys: Array[Long], k: Int): Long =
    if (keys.length < k) keys.length.toLong
    else {
      // stored keys are already in unsigned order: position in [0, 2^64)
      // is key - Long.MinValue
      val kth = keys.last.toDouble - Long.MinValue.toDouble
      val frac = kth / math.pow(2.0, 64)
      math.max(1L, math.round((k - 1) / frac))
    }

  /** Column API: kmv_distinct(col, k). */
  def kmvDistinct(c: Column, k: Int = 256, portable: Boolean = false): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      KmvSketch(org.apache.spark.sql.graftshim.ColumnShim.expression(c), k, portable)
        .toAggregateExpression())

  /** The k-min SET itself (sorted array<long>) — the mergeable sketch
    * value, enabling set-overlap estimates HLL cannot do. */
  def kmvSet(c: Column, k: Int = 256, portable: Boolean = false): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      KmvSetSketch(org.apache.spark.sql.graftshim.ColumnShim.expression(c), k, portable)
        .toAggregateExpression())

  /** PORTABLE hash of a value into [0, PortableMod) — the SQL-mirrorable
    * family (see TextHashKernels.PortableMod): strings go through the
    * base-31 polynomial, integers reduce mod P; both then take two
    * Lehmer steps (x -> 48271·x mod P) to scatter — one step of a
    * multiplicative congruence maps arithmetic progressions to
    * arithmetic progressions, which would bias k-min order statistics.
    * The +1 avoids the 0 fixed point. Accuracy vs xxhash64 is pinned in
    * KmvSketchSpec. */
  def portableHash(v: Any): Long = {
    val P = TextHashKernels.PortableMod
    val base = v match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        TextHashKernels.portableStringHash(s)
      case l: Long => ((l % P) + P) % P
      case i: Int => ((i.toLong % P) + P) % P
      case n: Short => ((n.toLong % P) + P) % P
      case b: Byte => ((b.toLong % P) + P) % P
      case other => throw new IllegalArgumentException( // unreachable: checkInputDataTypes gates
        s"portable KMV supports integral/string values, got ${other.getClass}")
    }
    val x0 = (base + 1) % P
    (48271L * ((48271L * x0) % P)) % P
  }

  /** Estimator for the portable family: hash domain is [0, P), so the
    * k-th minimum maps to (0,1) by /P instead of /2^64. Keys arrive
    * sign-flipped like the xxhash64 path (the flip is order-preserving
    * and value-recoverable). */
  def portableEstimateFromSortedKeys(keys: Array[Long], k: Int): Long =
    if (keys.length < k) keys.length.toLong
    else {
      val kth = (keys.last ^ Long.MinValue).toDouble
      val frac = kth / TextHashKernels.PortableMod.toDouble
      math.max(1L, math.round((k - 1) / frac))
    }

  /** Jaccard estimate between two KMV sets (both built with the same k):
    * take the k smallest of the union, measure the overlap fraction —
    * plain array expressions over the sketch columns, no re-scan of the
    * underlying data. */
  def kmvJaccard(a: Column, b: Column, k: Int = 256): Column = {
    val union = slice(array_sort(array_union(a, b)), 1, k)
    val inBoth = size(filter(union, x => array_contains(a, x) && array_contains(b, x)))
    inBoth.cast("double") / greatest(size(union), lit(1))
  }
}

/** KMV variant evaluating to the sorted k-min hash set (array<long>)
  * instead of the distinct estimate — the composable form. */
case class KmvSetSketch(
    child: Expression,
    k: Int = 256,
    portable: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  private val inner = KmvSketch(child, k, portable)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_set"
  override def checkInputDataTypes(): TypeCheckResult = inner.checkInputDataTypes()

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    inner.createAggregationBuffer()
  override def update(b: java.util.TreeSet[Long], in: InternalRow): java.util.TreeSet[Long] =
    inner.update(b, in)
  override def merge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long]): java.util.TreeSet[Long] =
    inner.merge(a, b)
  override def serialize(b: java.util.TreeSet[Long]): Array[Byte] = inner.serialize(b)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] =
    inner.deserialize(bytes)

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSetSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSetSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSetSketch =
    copy(child = newChildren.head)
}
