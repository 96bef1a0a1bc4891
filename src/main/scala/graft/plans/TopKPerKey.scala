package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending,
  Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension (SURVEY.md §7.3(c)): top-k rows PER KEY.
  *
  * Spark's idiom — `row_number().over(Window.partitionBy(keys).orderBy
  * (ord)) <= k` — SORTS every key group in full, O(n log n) per
  * partition with the whole partition materialized. This operator keeps
  * a bounded heap of k rows per key instead: O(n log k) time, O(keys×k)
  * memory, and — like partial aggregation — a map-side phase prunes to
  * ≤k rows per (partition, key) BEFORE the shuffle, so at 100 TB the
  * exchange moves O(partitions × keys × k) rows, not the corpus.
  *
  * Full stack: logical node → [[TopKPerKeyStrategy]] (injected via
  * SparkSessionExtensions) → two [[TopKPerKeyExec]] phases with the
  * shuffle requirement expressed as ClusteredDistribution, so
  * EnsureRequirements/AQE place (and can skip) the exchange exactly as
  * they would for an aggregation.
  *
  * Output rows are the original child rows, in no guaranteed order —
  * callers add a final orderBy for presentation (tiny: ≤ keys×k rows).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k=$k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical phase: `partial = true` runs pre-shuffle on arbitrary
  * partitioning; `partial = false` requires co-location by key. Both run
  * the identical bounded-heap pass (idempotent under re-application). */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  // rows are only filtered, never re-keyed: preserve the child's
  // partitioning (like aggregation execs) so an already-clustered input
  // skips the exchange and downstream per-key ops don't re-shuffle
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val sortLocal = sortOrder
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      // ordering.compare(a,b) < 0  ⇔  a sorts before b (a is "better")
      val ordering = RowOrdering.create(sortLocal, childOutput)
      // heap head = WORST kept row (reverse ordering) — O(log k) evict
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ordering.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity stays small — k can exceed group sizes by
          // orders of magnitude and PriorityQueue grows dynamically
          heap = new java.util.PriorityQueue[InternalRow](math.min(kLocal, 16), cmp)
          heaps.put(key.copy(), heap) // projection buffer is reused — copy
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  import org.apache.spark.sql.DataFrame

  /** Top-k rows per key. `sort` is (column, ascending) — the FIRST rows
    * under that order are kept; include tiebreak columns for
    * deterministic results. */
  def perKey(
      df: DataFrame, keyCols: Seq[String],
      sort: Seq[(String, Boolean)], k: Int): DataFrame = {
    // self-register the planner strategy for sessions that did not load
    // GraftExtensions. The check goes through planner.strategies (which
    // includes BOTH extension-injected and experimental strategies), and
    // the read-modify-write is synchronized — concurrent perKey calls on
    // one session must not double-append.
    val spark = df.sparkSession
    val strategy = org.apache.spark.sql.graftshim.TopKPerKeyStrategy
    val exp = spark.experimental
    exp.synchronized {
      val registered = org.apache.spark.sql.graftshim.ColumnShim
        .plannerStrategies(spark).contains(strategy)
      if (!registered) exp.extraStrategies = exp.extraStrategies :+ strategy
    }
    val lp = df.queryExecution.analyzed
    def attr(name: String): Attribute = lp.output
      .find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${lp.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(attr)
    val so = sort.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graftshim.ColumnShim.ofRows(
      df.sparkSession, TopKPerKeyNode(keys, so, k, lp))
  }
}
