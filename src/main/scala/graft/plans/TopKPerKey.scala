package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending,
  Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Which rank function's `<= k` semantics the limiter implements:
  *  - [[TopKMode.RowNum]] — exactly k rows per key (arbitrary tie order);
  *  - [[TopKMode.Rank]] — all rows with rank ≤ k: ties at the boundary
  *    are KEPT, so a key can emit more than k rows;
  *  - [[TopKMode.Dense]] — all rows of the top k DISTINCT sort values.
  * Rank/Dense memory is bounded by k distinct values plus the boundary
  * tie group (pathological all-equal input degenerates to the full key
  * group — same hazard profile as Spark's own rank-based
  * WindowGroupLimit). */
sealed trait TopKMode extends Serializable
object TopKMode {
  case object RowNum extends TopKMode
  case object Rank extends TopKMode
  case object Dense extends TopKMode
}

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
    child: LogicalPlan,
    mode: TopKMode = TopKMode.RowNum) extends UnaryNode {
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
    child: SparkPlan,
    mode: TopKMode = TopKMode.RowNum) extends UnaryExecNode {

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
    val modeLocal = mode
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      // ordering.compare(a,b) < 0  ⇔  a sorts before b (a is "better")
      val ordering = RowOrdering.create(sortLocal, childOutput)
      import scala.jdk.CollectionConverters._
      modeLocal match {
        case TopKMode.RowNum =>
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
          heaps.values().iterator().asScala.flatMap(_.iterator().asScala)

        case rankMode =>
          // rank / dense_rank: tie groups in a TreeMap ordered best-first.
          // Rank keeps the worst group while rows-strictly-better < k;
          // dense keeps at most k groups. Both prunes are idempotent and
          // per-partition-safe (a globally-ranked-≤k row is ranked ≤k in
          // any subset), so partial and final phases run the same pass.
          val dense = rankMode == TopKMode.Dense
          final class KeyState {
            val groups = new java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]](ordering)
            var total = 0
          }
          val states = new java.util.HashMap[UnsafeRow, KeyState]()
          while (iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            var st = states.get(key)
            if (st == null) { st = new KeyState; states.put(key.copy(), st) }
            // quick reject: strictly worse than the worst kept group of a
            // group-set that already covers k (ties are never rejected)
            val reject = !st.groups.isEmpty &&
              ordering.compare(row, st.groups.lastKey()) > 0 &&
              (if (dense) st.groups.size >= kLocal else st.total >= kLocal)
            if (!reject) {
              val copied = row.copy()
              var g = st.groups.get(copied)
              if (g == null) {
                g = new java.util.ArrayList[InternalRow](1)
                st.groups.put(copied, g)
              }
              g.add(copied)
              st.total += 1
              if (dense) {
                while (st.groups.size > kLocal) {
                  val ev = st.groups.pollLastEntry()
                  st.total -= ev.getValue.size
                }
              } else {
                var last = st.groups.lastEntry()
                while (st.groups.size > 1 && st.total - last.getValue.size >= kLocal) {
                  st.groups.pollLastEntry()
                  st.total -= last.getValue.size
                  last = st.groups.lastEntry()
                }
              }
            }
          }
          states.values().iterator().asScala.flatMap(
            _.groups.values().iterator().asScala.flatMap(_.iterator().asScala))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  import org.apache.spark.sql.DataFrame

  /** Top-k rows per key. `sort` is (column, ascending) — the FIRST rows
    * under that order are kept; include tiebreak columns for
    * deterministic results (RowNum mode), or pick [[TopKMode.Rank]] /
    * [[TopKMode.Dense]] for tie-keeping semantics. */
  def perKey(
      df: DataFrame, keyCols: Seq[String],
      sort: Seq[(String, Boolean)], k: Int,
      mode: TopKMode = TopKMode.RowNum): DataFrame = {
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
    def attr(name: String): Attribute = {
      val matches = lp.output.filter(_.name.equalsIgnoreCase(name))
      matches match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $name not in ${lp.output.map(_.name).mkString(", ")}")
        case many =>
          // exact match wins; otherwise the reference is genuinely
          // ambiguous (columns differing only in case) — refuse rather
          // than bind the first candidate
          many.find(_.name == name).getOrElse(throw new IllegalArgumentException(
            s"column $name is ambiguous among ${many.map(_.name).mkString(", ")}"))
      }
    }
    val keys = keyCols.map(attr)
    val so = sort.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graftshim.ColumnShim.ofRows(
      df.sparkSession, TopKPerKeyNode(keys, so, k, lp, mode))
  }
}
