package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  DenseRank, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Literal, PredicateHelper, Rank, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, Limit,
  LocalLimit, LogicalPlan, Project, Sort, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (SparkSessionExtensions.injectOptimizerRule) for the
  * per-key top-k idiom `Filter(rn <= k)` over a `row_number()`, `rank()`
  * or `dense_rank()` window (the latter two keep boundary ties via the
  * matching [[TopKMode]] in the heap operator).
  *
  * Spark's builtin InferWindowGroupLimit (3.5+, threshold-guarded) already
  * prunes this idiom — but its partial phase needs a FULL LOCAL SORT of
  * every raw partition before the limiter. This rule adds what the
  * builtin cannot:
  *
  *  1. **Heap pre-prune** (partitioned case): [[TopKPerKeyNode]] under
  *     the window keeps k rows per key in O(n log k) with NO sort of the
  *     raw input. The builtin may still stack its WindowGroupLimit above
  *     our node — that pass runs over ≤ keys×k rows and is negligible,
  *     while the expensive raw-partition sort is avoided.
  *  2. **Window elision** (rank unused): `Project(..no rn..)` over the
  *     idiom drops the Filter AND the Window entirely — no rank sort at
  *     all, just the heap operator. The builtin must keep the window.
  *  3. **Global top-k** (empty partition spec): `Sort + Limit k` under
  *     the window plans as TakeOrderedAndProject (per-partition bounded
  *     heaps + one tiny merge) instead of a single-partition sort.
  *
  * Guards: order expressions must be deterministic (the heap comparator
  * re-evaluates them per comparison); k is capped at [[MaxK]] — heaps
  * hold k rows per key in memory with no spill, unlike the window sort;
  * bound extraction is underflow-safe; already-rewritten children
  * (TopKPerKeyNode / Limit / WindowGroupLimit) are skipped.
  */
object TopKRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Above this, the no-spill heap's O(keys×k) memory becomes a worse
    * trade than the window's spillable sort — refuse to fire. */
  val MaxK = 10000

  /** k such that `pred` ⇒ rn <= k, if pred is such a bound. */
  private def bound(pred: Expression, rn: Attribute): Option[Int] = {
    object IntLit {
      def unapply(e: Expression): Option[Int] = e match {
        case Literal(v: Int, IntegerType) => Some(v)
        case _ => None
      }
    }
    pred match {
      case LessThanOrEqual(a: Attribute, IntLit(k)) if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntLit(k)) if a.semanticEquals(rn) && k > Int.MinValue =>
        Some(k - 1)
      case GreaterThanOrEqual(IntLit(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
      case GreaterThan(IntLit(k), a: Attribute) if a.semanticEquals(rn) && k > Int.MinValue =>
        Some(k - 1)
      case EqualTo(a: Attribute, IntLit(1)) if a.semanticEquals(rn)         => Some(1)
      case EqualTo(IntLit(1), a: Attribute) if a.semanticEquals(rn)         => Some(1)
      case _ => None
    }
  }

  private def alreadyRewritten(child: LogicalPlan): Boolean = child match {
    case _: TopKPerKeyNode => true
    case _: GlobalLimit | _: LocalLimit => true // global variant emitted a Limit
    case _: WindowGroupLimit => true // the builtin got here first
    case _ => false
  }

  /** Extract (rnAttr, k, residual conjuncts, window, mode) when `f` is
    * the rewritable idiom — over row_number(), rank() or dense_rank()
    * (mode picks the matching tie semantics in the heap operator).
    * `residual` are the conjuncts of the filter that are NOT rank
    * bounds — bounds themselves are all subsumed by the chosen
    * k = min(bounds) (every kept row has rank in 1..k, and the
    * `rn == 1` form only extracts when k would be 1), so dropping the
    * Filter is safe exactly when `residual` is empty. */
  private object TopKIdiom {
    def unapply(f: Filter): Option[(Attribute, Int, Seq[Expression], Window, TopKMode)] =
      f match {
        case Filter(cond,
            w @ Window(Seq(alias @ Alias(WindowExpression(rankFn, _), _)),
              _, order, child, _))
            if order.nonEmpty && order.forall(_.deterministic) &&
              !alreadyRewritten(child) =>
          val mode = rankFn match {
            case RowNumber() => Some(TopKMode.RowNum)
            case _: Rank => Some(TopKMode.Rank)
            case _: DenseRank => Some(TopKMode.Dense)
            case _ => None
          }
          mode.flatMap { m =>
            val rn = alias.toAttribute
            val conjuncts = splitConjunctivePredicates(cond)
            val (bounds, residual) =
              conjuncts.partition(p => bound(p, rn).isDefined)
            bounds.flatMap(p => bound(p, rn)).sorted.headOption
              .filter(k => k > 0 && k <= MaxK)
              .map(k => (rn, k, residual, w, m))
          }
        case _ => None
      }
  }

  // top-down so the Project case claims the idiom before the bare-Filter
  // case rewrites the Filter underneath it
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // rank column unused above the filter: drop Window (and the rn-bound
    // conjuncts) — the heap operator alone produces the k rows per key.
    // Non-bound conjuncts survive as a residual Filter above the heap;
    // a residual that references rn cannot be evaluated without the
    // window, so that shape falls through to the Filter case below.
    case p @ Project(plist, TopKIdiom(rn, k, residual, w, mode))
        if w.partitionSpec.nonEmpty &&
          !plist.exists(_.references.contains(rn)) &&
          !residual.exists(_.references.contains(rn)) &&
          plist.forall(_.references.subsetOf(w.child.outputSet)) &&
          residual.forall(_.references.subsetOf(w.child.outputSet)) =>
      val pruned = TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, w.child, mode)
      p.copy(child =
        residual.reduceOption(And).map(Filter(_, pruned)).getOrElse(pruned))

    case f @ TopKIdiom(_, k, _, w, mode) if w.partitionSpec.nonEmpty =>
      f.copy(child = w.copy(child =
        TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, w.child, mode)))

    case f @ TopKIdiom(_, k, _, w, TopKMode.RowNum) =>
      // global top-k: Sort + Limit plans as TakeOrderedAndProject.
      // RowNumber ONLY: Limit(k) would drop boundary ties that a global
      // rank()/dense_rank() bound must keep.
      f.copy(child = w.copy(child =
        Limit(Literal(k), Sort(w.orderSpec, global = true, w.child))))
  }
}
