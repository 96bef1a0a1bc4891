package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Literal, PredicateHelper, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, Limit,
  LocalLimit, LogicalPlan, Sort, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (SparkSessionExtensions.injectOptimizerRule): rewrite
  * the per-key top-k idiom
  *
  * {{{ Filter(rn <= k, Window(row_number() AS rn, partitionBy P orderBy O, child)) }}}
  *
  * into the same plan with [[TopKPerKeyNode]] inserted UNDER the window:
  *
  * {{{ Filter(rn <= k, Window(row_number() AS rn, P, O, TopKPerKey(P, O, k, child))) }}}
  *
  * The window still computes ranks — but over ≤ k rows per key, pruned
  * map-side by bounded heaps BEFORE the exchange, instead of sorting and
  * shuffling every row. Ranks of the surviving rows are unchanged: the
  * heap keeps exactly (a valid choice of) the k first rows per key under
  * (P, O), which is the set the filter would keep. Users keep writing
  * the standard window idiom; the optimizer swaps in the scale shape.
  *
  * A GLOBAL row_number (empty partition spec) gets the complementary
  * rewrite: a `Sort + Limit k` is inserted under the window instead,
  * which Spark plans as TakeOrderedAndProject — per-partition top-k
  * merged on one reducer — rather than sorting the WHOLE input in a
  * single partition (the naive plan for an unpartitioned window, and a
  * guaranteed incident at scale). The window then ranks just k rows.
  *
  * Fires only when ALL of:
  *  - the window computes exactly one expression, a row_number();
  *  - the order spec is non-empty (unordered row_number is
  *    nondeterministic);
  *  - some conjunct of the filter bounds that row_number by a positive
  *    integer literal (<=, <, =1 and mirrored forms);
  *  - the child is not already rewritten (fixed-point safety).
  */
object TopKRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

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
      case LessThan(a: Attribute, IntLit(k)) if a.semanticEquals(rn)        => Some(k - 1)
      case GreaterThanOrEqual(IntLit(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
      case GreaterThan(IntLit(k), a: Attribute) if a.semanticEquals(rn)     => Some(k - 1)
      case EqualTo(a: Attribute, IntLit(1)) if a.semanticEquals(rn)         => Some(1)
      case EqualTo(IntLit(1), a: Attribute) if a.semanticEquals(rn)         => Some(1)
      case _ => None
    }
  }

  private def alreadyRewritten(child: LogicalPlan): Boolean = child match {
    case _: TopKPerKeyNode => true
    case _: GlobalLimit | _: LocalLimit => true // global variant emitted a Limit
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          part, order, child, _))
        if order.nonEmpty && !alreadyRewritten(child) =>
      val rn = alias.toAttribute
      val k = splitConjunctivePredicates(cond).flatMap(p => bound(p, rn)).sorted.headOption
      k match {
        case Some(kv) if kv > 0 && part.nonEmpty =>
          f.copy(child = w.copy(child = TopKPerKeyNode(part, order, kv, child)))
        case Some(kv) if kv > 0 =>
          // global top-k: Sort + Limit plans as TakeOrderedAndProject
          f.copy(child = w.copy(child =
            Limit(Literal(kv), Sort(order, global = true, child))))
        case _ => f
      }
  }
}
