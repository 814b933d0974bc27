package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Optimizer rule — the `Rule[LogicalPlan]` tier of the extension ladder:
  * `size(array_intersect(a, b))` rewrites to
  * `cast(sorted_intersect_count(a, b) as int)` when BOTH sides are
  * provably sorted, distinct, null-free long arrays in the same
  * expression tree. The built-in builds a hash set and materializes the
  * intersection array just to take its length; the rewrite counts in one
  * zero-allocation merge pass (the measured win behind
  * [[SortedIntersectCount]]) — users writing the natural form get the
  * fast path without knowing it exists.
  *
  * Soundness guards (all three load-bearing):
  *  - sorted: the side IS an ascending `sort_array` / default-comparator
  *    `array_sort` node (the merge needs order);
  *  - distinct: the sort's DIRECT child is `array_distinct`
  *    (array_intersect dedups, the merge counts min-multiplicity — equal
  *    only on sets; an array_distinct merely somewhere BELOW the sort
  *    proves nothing, since a concat/transform above it can reintroduce
  *    duplicates);
  *  - long element type, `containsNull = false` (the merge reads raw
  *    longs; null elements also sort differently across the two sort
  *    functions);
  *  - `size`'s legacySizeOfNull = false (legacy returns −1 on null, the
  *    merge returns null).
  * Conservative by design: an attribute that happens to hold a sorted
  * array does not match — provability is per-expression-tree, the same
  * bar Catalyst's own rewrites hold themselves to. */
object SortedIntersectRewrite extends Rule[LogicalPlan] {

  /** The analyzed form of ArraySort.defaultComparator:
    * (l, r) -> if (l < r) -1 else if (l > r) 1 else 0 — matched
    * structurally (the unresolved default doesn't semanticEquals the
    * bound lambda the analyzer produces). Anything else could sort
    * descending or by key, so anything else doesn't match. */
  private def isDefaultComparator(f: Expression): Boolean = f match {
    case LambdaFunction(
        If(LessThan(a1, b1), Literal(m1, _),
          If(GreaterThan(a2, b2), Literal(p1, _), Literal(z, _))),
        Seq(x, y), _) =>
      m1 == -1 && p1 == 1 && z == 0 &&
        a1.semanticEquals(x) && b1.semanticEquals(y) &&
        a2.semanticEquals(x) && b2.semanticEquals(y)
    case _ => false
  }

  private def sortedDistinctLongs(e: Expression): Boolean = {
    val sortedChild = e match {
      case SortArray(c, Literal(true, _)) => Some(c)
      case as: ArraySort if isDefaultComparator(as.function) =>
        Some(as.argument)
      case _ => None
    }
    sortedChild.exists { c =>
      c.isInstanceOf[ArrayDistinct] &&
        (e.dataType match {
          case ArrayType(LongType, containsNull) => !containsNull
          case _ => false
        })
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), false)
          if sortedDistinctLongs(a) && sortedDistinctLongs(b) =>
        Cast(SortedIntersectCount(a, b), IntegerType)
    }
}
