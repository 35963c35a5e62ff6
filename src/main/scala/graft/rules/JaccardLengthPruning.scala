package graft.rules

import graft.functions.JaccardSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Optimizer rule: filters of the form
  *
  *   jaccard_similarity(a, b) >= t      (optionally wrapped in round(., d))
  *
  * imply a cheap necessary condition on the DISTINCT set sizes:
  *
  *   J(A,B) >= t  ==>  |A| >= t*|B|  and  |B| >= t*|A|
  *
  * (|A ∩ B| <= min(|A|,|B|) and |A ∪ B| >= max(|A|,|B|)). The rule
  * conjoins `size(a)*1.0 >= t' * size(b)` (and symmetric) so candidate
  * pairs with incompatible set sizes are dropped BEFORE the O(n log n)
  * hash-merge jaccard kernel runs. t' backs off by 1e-6 to stay sound
  * under the round() wrapper. Inputs to the jaccard verifiers are
  * already distinct arrays (Dedup builds them with array_distinct), so
  * array size == set size.
  *
  * Idempotent: the generated conjuncts are checked for semantic
  * presence before adding — a second optimizer pass is a no-op.
  */
object JaccardLengthPruning extends Rule[LogicalPlan] {

  private def prefilters(j: JaccardSimilarity, t: Double): Seq[Expression] = {
    val tSafe = math.max(0.0, t - 1e-6)
    def sz(e: Expression) = Cast(Size(e, legacySizeOfNull = false), DoubleType)
    Seq(
      GreaterThanOrEqual(sz(j.left), Multiply(Literal(tSafe, DoubleType), sz(j.right))),
      GreaterThanOrEqual(sz(j.right), Multiply(Literal(tSafe, DoubleType), sz(j.left))))
  }

  /** Extract (jaccard, threshold) from `expr >= lit` shapes. */
  private def thresholdOf(e: Expression): Option[(JaccardSimilarity, Double)] = e match {
    case GreaterThanOrEqual(j: JaccardSimilarity, DoubleLit(t)) => Some((j, t))
    case GreaterThanOrEqual(Round(j: JaccardSimilarity, _, _), DoubleLit(t)) => Some((j, t))
    case GreaterThan(j: JaccardSimilarity, DoubleLit(t)) => Some((j, t))
    case GreaterThan(Round(j: JaccardSimilarity, _, _), DoubleLit(t)) => Some((j, t))
    case LessThanOrEqual(DoubleLit(t), j: JaccardSimilarity) => Some((j, t))
    case LessThanOrEqual(DoubleLit(t), Round(j: JaccardSimilarity, _, _)) => Some((j, t))
    case _ => None
  }

  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val extra = conjuncts.flatMap(thresholdOf)
        .flatMap { case (j, t) => if (t > 0) prefilters(j, t) else Nil }
        .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
        .distinct
      if (extra.isEmpty) f
      else Filter((extra :+ cond).reduceLeft(And), child)
  }
}
