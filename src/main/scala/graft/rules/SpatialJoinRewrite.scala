package graft.rules

import graft.geo.{PointInRings, RingsBboxCells}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: a point-in-polygon predicate over a cross product,
  *
  *   points CROSS JOIN polys WHERE point_in_rings(rings, x, y)
  *
  * is an O(|points| x |polys|) nested loop as written. The rule rewrites
  * it into the grid-cell equi-join the [[graft.geo.GeoJoin]] API builds
  * by hand (the reference's habitat-map overlay shape,
  * `/root/reference/src/export_from_vbidwh/check_observed_habitat_type.Rmd:99,148`):
  *
  *   - polygon side gains `explode(bbox_cells(rings, cs))` — every grid
  *     cell its bbox covers, packed (cx << 32 | cy & 0xFFFFFFFF);
  *   - point side gains the same packed cell from floor(x/cs), floor(y/cs)
  *     built from plain Catalyst arithmetic (codegen'd for free);
  *   - the join condition becomes `pointCell = polyCell AND
  *     point_in_rings(...)` — Spark's join planning extracts the
  *     equality as an equi-key, so the cross product disappears and
  *     broadcast/shuffled hash join selection applies as usual.
  *
  * The containment predicate is exact and stays in the condition; the
  * cell equality is implied by it (a containing polygon's bbox covers
  * the point's cell), so the rewrite never changes results — it only
  * removes non-candidates before the test runs.
  *
  * Cell size comes from `spark.graft.geo.cellSize` (default 16.0) and
  * should approximate the median polygon diameter. Fires only on
  * Inner/Cross joins that have NO existing equality conjunct (an
  * equi-join is already not a cross product — and this also makes the
  * rule idempotent, since the rewritten join contains one).
  */
object SpatialJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val CellSizeKey = "spark.graft.geo.cellSize"

  private def cellSize: Double =
    try conf.getConfString(CellSizeKey, "16.0").toDouble
    catch { case _: NumberFormatException => 16.0 }

  private def hasEquality(conjuncts: Seq[Expression]): Boolean =
    conjuncts.exists {
      case _: EqualTo | _: EqualNullSafe => true
      case _ => false
    }

  private def packedPointCell(x: Expression, y: Expression, cs: Double): Expression = {
    def cell(e: Expression) =
      Cast(Floor(Divide(Cast(e, DoubleType), Literal(cs, DoubleType))), LongType)
    BitwiseOr(
      ShiftLeft(cell(x), Literal(32)),
      BitwiseAnd(cell(y), Literal(0xFFFFFFFFL)))
  }

  /** Rewrite `Join(l, r, cond)` if `conjuncts` holds a point_in_rings
    * whose rings come from one side and point coords from the other.
    * The result is wrapped in a Project restoring the ORIGINAL join
    * output (left ++ right) — the Generate adds the internal cell
    * attribute mid-plan, and an optimizer rule must never change the
    * plan's output schema. */
  private def rewrite(left: LogicalPlan, right: LogicalPlan,
                      conjuncts: Seq[Expression]): Option[Project] = {
    if (hasEquality(conjuncts)) return None
    val cs = cellSize
    conjuncts.collectFirst {
      case pir @ PointInRings(rings, x, y)
          if rings.deterministic && x.deterministic && y.deterministic => (pir, rings, x, y)
    }.flatMap { case (_, rings, x, y) =>
      val ptRefs = x.references ++ y.references
      // literal-only sides have empty reference sets and would match
      // either branch vacuously (in practice Catalyst pushes such
      // predicates below the join first, but guard anyway)
      val sides: Option[(LogicalPlan, LogicalPlan, Boolean)] =
        if (ptRefs.isEmpty || rings.references.isEmpty) None
        else if (rings.references.subsetOf(right.outputSet) && ptRefs.subsetOf(left.outputSet))
          Some((left, right, false))
        else if (rings.references.subsetOf(left.outputSet) && ptRefs.subsetOf(right.outputSet))
          Some((right, left, true))
        else None
      sides.map { case (points, polys, swapped) =>
        val cellAttr = AttributeReference("__graft_cell", LongType, nullable = false)()
        val gen = Generate(
          Explode(RingsBboxCells(rings, cs)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(cellAttr), child = polys)
        val cellEq = EqualTo(packedPointCell(x, y, cs), cellAttr)
        val cond = (conjuncts :+ cellEq).reduce(And)
        val join =
          if (swapped) Join(gen, points, Inner, Some(cond), JoinHint.NONE)
          else Join(points, gen, Inner, Some(cond), JoinHint.NONE)
        Project(left.output ++ right.output, join)
      }
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, Join(l, r, Inner | Cross, None, _)) =>
      rewrite(l, r, splitConjunctivePredicates(cond)).getOrElse(f)
    case j @ Join(l, r, Inner | Cross, Some(cond), _) =>
      rewrite(l, r, splitConjunctivePredicates(cond)).getOrElse(j)
  }
}
