package graft

/** Plan-shape invariants over EVERY driver-contract query — the guard
  * that keeps future rounds from shipping a plan that works at test SF
  * and detonates at scale. A CartesianProduct node means a join lost
  * its keys (or a broadcast hint): the deliberate whole-relation
  * products in this codebase (ANN scoring, singleton dimension
  * products) plan as BroadcastNestedLoopJoin, never CartesianProduct. */
class PlanGuardSpec extends SparkSuite {

  test("no query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          // sparkPlan: the pre-AQE physical plan — what the optimizer
          // committed to from statistics, not what runtime luck fixed
          val plan = fn(spark, dir).queryExecution.sparkPlan.toString
          if (plan.contains("CartesianProduct")) Some(s"$name: CartesianProduct")
          else None
        } catch {
          case e: Throwable => Some(s"$name: planning failed: ${e.getMessage}")
        }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
