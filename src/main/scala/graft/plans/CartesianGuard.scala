package graft.plans

import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Runtime cartesian guard — PlanGuardSpec's default-deny invariant as
  * an OPTIMIZER RULE, for deployments that want the ban enforced on
  * ad-hoc production queries, not just on the test-pinned surface. Off
  * by default; a session opts in with `spark.graft.guard.cartesian=true`
  * (the conf is read per plan compile, so it can be flipped around a
  * known-safe statement).
  *
  * The rule runs in the user-provided optimizer batch — AFTER predicate
  * pushdown, so a `a.join(b).filter(a.id === b.id)` that OPTIMIZES to
  * an equi-join is not a false positive (at analysis time the same
  * query still looks like a condition-less join under a filter, which
  * is why this is not an analysis check). A join is flagged when it has
  * NO condition, an inner/cross type, and NEITHER side is structurally
  * bounded — a global aggregate (exactly one row), an explicit limit,
  * or a literal local frame, walked through row-preserving wrappers
  * (the logical-plan mirror of PlanGuardSpec.boundedBuild). The
  * engine's own labeled stat-frame cross joins all pass that test by
  * construction.
  */
object CartesianGuard {

  /** Session conf key enabling the guard (default: off). */
  val EnabledKey = "spark.graft.guard.cartesian"

  /** Structurally bounded logical subtree: global aggregate, limit, or
    * literal frame, through row-preserving (or row-reducing) wrappers
    * only — an unbounded scan can never be masked. */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case a: Aggregate => a.groupingExpressions.isEmpty
    case _: GlobalLimit | _: LocalLimit => true
    case _: OneRowRelation => true
    case _: LocalRelation => true // literal frame: rows known at plan time
    case w @ (_: Project | _: Filter | _: Sort | _: SubqueryAlias |
        _: ResolvedHint | _: Repartition | _: RepartitionByExpression) =>
      bounded(w.children.head)
    case _ => false
  }

  object Rule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (conf.getConfString(EnabledKey, "false").toBoolean) {
        plan.foreach {
          case j: Join if j.condition.isEmpty &&
              (j.joinType == Inner || j.joinType == Cross) &&
              !bounded(j.left) && !bounded(j.right) =>
            throw new IllegalStateException(
              "CartesianGuard: condition-less inner/cross join with no " +
                "structurally bounded side — at corpus scale this is an " +
                "N^2 explosion. Add an equi-join key, bound one side " +
                s"(limit / global aggregate), or unset $EnabledKey for " +
                "a deliberate exception.\n" + j.simpleString(3))
          case _ => ()
        }
      }
      plan
    }
  }
}
