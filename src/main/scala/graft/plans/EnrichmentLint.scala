package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical._

/** SURVEY §4's one recommended custom-rule surface: a plan-walk LINT (not a
  * rewrite) that flags non-idempotent enrichment operators at risk of
  * re-execution.
  *
  * An enrichment stage (`mapPartitions`/`flatMapGroups` calling an external
  * client) re-runs its calls whenever its subtree is evaluated again — a
  * second action, a re-derived branch, or task retry. With a live LLM that
  * means double spend and (at temp>0) divergent results. The lint walks a
  * Dataset's analyzed plan and reports every imperative node plus whether
  * the plan references it from more than one branch — the caller decides
  * to `persist()` or checkpoint before fan-out.
  */
object EnrichmentLint {

  final case class Finding(nodeClass: String, occurrences: Int, multiBranch: Boolean)

  /** True for logical nodes that execute arbitrary user code (the only
    * places enrichment clients can live). */
  private def isImperative(p: LogicalPlan): Boolean = p match {
    case _: MapPartitions | _: MapElements | _: MapGroups |
         _: FlatMapGroupsWithState | _: CoGroup => true
    case _: DeserializeToObject | _: SerializeFromObject => false
    case _ => false
  }

  /** Collect imperative nodes; `multiBranch` marks nodes whose identical
    * subtree appears under more than one parent branch (the re-execution
    * hazard: each branch evaluates the enrichment independently unless the
    * result is persisted). */
  def check(ds: Dataset[_]): Seq[Finding] = {
    val plan = ds.queryExecution.analyzed
    val seen = scala.collection.mutable.Map[String, Int]()
    plan.foreach { node =>
      if (isImperative(node)) {
        // canonicalized subtree identity → structural duplicates collapse
        val key = node.canonicalized.toString
        seen(key) = seen.getOrElse(key, 0) + 1
      }
    }
    seen.toSeq.map { case (key, n) =>
      val cls = key.takeWhile(_ != ' ').stripPrefix("'")
      Finding(cls, n, multiBranch = n > 1)
    }.sortBy(-_.occurrences)
  }

  /** Convenience gate for pipelines: true when any enrichment subtree is
    * referenced from multiple branches without an intervening persist. */
  def hasReexecutionRisk(ds: Dataset[_]): Boolean =
    check(ds).exists(_.multiBranch)
}
