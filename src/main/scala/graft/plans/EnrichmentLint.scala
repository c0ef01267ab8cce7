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

  /** Speculation guard: true when the session runs with
    * `spark.speculation=true` AND the plan contains an imperative
    * (enrichment-capable) stage. Speculative execution launches
    * DUPLICATE copies of slow tasks by design — with a live LLM/OCR
    * client inside mapPartitions that means double-charged calls (and,
    * at temperature > 0, divergent results) even when nothing fails.
    * The replay cache (enrich.CachingEnricher) de-duplicates retries
    * keyed by content, but a speculative twin racing the original can
    * still both miss the not-yet-written record and both call the
    * API — so speculation stays OFF for enrichment stages, and this
    * lint is the machine check. */
  def speculationHazard(ds: Dataset[_],
      speculating: Option[Boolean] = None): Boolean = {
    // spark.speculation is a core (launch-time) conf: the scheduler
    // reads the SparkConf, never a session override — so the lint
    // reads the same source. `speculating` injects the flag for tests
    // (a live context's conf cannot be flipped at runtime).
    val on = speculating.getOrElse(
      ds.sparkSession.sparkContext.getConf
        .getBoolean("spark.speculation", defaultValue = false))
    on && {
      var imperative = false
      ds.queryExecution.analyzed.foreach { n =>
        if (isImperative(n)) imperative = true
      }
      imperative
    }
  }

  /** Loud form of [[speculationHazard]] for pipeline entry points:
    * throws with remediation instead of returning a flag. */
  def requireNoSpeculation(ds: Dataset[_],
      speculating: Option[Boolean] = None): Unit =
    if (speculationHazard(ds, speculating))
      throw new IllegalStateException(
        "spark.speculation=true with an enrichment stage in the plan: " +
          "speculative duplicate tasks double-call the live client even " +
          "without failures. Disable speculation for enrichment jobs " +
          "(spark.speculation=false) or route calls through a replay " +
          "cache AND accept the residual double-call race.")
}
