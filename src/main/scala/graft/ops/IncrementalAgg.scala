package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the daily-refresh answer to
  * "don't rescan 100 TB to update a dashboard": per-group aggregate
  * STATE (count / sum / sum-of-squares / min / max) is algebraic, so
  * yesterday's persisted state plus today's delta-batch state merge by
  * re-aggregation into exactly the full-recompute result. The engine's
  * own partial-aggregate pushdown is the same algebra within one job;
  * this op lifts it across job boundaries (state persists as a tiny
  * parquet between runs).
  *
  * Scale shape: each `state` call is ONE partial-combined aggregate over
  * its input (the delta — typically 0.1% of the corpus); `merge` is an
  * aggregate over |groups|·|states| rows — metadata-scale. The final
  * report derives mean and population variance from the merged sums in
  * exact integer/decimal arithmetic (the variance numerator n·ss − s²
  * stays in DECIMAL(38,0); only the final division is a double).
  *
  * The correctness claim — merge(state(A), state(B)) ≡ state(A ∪ B) for
  * any split — is pinned two ways: IncrementalAggSpec asserts it inside
  * Spark for 1/2/3-way splits, and the registered query's DuckDB oracle
  * computes the full aggregate DIRECTLY while Spark goes through the
  * split-and-merge path, so the hash compare proves the algebra against
  * an independent engine.
  */
object IncrementalAgg {

  /** Mergeable per-group state over a long-valued measure column:
    * (group, n, s, ss, min_v, max_v). `ss` accumulates in DECIMAL(38,0)
    * — at 10¹² rows of 10⁵-magnitude values the sum of squares passes
    * int64, and decimal aggregation is exact and order-free.
    *
    * `n` counts NON-NULL values (count(valueCol), not COUNT(*)) so every
    * component of the state describes the same row population — with a
    * nullable measure, a row-count n would dilute mean and variance
    * while s/ss/min/max silently skipped the NULLs (r12 ADVICE; the
    * registered oracle mirrors COUNT(valueCol) for the same reason). */
  def state(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol)).agg(
      count(col(valueCol)).as("n"),
      sum(col(valueCol)).as("s"),
      sum(col(valueCol).cast("decimal(38,0)") * col(valueCol)).as("ss"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Merge any number of state frames by re-aggregation. Associative and
    * commutative — state(A)+state(B) = state(A∪B) for every component. */
  def merge(groupCol: String, states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "merge of zero state frames")
    states.reduce(_.unionByName(_)).groupBy(col(groupCol)).agg(
      sum(col("n")).cast("long").as("n"),
      sum(col("s")).cast("long").as("s"),
      sum(col("ss")).cast("decimal(38,0)").as("ss"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))
  }

  /** Human-facing report off a merged state: mean and population
    * variance in engine-portable arithmetic. `ss` crosses the compare
    * boundary as digit STRING (the HLL convention — its magnitude can
    * pass int64 and DuckDB would widen to HUGEINT). Variance uses
    * E[x²] − E[x]² in DOUBLES rather than the exact-decimal numerator
    * (n·ss − s²)/n²: the inputs ss and s are exact below 2⁵³ for
    * cents-scale measures, so every step is a deterministic IEEE basic
    * op — whereas converting the int128-magnitude exact numerator to
    * double is not guaranteed correctly-rounded in every engine. */
  def report(state: DataFrame, groupCol: String): DataFrame = {
    val meanSq = col("ss").cast("double") / col("n")
    val mean = col("s").cast("double") / col("n")
    state.select(col(groupCol), col("n"), col("s"),
      col("ss").cast("string").as("ss"),
      col("min_v"), col("max_v"),
      round(mean, 6).as("mean"),
      round(meanSq - mean * mean, 6).as("variance"))
  }
}
