package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins/aggregations for hot keys.
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one key dominates a shuffle so badly that even
  * split partitions overload a task (SURVEY §7.4: one fat EY chapter), or
  * when AQE is unavailable (streaming state stores).
  *
  * Contract: salting is semantically invisible — the salted join returns
  * exactly the plain join's rows (the oracle checks this literally).
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, with the fact side salted into
    * `salts` sub-keys (deterministic hash of the whole row) and the dim
    * side replicated once per salt. The shuffle key becomes (key, salt),
    * splitting a hot key across `salts` tasks. Dim must be small enough
    * to replicate ×salts (it was broadcast-size anyway — salting matters
    * when the JOIN OUTPUT of the hot key overloads a task). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(fact.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation for additive aggregates on a skewed
    * group key: partial by (key, salt), final by key. Spark's hash
    * aggregate already does map-side partials; this shapes the SHUFFLE
    * itself when a single group's partials overload one reducer. Caller
    * supplies additive (expr, resultName) pairs built on the value col. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"),
        sum(col("_n")).as("n_rows"))
}
