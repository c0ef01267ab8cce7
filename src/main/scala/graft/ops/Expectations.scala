package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, evaluated in ONE aggregation
  * pass — the generic face of the reference's hand-written validation
  * stages (V1–V10 are each a specific instance of these checks). A
  * suite of N checks over a 100 TB table costs one scan + one global
  * aggregate regardless of N: every check contributes a conditional
  * count to the same `agg`, partials combine map-side, and the report
  * (one row per check) is exploded from the single result row.
  * `unique` is the one check needing distinct state (count −
  * countDistinct, exact); everything else is a pure running count.
  *
  * The report is deterministic and recomputable in plain SQL, so a
  * registered expectations query is hash-oracle-checkable like any
  * other operator.
  */
object Expectations {

  sealed trait Check {
    def column: String
    def name: String
    private[Expectations] def violations: Column
  }

  /** NULL cells. */
  final case class NotNull(column: String) extends Check {
    val name = s"not_null($column)"
    private[Expectations] def violations: Column =
      count(when(col(column).isNull, 1))
  }

  /** Duplicated non-null values (count − distinct; NULLs are
    * [[NotNull]]'s business). */
  final case class Unique(column: String) extends Check {
    val name = s"unique($column)"
    private[Expectations] def violations: Column =
      count(col(column)) - countDistinct(col(column))
  }

  /** Non-null values outside [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    val name = s"in_range($column)"
    private[Expectations] def violations: Column =
      count(when(col(column) < lo || col(column) > hi, 1))
  }

  /** Non-null values not matching the (engine-portable) regex. */
  final case class Matches(column: String, pattern: String) extends Check {
    val name = s"matches($column)"
    private[Expectations] def violations: Column =
      count(when(col(column).isNotNull && !col(column).rlike(pattern), 1))
  }

  /** One row per check: (check, column, violations, n_rows, pass),
    * ordered as given. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no expectations given")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name)}")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.violations.cast("long").as(s"__v$i")
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = array(checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        col(s"__v$i").as("violations"), col("__n").as("n_rows"),
        (col(s"__v$i") === 0L).as("pass"))
    }: _*)
    one.select(explode(rows).as("r"))
      .select(col("r.check"), col("r.column"), col("r.violations"),
        col("r.n_rows"), col("r.pass"))
  }
}
