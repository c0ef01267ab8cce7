package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the most recent right row with the
  * same key and `right.ts <= left.ts` (inclusive; left semantics: no
  * prior right row → nulls). Spark has no native ASOF operator; the
  * scalable formulation is NOT an inequality join (which plans as a
  * range/nested-loop join and degenerates on long histories) but
  * union + tag + one partitioned running-`last` window:
  *
  *   union(left tagged 1, right tagged 0)
  *     → Window.partitionBy(key).orderBy(ts, side, rightId)
  *     → last(right payload, ignoreNulls) over unboundedPreceding..current
  *     → keep left rows
  *
  * One shuffle on the key, per-key streaming scan, no quadratic term —
  * each row is touched exactly once regardless of history length.
  * Tie rules (pinned by AsofJoinSpec): a right row AT the left row's
  * exact ts matches (side 0 sorts before 1); several right rows on the
  * same (key, ts) resolve to the greatest `rightIdCol`.
  */
object AsofJoin {

  /** `rightCols` are carried through as `<suffix><name>`; `rightIdCol`
    * (must be in rightCols) is the deterministic same-ts tiebreak. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String], rightIdCol: String,
      suffix: String = "r_"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payload = struct(rightCols.map(col): _*)
    val taggedRight = right.select(
      col(keyCol), col(tsCol).as("_ts"), lit(0).as("_side"),
      col(rightIdCol).cast("long").as("_rid"), payload.as("_payload"))
    val taggedLeft = left
      .withColumn("_ts", col(tsCol))
      .withColumn("_side", lit(1))
      .withColumn("_rid", lit(null).cast("long"))
      .withColumn("_payload",
        lit(null).cast(taggedRight.schema("_payload").dataType))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_ts"), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val withRight = rightCols.foldLeft(matched) { (df, c) =>
      df.withColumn(suffix + c, col("_match." + c))
    }
    withRight.drop("_ts", "_side", "_rid", "_payload", "_match")
  }
}
