package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history: collapse a change log into
  * per-key validity intervals `[valid_from, valid_to)` with a current
  * flag — the warehouse operator behind "what was this entity's state
  * at time t?" queries over mutable reference data.
  *
  * The whole computation is two window passes over the SAME
  * (key, ts, tie) partitioning — one shuffle; the run-collapse filter
  * between them preserves the partitioning and order, so Catalyst plans
  * a single exchange. Per-key windows, never global: scales with keys.
  *
  * `merge` is deliberately a RECONSTRUCTION, not an in-place
  * close-and-insert: merging a batch is "union the batch with the
  * dimension's opening rows and re-run history". That formulation is
  * idempotent (re-merging the same batch is a no-op) and EXACT — equal
  * to rebuilding from the full raw log — whenever each key's updates
  * arrive at-or-after that key's latest logged event (the normal
  * append flow), including re-sends of already-seen change points.
  *
  * For genuinely LATE (retroactive) events the result is the history
  * of (recorded change points ∪ updates): always interval-consistent,
  * and it splits the interval the late event lands in — but the
  * dimension is a LOSSY summary (events that did not change state were
  * collapsed into their run and are unrecoverable), so if a collapsed
  * event later RE-ASSERTED the old value inside that run, no
  * dimension-only merge can resurrect it (Scd2Spec pins this exact
  * semantic). When the raw change log is retained, full retroactive
  * repair is simply `history(log ∪ updates)` — reconstruction makes
  * that the same code path. The price of merge is rewriting the key's
  * history rows; at 100 TB the dimension is metadata-scale next to the
  * fact tables, and only touched keys change (the union is keyed, the
  * windows are per-key).
  */
object Scd2 {

  /** Build SCD2 intervals from a change log with columns
    * (`keyCol`, `attrCol`, `usCol` epoch-µs long, `tieCol` unique
    * within ties of `usCol`). Consecutive equal attr values collapse
    * into one interval; re-appearing values open a new one. Output:
    * key, version (1-based per key), attr, valid_from_us,
    * valid_to_us (null while current), is_current, open_tie (the tie
    * of the opening row — carried so `merge` can reproduce the exact
    * ordering when it reconstructs). */
  def history(log: DataFrame, keyCol: String, attrCol: String,
      usCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(usCol), col(tieCol))
    // lag over a struct so "no previous row" is distinguishable from a
    // null attr value on the previous row
    val flagged = log
      .withColumn("__prev", lag(struct(col(attrCol).as("a")), 1).over(w))
      .filter(col("__prev").isNull ||
        not(col("__prev").getField("a") <=> col(attrCol)))
    flagged
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_us", lead(col(usCol), 1).over(w))
      .withColumn("is_current", when(col("valid_to_us").isNull, 1).otherwise(0))
      .select(col(keyCol), col("version"), col(attrCol),
        col(usCol).as("valid_from_us"), col("valid_to_us"),
        col("is_current"), col(tieCol).cast("long").as("open_tie"))
  }

  /** Merge a batch of (`keyCol`, `attrCol`, `usCol`, `tieCol`) updates
    * into an existing `history()` dimension by reconstruction (see
    * object doc). `dim` must carry the history() schema for
    * `keyCol`/`attrCol` (valid_from_us/open_tie are fixed names). */
  def merge(dim: DataFrame, updates: DataFrame, keyCol: String,
      attrCol: String, usCol: String, tieCol: String): DataFrame = {
    val dimLog = dim.select(col(keyCol), col(attrCol),
      col("valid_from_us").as(usCol), col("open_tie").cast("long").as(tieCol))
    val updLog = updates.select(col(keyCol), col(attrCol),
      col(usCol), col(tieCol).cast("long").as(tieCol))
    history(dimLog.unionByName(updLog), keyCol, attrCol, usCol, tieCol)
  }
}
