package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-hash snapshot diff — the refresh-audit primitive: given two
  * snapshots of a keyed table, classify every key as added / removed /
  * changed by comparing an md5 over the payload columns. This is the
  * generalization of the reference's CDC stage (which diffs on a
  * modified-timestamp column — `ops/Cdc.scala`): when the upstream
  * system carries no trustworthy timestamp, content is the only truth,
  * and a deterministic row hash makes the diff exact, column-order
  * stable, and cheap to ship.
  *
  * Scale shape (100 TB): the hash is computed UNDER each side's scan, so
  * the full-outer join shuffles (key, 32-char hash) — shuffle volume is
  * independent of row width; a 200-column master table diffs at the
  * same network cost as a 3-column one. One shuffle per side, one
  * sort-merge full-outer, no window, no collect. Unchanged keys (the
  * overwhelming majority of a daily refresh) are dropped BEFORE the
  * final order/sink, so the output is O(churn), not O(table).
  *
  * Portability contract (the query layer DuckDB-mirrors the hash):
  * callers pre-project payload columns to engine-stable string
  * renderings (BIGINT, formatted dates, text — never raw DOUBLE);
  * columns are joined with U+0001 (`chr(1)` in the mirror) and NULL is
  * rendered as U+0000 (`chr(0)`), so no ordinary payload value can
  * collide with the separator or the null sentinel.
  */
object SnapshotDiff {

  private val Sep = "\u0001"
  private val NullSentinel = "\u0000"

  /** Classified diff between two snapshots sharing `keyCol` and an
    * identical payload column set. Emits one row per non-identical key:
    * (key, change_type ∈ added|removed|changed, old_hash, new_hash).
    *
    * NULL-key semantics (r12 ADVICE): the join is NULL-SAFE (`<=>`; the
    * mirror uses IS NOT DISTINCT FROM), so a NULL key present in both
    * snapshots compares content like any other key instead of
    * double-reporting as removed+added. A properly keyed snapshot has at
    * most one NULL-key row per side; many NULL keys on both sides would
    * cross-pair like any duplicated key value.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String): DataFrame = {
    val payload = newSnap.columns.filterNot(_ == keyCol).toSeq
    val oldPayload = oldSnap.columns.filterNot(_ == keyCol).toSeq
    require(oldPayload == payload,
      s"snapshot schemas differ: old=$oldPayload new=$payload — a diff over " +
        "mismatched payloads would classify every key as changed")
    require(payload.nonEmpty, s"no payload columns besides key '$keyCol'")
    def hashed(df: DataFrame, keyAs: String, as: String) =
      df.select(col(keyCol).as(keyAs), md5(concat_ws(Sep,
        payload.map(c => coalesce(col(c).cast("string"), lit(NullSentinel))): _*))
        .as(as))
    hashed(oldSnap, "__k_old", "old_hash")
      .join(hashed(newSnap, "__k_new", "new_hash"),
        col("__k_old") <=> col("__k_new"), "full_outer")
      .withColumn(keyCol, coalesce(col("__k_old"), col("__k_new")))
      .withColumn("change_type",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select(col(keyCol), col("change_type"), col("old_hash"), col("new_hash"))
  }

  /** Per-class counts of a diff — the one-line refresh audit (added /
    * removed / changed; unchanged keys never reach the aggregate). */
  def diffCounts(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String): DataFrame =
    diff(oldSnap, newSnap, keyCol)
      .groupBy(col("change_type")).agg(count(lit(1)).as("n"))
}
