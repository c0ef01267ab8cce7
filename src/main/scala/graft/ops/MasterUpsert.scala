package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Master-table upsert: anti-join deletes, sequential id assignment, union.
  *
  * Reimplements the semantics of `catalog search/stage4_update_csv.py`
  * (SURVEY §2.3 J6/J7, §2.4 G11):
  *   - deletes apply by `id` when the delete row carries one, else by the
  *     composite key (document_source, document_type, document_name) —
  *     two anti-join passes (`stage4_update_csv.py:426-483`);
  *   - new entries get ids `max(existing id) + rank` where rank follows a
  *     stable, caller-chosen ordering (`:500-523`) — never
  *     monotonically_increasing_id, which would break run-to-run hashes;
  *   - final table is the union of survivors and fresh rows (`:527`).
  *
  * Scale posture: the delete lists are CDC-sized (small) — Catalyst
  * broadcasts them in the anti-joins. The max(id) singleton is joined in
  * via a broadcast nested loop (one row), keeping the whole plan lazy and
  * distributed; only the id-rank window is a single-partition operation,
  * matching the reference's global sequential-id contract. At true scale
  * that contract itself is the bottleneck and would be replaced by
  * deterministic key-derived ids; the operator keeps the reference
  * semantics.
  */
object MasterUpsert {

  val compositeKey: Seq[String] =
    Seq("document_source", "document_type", "document_name")

  /** J6: two-pass anti-join delete — by id where present, else composite. */
  def applyDeletes(master: DataFrame, deletes: DataFrame): DataFrame = {
    val byId = deletes.filter(col("id").isNotNull).select("id").distinct()
    val byComposite = deletes.filter(col("id").isNull)
      .select(compositeKey.map(col): _*).distinct()
    master
      .join(broadcast(byId), Seq("id"), "left_anti")
      .join(broadcast(byComposite), compositeKey, "left_anti")
  }

  /** G11: assign ids max(existing)+1.. to `fresh` ordered by `orderCols`. */
  def assignIds(existing: DataFrame, fresh: DataFrame,
      orderCols: Seq[String]): DataFrame = {
    val maxId = existing.agg(coalesce(max(col("id")), lit(0L)).as("max_id"))
    val w = Window.orderBy(orderCols.map(col): _*)
    fresh
      .crossJoin(broadcast(maxId))
      .withColumn("id", (col("max_id") + row_number().over(w)).cast("long"))
      .drop("max_id")
  }

  /** Full upsert: delete, mint ids, union (J6 + G11 + J7). */
  def upsert(master: DataFrame, deletes: DataFrame, fresh: DataFrame,
      orderCols: Seq[String]): DataFrame = {
    val remaining = applyDeletes(master, deletes)
    val inserted = assignIds(remaining, fresh, orderCols)
    remaining.unionByName(inserted.select(remaining.columns.toIndexedSeq.map(col): _*))
  }
}
