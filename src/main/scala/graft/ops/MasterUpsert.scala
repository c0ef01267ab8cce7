package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  * broadcasts them in the anti-joins. The sequential-id contract is an
  * ORDERING, not a physical plan: ids are minted by a range-partitioned
  * sort on the order columns followed by `zipWithIndex` — Spark computes
  * per-partition counts in a lightweight first pass, prefix-sums the K
  * offsets on the driver, and stamps `max_id + offset + local_index` in
  * the data pass. Identical output to the former single-partition
  * `Window.orderBy` rank, but every stage stays parallel (no
  * "WindowExec: No Partition Defined" collapse).
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

  /** G11: assign ids max(existing)+1.. to `fresh` ordered by `orderCols`.
    *
    * Two metadata-scale driver actions (the max(id) scalar and
    * zipWithIndex's per-partition count array); the data itself is never
    * collected and the sort runs range-partitioned across the cluster.
    * `orderCols` must be a total order for run-to-run determinism (ties
    * would make the rank among tied rows partition-dependent — true of
    * any rank formulation).
    */
  def assignIds(existing: DataFrame, fresh: DataFrame,
      orderCols: Seq[String]): DataFrame = {
    val spark = fresh.sparkSession
    val maxId = existing
      .agg(coalesce(max(col("id")), lit(0L)).cast("long")).first().getLong(0)
    val sorted = fresh.drop("id")
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add("id", LongType, nullable = false)
    val withIds = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (maxId + i + 1L))
    }
    spark.createDataFrame(withIds, schema)
  }

  /** Full upsert: delete, mint ids, union (J6 + G11 + J7). */
  def upsert(master: DataFrame, deletes: DataFrame, fresh: DataFrame,
      orderCols: Seq[String]): DataFrame = {
    val remaining = applyDeletes(master, deletes)
    val inserted = assignIds(remaining, fresh, orderCols)
    remaining.unionByName(inserted.select(remaining.columns.toIndexedSeq.map(col): _*))
  }
}
