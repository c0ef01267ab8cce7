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
    * The global rank comes from a range-partitioned sort + zipWithIndex:
    * its per-partition count pass is the only extra driver action, it is
    * metadata-scale (K integers), and the sort's shuffle output is reused
    * by the data pass (the count job's map stage shows as skipped). The
    * max(existing id) stays a lazy broadcast scalar joined into the final
    * plan, so the existing/master side is scanned only when the caller
    * acts. `orderCols` must be a total order for run-to-run determinism
    * (ties would make the rank among tied rows partition-dependent — true
    * of any rank formulation).
    *
    * NOTE: zipWithIndex runs its count job when this method is CALLED, so
    * constructing the frame already evaluates `fresh` once (plan dumps and
    * tests pay that too). This is deliberate: the fully-lazy alternative
    * (row_number per spark_partition_id + a counts-offset join) references
    * the range exchange from two plan branches and is only correct if
    * exchange reuse fires — a silent-wrong-ids hazard if boundaries
    * diverge — whereas the single-lineage zipWithIndex cannot disagree
    * with itself.
    */
  def assignIds(existing: DataFrame, fresh: DataFrame,
      orderCols: Seq[String]): DataFrame = {
    val spark = fresh.sparkSession
    val sorted = fresh.drop("id")
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add("_rank", LongType, nullable = false)
    val ranked = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L))
      }, schema)
    val maxId = existing.agg(
      coalesce(max(col("id")), lit(0L)).cast("long").as("_max_id"))
    ranked.crossJoin(broadcast(maxId))
      .withColumn("id", col("_max_id") + col("_rank"))
      .drop("_max_id", "_rank")
  }

  /** Full upsert: delete, mint ids, union (J6 + G11 + J7). */
  def upsert(master: DataFrame, deletes: DataFrame, fresh: DataFrame,
      orderCols: Seq[String]): DataFrame = {
    val remaining = applyDeletes(master, deletes)
    val inserted = assignIds(remaining, fresh, orderCols)
    remaining.unionByName(inserted.select(remaining.columns.toIndexedSeq.map(col): _*))
  }
}
