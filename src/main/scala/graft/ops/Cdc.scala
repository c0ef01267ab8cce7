package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture classification — the reference's CDC core.
  *
  * Reimplements the semantics of the full-outer-join file refresh in
  * `catalog search/stage1_extract_csv.py:615-686` (SURVEY §2.3 J1–J5):
  * a NAS listing is compared against the master catalog on `file_name`;
  * rows are classified `new` (listing only), `deleted` (catalog only),
  * `updated` (both sides, NAS mtime strictly newer after minute-flooring —
  * the reference floors to minutes to dodge filesystem timestamp precision,
  * `stage1_extract_csv.py:652-655`, preserved here as semantics), else
  * `unchanged`.
  *
  * Scale posture: one shuffle on `file_name` (sort-merge under AQE); both
  * inputs stream through — no driver-side state. At 100 TB the listing and
  * catalog would be bucketed on `file_name` to make this a zero-shuffle
  * join; the operator itself is agnostic.
  */
object Cdc {

  /** Column names the NAS listing side must provide. */
  val listingCols: Seq[String] =
    Seq("file_name", "file_path", "file_size", "date_created", "date_last_modified")

  /** Column names the catalog side must provide. */
  val catalogCols: Seq[String] =
    Seq("id", "file_name", "file_path", "document_source", "document_type",
      "document_name", "date_last_modified")

  /** J1 + J2–J5: full outer join with derived indicator and reason.
    *
    * Output: `file_name`, the listing columns, `cat_`-prefixed catalog
    * columns, and `reason` ∈ {new, updated, deleted, unchanged}.
    */
  def classify(listing: DataFrame, catalog: DataFrame): DataFrame = {
    val cat = catalog.columns.foldLeft(catalog) { (df, c) =>
      if (c == "file_name") df else df.withColumnRenamed(c, s"cat_$c")
    }
    listing
      .join(cat, Seq("file_name"), "full_outer")
      .withColumn("reason",
        when(col("cat_id").isNull, lit("new"))
          .when(col("date_last_modified").isNull, lit("deleted"))
          .when(date_trunc("minute", col("date_last_modified")) >
            date_trunc("minute", col("cat_date_last_modified")), lit("updated"))
          .otherwise(lit("unchanged")))
  }

  /** Files to (re)process: reason new|updated, NAS-side columns (J2+J3). */
  def toProcess(classified: DataFrame): DataFrame =
    classified
      .filter(col("reason").isin("new", "updated"))
      .select((listingCols :+ "reason").map(col): _*)

  /** Rows to delete from the masters: reason deleted|updated, catalog-side
    * columns (J3's second projection + J4). */
  def toDelete(classified: DataFrame): DataFrame =
    classified
      .filter(col("reason").isin("deleted", "updated"))
      .select(col("cat_id").as("id") +:
        col("file_name") +:
        Seq("file_path", "document_source", "document_type", "document_name")
          .map(c => col(s"cat_$c").as(c)) :+
        col("reason"): _*)
}
