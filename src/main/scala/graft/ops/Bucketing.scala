package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table storage: the write-once / join-many answer to the
  * shuffle. A table written with `bucketBy(n, key)` + in-bucket `sortBy`
  * is hash-partitioned AND sorted on disk; every later equi-join or
  * aggregation on that key reads the buckets co-located and skips both
  * the exchange and the sort — at 100 TB that shuffle IS the job, and
  * bucketing pays it exactly once at ingest instead of per query
  * (BucketedJoinSpec pins the zero-exchange plan).
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed parquet table
    * (replacing any previous incarnation — including a stale on-disk
    * location from an earlier session that the in-memory catalog no
    * longer knows about) and return the catalog-backed frame, whose
    * scan reports the bucket spec to the planner. */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      bucketCol: String, numBuckets: Int): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new Path(spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
    spark.table(table)
  }

  /** The read side of write-once/join-many: return the catalog-backed
    * bucketed table if this session already ingested it, else ingest now.
    * Callers encode the SOURCE identity (input dir, projection) in the
    * table name — a bucketed table is a materialization of one concrete
    * input, and reusing it for a different input would silently answer
    * from the wrong data. With this, only the first invocation per
    * session pays the bucketing shuffle+write; every later call is the
    * zero-exchange read the feature exists for.
    *
    * Reuse is keyed on the table NAME only — source identity, not source
    * content. If the files under the encoded input dir change mid-session,
    * later joins answer from the stale materialization; callers that
    * mutate inputs in place must `DROP TABLE` (or call `writeBucketed`)
    * to re-ingest. This is the standard warehouse contract (a bucketed
    * table is a snapshot, refreshed explicitly), accepted here over a
    * content signature: hashing file count+mtimes per call would charge
    * every zero-exchange read a filesystem walk of the source dir. */
  def ensureBucketed(spark: SparkSession, df: => DataFrame, table: String,
      bucketCol: String, numBuckets: Int): DataFrame =
    if (spark.catalog.tableExists(table)) spark.table(table)
    else writeBucketed(spark, df, table, bucketCol, numBuckets)
}
