package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Terminal sink of the corpus pipeline: the curated document set laid
  * out as a training-ready shard tree —
  *
  *   <out>/split=train/shard=0/…parquet … split=test/shard=K-1/…
  *
  * plus a driver-written `_manifest.json`. Split assignment is the
  * hash-stable 98/1/1 rule (same thresholds as q_corpus_split); the
  * shard is an md5-derived bucket, so the layout is reproducible
  * run-to-run and documents never migrate when the corpus grows.
  *
  * The manifest (per split×shard: doc count, token sum, an
  * order-independent content checksum) is computed DISTRIBUTED in one
  * groupBy over the write's own frame; only |splits|×|shards| rows ever
  * reach the driver. A reader can therefore audit a shard tree without
  * rescanning text: recompute the same aggregates and diff.
  *
  * Scale: partitionBy(split, shard) writes each shard's files from the
  * tasks that hold its rows — one shuffle if `repartitionByShard` is
  * set (fewer, bigger files per shard: the layout a trainer wants),
  * zero extra shuffles otherwise (more, smaller files). */
object TrainingShards {

  /** Write the shard tree; returns the manifest frame (split, shard,
    * n_docs, n_tokens, checksum). */
  def write(docs: DataFrame, idCol: String, textCol: String,
      outDir: String, nShards: Int = 8,
      repartitionByShard: Boolean = true): DataFrame = {
    val sel = CorpusFilters.md5Selector(col(idCol))
    val trainThr = CorpusFilters.rateThresholdHex(98, 100)
    val valThr = CorpusFilters.rateThresholdHex(99, 100)
    // shard from the NEXT 8 hex chars of the same md5 — independent of
    // the split selector bits, still id-stable
    val shard = pmod(
      conv(substring(md5(col(idCol).cast("string").cast("binary")), 9, 8),
        16, 10).cast("long"), lit(nShards))
    val assigned = docs
      .withColumn("split",
        when(sel <= lit(trainThr), "train")
          .when(sel <= lit(valThr), "val")
          .otherwise("test"))
      .withColumn("shard", shard)
    val laid =
      if (repartitionByShard) assigned.repartition(col("split"), col("shard"))
      else assigned
    laid.write.mode("overwrite")
      .partitionBy("split", "shard").parquet(outDir)

    val manifest = assigned.groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split_part_tokens(col(textCol)))).as("n_tokens"),
        // order-independent, overflow-free checksum (ids are unique, so
        // xor cancellation of duplicate rows cannot occur)
        expr(s"bit_xor(xxhash64($idCol, $textCol))").as("checksum"))
      .orderBy(col("split"), col("shard"))
    val rows = manifest.collect()
    val json = rows.map { r =>
      s"""{"split":"${r.getString(0)}","shard":${r.getLong(1)},""" +
        s""""n_docs":${r.getLong(2)},"n_tokens":${r.getLong(3)},""" +
        s""""checksum":${r.getLong(4)}}"""
    }.mkString("[\n", ",\n", "\n]\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "_manifest.json"), json)
    manifest
  }

  private def split_part_tokens(text: org.apache.spark.sql.Column) =
    split(text, "\\s+")

  /** Recompute the manifest aggregates from a shard tree on disk —
    * the audit a consumer runs before training. */
  def audit(spark: SparkSession, outDir: String, idCol: String,
      textCol: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), "\\s+"))).as("n_tokens"),
        expr(s"bit_xor(xxhash64($idCol, $textCol))").as("checksum"))
      .orderBy(col("split"), col("shard"))
}
