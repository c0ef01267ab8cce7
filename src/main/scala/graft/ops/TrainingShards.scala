package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * rescanning text: recompute the same aggregates and diff. The
  * checksum is the PORTABLE md5-derived 60-bit hash (not a
  * Spark-internal hash), so any engine with md5 — including the DuckDB
  * oracle (q_shard_manifest) and whatever reads the tree at training
  * time — can recompute it.
  *
  * Scale: partitionBy(split, shard) writes each shard's files from the
  * tasks that hold its rows — one shuffle if `repartitionByShard` is
  * set (fewer, bigger files per shard: the layout a trainer wants),
  * zero extra shuffles otherwise (more, smaller files). */
object TrainingShards {

  /** Portable order-independent row hash: the first 15 hex chars of
    * md5(id || '|' || text) as a BIGINT (< 2⁶⁰, no sign issues).
    * bit_xor over unique ids cannot cancel, so the aggregate is a real
    * content checksum. */
  def contentHash(id: Column, text: Column): Column =
    conv(substring(md5(concat_ws("|", id.cast("string"), text)
      .cast("binary")), 1, 15), 16, 10).cast("long")

  /** Hash-stable split + shard assignment: 98/1/1 on the first 8 md5
    * hex chars of the id, shard from the NEXT 8 (independent bits,
    * still id-stable). */
  def assignShards(docs: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val sel = CorpusFilters.md5Selector(col(idCol))
    val trainThr = CorpusFilters.rateThresholdHex(98, 100)
    val valThr = CorpusFilters.rateThresholdHex(99, 100)
    val shard = pmod(
      conv(substring(md5(col(idCol).cast("string").cast("binary")), 9, 8),
        16, 10).cast("long"), lit(nShards))
    docs
      .withColumn("split",
        when(sel <= lit(trainThr), "train")
          .when(sel <= lit(valThr), "val")
          .otherwise("test"))
      .withColumn("shard", shard)
  }

  /** The audit manifest as a pure frame (split, shard, n_docs,
    * n_tokens, checksum) — one map-side-combinable groupBy,
    * |splits|×|shards| rows out. */
  def manifest(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int = 8): DataFrame =
    manifestOf(assignShards(docs, idCol, nShards), idCol, textCol)

  /** Write the shard tree; returns the manifest frame (split, shard,
    * n_docs, n_tokens, checksum). */
  def write(docs: DataFrame, idCol: String, textCol: String,
      outDir: String, nShards: Int = 8,
      repartitionByShard: Boolean = true): DataFrame = {
    val assigned = assignShards(docs, idCol, nShards)
    val laid =
      if (repartitionByShard) assigned.repartition(col("split"), col("shard"))
      else assigned
    laid.write.mode("overwrite")
      .partitionBy("split", "shard").parquet(outDir)

    val mf = manifestOf(assigned, idCol, textCol)
    val rows = mf.collect()
    val json = rows.map { r =>
      s"""{"split":"${r.getString(0)}","shard":${r.getLong(1)},""" +
        s""""n_docs":${r.getLong(2)},"n_tokens":${r.getLong(3)},""" +
        s""""checksum":${r.getLong(4)}}"""
    }.mkString("[\n", ",\n", "\n]\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "_manifest.json"), json)
    mf
  }

  private def manifestOf(assigned: DataFrame, idCol: String,
      textCol: String): DataFrame =
    assigned
      .withColumn("_ch", contentHash(col(idCol), col(textCol)))
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), "\\s+"))).as("n_tokens"),
        expr("bit_xor(_ch)").as("checksum"))
      .orderBy(col("split"), col("shard"))

  /** Recompute the manifest aggregates from a shard tree on disk —
    * the audit a consumer runs before training. */
  def audit(spark: SparkSession, outDir: String, idCol: String,
      textCol: String): DataFrame =
    manifestOf(spark.read.parquet(outDir), idCol, textCol)
}
