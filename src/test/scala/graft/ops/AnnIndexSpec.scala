package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Persisted IVF-PQ index: the parquet round trip must reproduce the
  * in-memory composition exactly, the codes layout must actually be
  * cell-partitioned (that layout IS the scale feature), and the probe
  * join must reach the scan as a partition-column join so Spark's
  * dynamic partition pruning can skip the unprobed cells' directories.
  */
class AnnIndexSpec extends SparkSpecBase {

  private lazy val emb = graft.Tables.embeddings(spark, sfDir)
  private lazy val queries = emb.filter(col("vec_id") % 100 === 0)
  private lazy val ixDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_annix_spec")
      .toFile.getAbsolutePath
    AnnIndex.save(emb, d)
    d
  }

  test("persisted round trip equals the in-memory IVF-PQ exactly") {
    val mem = Similarity.ivfPqTopK(emb, queries, 5)
      .orderBy("query_id", "rk").collect().toSeq
    val ix = AnnIndex.topK(spark, ixDir, emb, queries, 5)
      .orderBy("query_id", "rk").collect().toSeq
    assert(ix == mem)
    assert(ix.nonEmpty)
  }

  test("codes are laid out as one directory per inverted cell") {
    val cells = new java.io.File(s"$ixDir/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cells.length > 1 && cells.length <= 16,
      s"expected cell=N partition dirs, got ${cells.mkString(",")}")
  }

  test("probe join reaches the scan as a partition-column equi-join") {
    val plan = AnnIndex.topK(spark, ixDir, emb, queries, 5)
      .queryExecution.executedPlan.toString
    // the candidate scan must read the partitioned layout (its cell
    // column arrives from directory metadata, so the scan carries a
    // partition schema) and join on the partition column — the shape
    // dynamic partition pruning prunes at deployment scale
    assert(plan.contains("PartitionFilters") || plan.toLowerCase.contains(
      "dynamicpruning"), s"no partition-aware scan in:\n$plan")
  }
}
