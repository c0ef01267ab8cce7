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

  test("dynamic partition pruning fires on the codes scan specifically") {
    val plan = AnnIndex.topK(spark, ixDir, emb, queries, 5)
      .queryExecution.executedPlan.treeString(verbose = true)
    // every parquet scan prints a PartitionFilters field (possibly
    // empty), so the assertion must target THE CODES SCAN's filters:
    // the line locating the index's codes directory has to carry a
    // dynamicpruningexpression — that is the probe join's broadcast
    // keys reaching the partitioned layout, the index's scale feature
    val codesScan = plan.split('\n')
      .filter(l => l.contains("FileScan") && l.contains(s"$ixDir/codes"))
    assert(codesScan.nonEmpty, s"no codes scan found in:\n$plan")
    assert(codesScan.exists(_.toLowerCase.contains("dynamicpruning")),
      s"codes scan is not dynamically pruned:\n${codesScan.mkString("\n")}")
  }
}
