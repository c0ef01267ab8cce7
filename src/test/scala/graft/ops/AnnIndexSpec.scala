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
    val vdir = AnnIndex.resolveDir(spark, ixDir)
    val cells = new java.io.File(s"$vdir/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cells.length > 1 && cells.length <= 16,
      s"expected cell=N partition dirs, got ${cells.mkString(",")}")
  }

  test("rebuild publishes atomically: versioned commit, reader isolation") {
    val d = java.nio.file.Files.createTempDirectory("graft_annix_ver")
      .toFile.getAbsolutePath
    AnnIndex.save(emb, d)
    val v1 = AnnIndex.resolveDir(spark, d)
    assert(v1 == s"$d/v_1")
    // an in-flight reader pinned v_1; a rebuild commits v_2 — the old
    // build must survive (retained for exactly one rebuild) and new
    // resolves must see v_2
    AnnIndex.save(emb, d)
    assert(AnnIndex.resolveDir(spark, d) == s"$d/v_2")
    assert(new java.io.File(s"$v1/_COMMITTED").exists(),
      "previous committed build must be retained for in-flight readers")
    // a third rebuild GCs v_1 (no reader can still hold it across TWO
    // rebuild windows) but keeps v_2
    AnnIndex.save(emb, d)
    assert(AnnIndex.resolveDir(spark, d) == s"$d/v_3")
    assert(!new java.io.File(s"$d/v_1").exists(), "v_1 must be GC'd")
    assert(new java.io.File(s"$d/v_2/_COMMITTED").exists())
    // an ABORTED build (dir present, no _COMMITTED marker) is invisible
    // to readers and swept by the next successful save
    val aborted = new java.io.File(s"$d/v_9/meta")
    aborted.mkdirs()
    assert(AnnIndex.resolveDir(spark, d) == s"$d/v_3",
      "uncommitted build dir must never resolve")
    AnnIndex.save(emb, d)
    assert(AnnIndex.resolveDir(spark, d) == s"$d/v_4")
    assert(!new java.io.File(s"$d/v_9").exists(),
      "aborted build dir must be swept by the next save")
    // probes against the rebuilt index still match the in-memory path
    val mem = Similarity.ivfPqTopK(emb, queries, 5)
      .orderBy("query_id", "rk").collect().toSeq
    val ix = AnnIndex.topK(spark, d, emb, queries, 5)
      .orderBy("query_id", "rk").collect().toSeq
    assert(ix == mem)
  }

  test("dynamic partition pruning fires on the codes scan specifically") {
    val plan = AnnIndex.topK(spark, ixDir, emb, queries, 5)
      .queryExecution.executedPlan.treeString(verbose = true)
    // every parquet scan prints a PartitionFilters field (possibly
    // empty), so the assertion must target THE CODES SCAN's filters:
    // the line locating the index's codes directory has to carry a
    // dynamicpruningexpression — that is the probe join's broadcast
    // keys reaching the partitioned layout, the index's scale feature
    val vdir = AnnIndex.resolveDir(spark, ixDir)
    val codesScan = plan.split('\n')
      .filter(l => l.contains("FileScan") && l.contains(s"$vdir/codes"))
    assert(codesScan.nonEmpty, s"no codes scan found in:\n$plan")
    assert(codesScan.exists(_.toLowerCase.contains("dynamicpruning")),
      s"codes scan is not dynamically pruned:\n${codesScan.mkString("\n")}")
  }
}
