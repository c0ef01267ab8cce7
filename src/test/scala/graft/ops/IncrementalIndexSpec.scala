package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Incremental ANN index maintenance (r12 VERDICT #6): cell-level upsert
  * with PINNED quantizers, `_BASE`-chained untouched cells, newest-wins
  * replacement, chain-protected GC, and the drift trigger that
  * recommends the full retrain. The registered q_knn_index_incremental
  * adds the cross-engine leg (DuckDB trains on the base subset, encodes
  * all).
  */
class IncrementalIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val Dims = 8
  private def vec(id: Long, shift: Double = 0.0): Array[Float] = {
    val rnd = new scala.util.Random(id * 7919 + 13)
    Array.fill(Dims)((rnd.nextDouble() + shift).toFloat)
  }
  private def emb(ids: Seq[Long], shift: Double = 0.0) =
    ids.map(i => (i, vec(i, shift).toSeq)).toDF("vec_id", "embedding")

  private def freshDir() =
    Files.createTempDirectory("graft-inc-ix").toString + "/ix"

  private def save(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
    AnnIndex.save(df, dir, numCells = 4, numSubspaces = 4,
      codebookSize = 4, dims = Dims)

  test("upserted probe equals an in-memory rebuild under the pinned quantizers") {
    val dir = freshDir()
    val base = emb(1L to 40L)
    val delta = emb(41L to 50L)
    val all = emb(1L to 50L)
    save(base, dir)
    AnnIndex.upsert(delta, dir)
    val queries = emb(Seq(5L, 23L, 47L))
    val probed = AnnIndex.topK(spark, dir, all, queries, k = 3, nProbe = 2)
      .collect().map(_.toString).toSet
    // rebuild IN MEMORY with the SAME pinned quantizers over all vectors
    val vdir = AnnIndex.resolveDir(spark, dir)
    val (cents, cbs, subDims) = AnnIndex.loadQuantizers(spark, vdir)
    val rebuilt = Similarity.ivfPqScore(
      Similarity.encodeIvfPq(all, cents, cbs, subDims), all, queries,
      cents, cbs, k = 3, nProbe = 2, refine = 5, subDims = subDims)
      .collect().map(_.toString).toSet
    assert(probed === rebuilt)
    assert(probed.nonEmpty)
  }

  test("newest wins: an upserted existing id carries the delta codes exactly once") {
    val dir = freshDir()
    save(emb(1L to 30L), dir)
    // replace id 7 with a DIFFERENT vector (new random stream)
    val replacement = Seq((7L, vec(7070L).toSeq)).toDF("vec_id", "embedding")
    AnnIndex.upsert(replacement, dir)
    val vdir = AnnIndex.resolveDir(spark, dir)
    val (cents, cbs, subDims) = AnnIndex.loadQuantizers(spark, vdir)
    val rows = AnnIndex.loadCodes(spark, vdir)
      .filter(col("vec_id") === 7L).collect()
    assert(rows.length === 1, "replaced id must appear exactly once")
    val want = Similarity.encodeIvfPq(replacement, cents, cbs, subDims)
      .collect().head
    assert(rows.head.getSeq[Int](rows.head.fieldIndex("codes")).toList ===
      want.getSeq[Int](want.fieldIndex("codes")).toList)
    assert(rows.head.getAs[Int]("cell") === want.getAs[Int]("cell"))
    // total cardinality unchanged: 30 vectors, no duplicate survivors
    assert(AnnIndex.loadCodes(spark, vdir).count() === 30L)
  }

  test("a replacement that MIGRATES cells rewrites the old cell too — no stale survivor") {
    val dir = freshDir()
    val base = emb(1L to 30L)
    save(base, dir)
    val vdir0 = AnnIndex.resolveDir(spark, dir)
    val (cents, cbs, subDims) = AnnIndex.loadQuantizers(spark, vdir0)
    val cells = Similarity.encodeIvfPq(base, cents, cbs, subDims)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // replace id 7 with a donor vector that the PINNED quantizers assign
    // to a DIFFERENT cell — the r13 ADVICE failure shape: the delta
    // touches only the new cell, and the stale row in 7's old cell must
    // still be anti-joined away (cell 7 is in `touched` via the
    // replaced-id locate, not via the delta's own cells)
    val donor = (1L to 30L).find(j => cells(j) != cells(7L))
      .getOrElse(fail("fixture degenerate: all 30 vectors share one cell"))
    val replacement = Seq((7L, vec(donor).toSeq)).toDF("vec_id", "embedding")
    AnnIndex.upsert(replacement, dir)
    val vdir = AnnIndex.resolveDir(spark, dir)
    val rows = AnnIndex.loadCodes(spark, vdir)
      .filter(col("vec_id") === 7L).collect()
    assert(rows.length === 1,
      s"migrated replacement must leave no stale row (got ${rows.length})")
    assert(rows.head.getAs[Int]("cell") === cells(donor))
    assert(AnnIndex.loadCodes(spark, vdir).count() === 30L)
    // and the layered probe still equals the in-memory rebuild over the
    // post-replacement corpus under the same pinned quantizers
    val all = emb(1L to 30L).filter(col("vec_id") =!= 7L)
      .unionByName(replacement)
    val queries = emb(Seq(3L, 7L, 19L))
    val probed = AnnIndex.topK(spark, dir, all, queries, k = 3, nProbe = 2)
      .collect().map(_.toString).toSet
    val rebuilt = Similarity.ivfPqScore(
      Similarity.encodeIvfPq(all, cents, cbs, subDims), all, queries,
      cents, cbs, k = 3, nProbe = 2, refine = 5, subDims = subDims)
      .collect().map(_.toString).toSet
    assert(probed === rebuilt)
  }

  test("the ids manifest mirrors the codes layout across a replacing chain") {
    val dir = freshDir()
    save(emb(1L to 30L), dir)
    AnnIndex.upsert(emb(31L to 35L), dir)                       // append layer
    AnnIndex.upsert(Seq((7L, vec(7070L).toSeq))
      .toDF("vec_id", "embedding"), dir)                        // replace layer
    val vdir = AnnIndex.resolveDir(spark, dir)
    val fromIds = AnnIndex.loadIds(spark, vdir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val fromCodes = AnnIndex.loadCodes(spark, vdir)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(fromIds === fromCodes,
      "the compact ids manifest must chain-resolve to the exact codes layout")
    assert(fromIds.size === 35)
  }

  test("a legacy chain without ids manifests still locates replaced cells (codes fallback)") {
    val dir = freshDir()
    save(emb(1L to 30L), dir)
    // simulate a pre-r14 build: drop its ids manifest
    val vdir0 = AnnIndex.resolveDir(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$vdir0/ids")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val replacement = Seq((7L, vec(7070L).toSeq)).toDF("vec_id", "embedding")
    AnnIndex.upsert(replacement, dir)
    val vdir = AnnIndex.resolveDir(spark, dir)
    assert(AnnIndex.loadCodes(spark, vdir)
      .filter(col("vec_id") === 7L).count() === 1L)
    assert(AnnIndex.loadCodes(spark, vdir).count() === 30L)
  }

  test("upsert tolerates a legacy build without stats/; driftReport asks for a rebuild") {
    val dir = freshDir()
    save(emb(1L to 20L), dir)
    // simulate a pre-r13 build: its stats dir never existed
    val vdir0 = AnnIndex.resolveDir(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$vdir0/stats")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    AnnIndex.upsert(emb(21L to 25L), dir) // must not throw on the copy
    assert(AnnIndex.loadCodes(spark,
      AnnIndex.resolveDir(spark, dir)).count() === 25L)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.driftReport(emb(26L to 30L), dir)
    }
    assert(e.getMessage.contains("full"), s"unexpected message: ${e.getMessage}")
  }

  test("GC protects _BASE-chained ancestors; a new full build sweeps the chain") {
    val dir = freshDir()
    save(emb(1L to 30L), dir)                 // v_1
    AnnIndex.upsert(emb(31L to 35L), dir)     // v_2 (base v_1)
    AnnIndex.upsert(emb(36L to 40L), dir)     // v_3 (base v_2)
    val vs3 = IndexVersioning.committedVersions(spark, dir)
    assert(vs3 === Seq(1L, 2L, 3L),
      "chained ancestors must survive the below-floor sweep")
    assert(AnnIndex.loadCodes(spark, s"$dir/v_3").count() === 40L)
    save(emb(1L to 40L), dir)                 // v_4: full rebuild
    AnnIndex.upsert(emb(41L to 42L), dir)     // v_5 (base v_4)
    val vsAfter = IndexVersioning.committedVersions(spark, dir)
    // floor at v_5's publish is v_4; protection = {5, 4}: the old chain
    // (1, 2) below the floor goes, 3 stays one retention window
    assert(!vsAfter.contains(1L) && !vsAfter.contains(2L),
      s"the superseded chain must be swept (got $vsAfter)")
    assert(vsAfter.takeRight(2) === Seq(4L, 5L))
    assert(AnnIndex.loadCodes(spark, s"$dir/v_5").count() === 42L)
  }

  test("drift trigger: in-distribution delta passes, shifted delta recommends retrain") {
    val dir = freshDir()
    save(emb(1L to 60L), dir)
    val same = AnnIndex.driftReport(emb(200L to 240L), dir).head()
    assert(!same.getAs[Boolean]("retrain_recommended"),
      s"no-drift batch flagged: $same")
    val shifted = AnnIndex.driftReport(emb(200L to 240L, shift = 10.0), dir)
      .head()
    assert(shifted.getAs[Boolean]("retrain_recommended"),
      s"shifted batch not flagged: $shifted")
    assert(shifted.getAs[Double]("frac_beyond") >
      same.getAs[Double]("frac_beyond"))
  }

  test("upsert refuses an empty delta and a build-less directory") {
    val dir = freshDir()
    intercept[IllegalArgumentException] {
      AnnIndex.upsert(emb(1L to 5L), dir) // nothing committed yet
    }
    save(emb(1L to 20L), dir)
    intercept[IllegalArgumentException] {
      AnnIndex.upsert(emb(Seq.empty[Long]), dir)
    }
  }
}
