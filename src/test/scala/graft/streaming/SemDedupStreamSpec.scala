package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.ops.{AnnIndex, Similarity}

/** Incremental SemDeDup against the persisted index: planted semantics
  * (an exact copy of a corpus vector is rejected via the base leg; a
  * pair of identical novel vectors resolves by the smaller-id survivor
  * rule; a genuinely novel vector is kept), and the streaming admission
  * face — the drained candidate stream must equal the batch
  * semDedupAdmitCandidates over the same index, because the generator
  * is stateless (micro-batch boundaries cannot change the hit set,
  * only which batch emits it). */
class SemDedupStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val Dims = 8
  // gaussian, not uniform: [0,1]^8 vectors all share the positive
  // octant (typical pairwise cosine ≈ 0.85), so no threshold separates
  // planted copies from background there; zero-mean vectors put random
  // pairs near cos 0 and the 0.9 bar cleanly isolates the plants
  private def vec(id: Long): Array[Float] = {
    val rnd = new scala.util.Random(id * 7919 + 13)
    Array.fill(Dims)(rnd.nextGaussian().toFloat)
  }
  private def emb(ids: Seq[Long]) =
    ids.map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")

  private val MinCos = 0.9

  private def freshIndex(base: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft-sdd-ix").toString + "/ix"
    AnnIndex.save(base, dir, numCells = 4, numSubspaces = 4,
      codebookSize = 4, dims = Dims)
    dir
  }

  test("copy of a corpus vector rejected; identical novel pair keeps the smaller id") {
    val base = emb(1L to 40L)
    val dir = freshIndex(base)
    val delta = emb(Seq(141L))                       // novel
      .unionByName(Seq((107L, vec(7L).toSeq)).toDF("vec_id", "embedding"))
      .unionByName(Seq((150L, vec(9999L).toSeq),     // identical novel pair
        (151L, vec(9999L).toSeq)).toDF("vec_id", "embedding"))
    val out = AnnIndex.semDedupIncremental(base, delta, dir, MinCos,
        nProbe = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Boolean]("keep"), r.getAs[Long]("n_dups_base"),
          r.getAs[Long]("n_dups_delta"))).toMap
    assert(out.keySet === Set(107L, 141L, 150L, 151L))
    assert(!out(107L)._1 && out(107L)._2 >= 1L,
      s"exact corpus copy must be rejected via the base leg: ${out(107L)}")
    assert(out(141L)._1, s"novel vector must be kept: ${out(141L)}")
    assert(out(150L)._1, s"smaller id of the identical pair survives: ${out(150L)}")
    assert(!out(151L)._1 && out(151L)._3 >= 1L,
      s"larger id of the identical pair is the in-batch dup: ${out(151L)}")
  }

  test("drained streaming admission candidates equal the batch generator") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = emb(1L to 40L)
    val dir = freshIndex(base)
    val vdir = AnnIndex.resolveDir(spark, dir)
    val (cents, _, _) = AnnIndex.loadQuantizers(spark, vdir)
    val baseVecs = AnnIndex.loadCodes(spark, vdir)
      .select(col("vec_id"), col("cell"))
      .join(base, Seq("vec_id"))
      // a long-running stream re-plans the static subtree every
      // micro-batch — persist it once, the probeCandidates convention
      .persist()
    val deltaRows = ((101L to 110L).map(i => (i, vec(i * 3).toSeq)) :+
      (120L, vec(7L).toSeq)).toSeq
    val batch = Similarity.semDedupAdmitCandidates(
        deltaRows.toDF("vec_id", "embedding"), baseVecs, cents, MinCos,
        nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val input = MemoryStream[(Long, Seq[Float])]
    val q = Similarity.semDedupAdmitCandidates(
        input.toDF().toDF("vec_id", "embedding"), baseVecs, cents, MinCos,
        nProbe = 2)
      .writeStream.format("memory").queryName("sdd_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sdd-ckpt").toString)
      .start()
    val (b1, b2) = deltaRows.splitAt(deltaRows.length / 2)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    val streamed = spark.table("sdd_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    baseVecs.unpersist()
    assert(streamed === batch)
    assert(batch.exists(_._1 == 120L), "the planted copy must surface a hit")
  }
}
