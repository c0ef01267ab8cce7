package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** q_pipe_retrieve: the RAG read path over the exported chunks — exact
  * cosine top-k of the deterministic query embedding with citation
  * columns. The oracle hash-checks the values; these specs pin the
  * retrieval CONTRACT: k dense ranks, score monotonicity, valid cosine
  * range, citation shape, and that the top-k really is the argmax of
  * the full scored set (no candidate got lost in the top-k plumbing). */
class RetrieveSpec extends SparkSpecBase {

  private lazy val rows =
    EnrichQueries.retrieve(spark, sfDir).collect()

  test("retrieve: k dense ranks with non-increasing cosine in [-1, 1]") {
    assert(rows.length === 5)
    assert(rows.map(_.getInt(0)).toSeq === (1 to 5))
    val cos = rows.map(_.getDouble(1))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    assert(cos.forall(c => c >= -1.000001 && c <= 1.000001))
  }

  test("retrieve: citation references are doc-page formatted") {
    rows.foreach { r =>
      val chap = r.getInt(2)
      assert(r.getString(7) === s"$chap-${r.getInt(5)}")
      assert(r.getString(8) === s"$chap-${r.getInt(6)}")
      assert(r.getInt(5) <= r.getInt(6)) // start page <= end page
    }
  }

  test("retrieve: returned top-k is the argmax of the full scored set") {
    // recompute every non-blank chunk's cosine and take the true top-5
    import graft.enrich.DeterministicEnricher
    val enr = new DeterministicEnricher(64)
    val qv = enr.embedBatch(Seq(EnrichQueries.RetrieveQuery)).head
    val full = graft.ops.EnrichStages.embedChunks(
      graft.ops.DocPipeline.sectionsToChunks(
        graft.ops.DocPipeline.pagesToSections({
          import spark.implicits._
          graft.Tables.documents(spark, sfDir)
            .select(col("doc_id"), col("text")).as[(Long, String)]
            .flatMap { case (id, t) => graft.text.FixtureCorpus.pages(id, t) }
        })), enr)
      .collect()
      .flatMap { r =>
        r.embedding.map { v =>
          val cos = BigDecimal(v.zip(qv).map { case (a, b) =>
            a.toDouble * b.toDouble }.sum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (cos, r.chapter_number, r.section_number, r.chunk_number)
        }
      }
      .sortBy { case (c, d, s, k) => (-c, d, s, k) }
      .take(5)
    val got = rows.map(r => (r.getDouble(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSeq
    assert(got === full.toSeq)
  }
}
