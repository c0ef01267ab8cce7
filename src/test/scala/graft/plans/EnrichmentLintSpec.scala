package graft.plans

import graft.SparkSpecBase
import graft.enrich.DeterministicEnricher
import graft.ops.{DocPipeline, EnrichStages}
import graft.text.FixtureCorpus

/** The lint must flag a self-joined enrichment subtree (each branch would
  * re-call the client) and stay quiet on a single-reference pipeline. */
class EnrichmentLintSpec extends SparkSpecBase {

  private val enricher = new DeterministicEnricher(8)

  private def chunks = {
    import spark.implicits._
    DocPipeline.sectionsToChunks(
      DocPipeline.pagesToSections(spark.createDataset(
        (0L until 4L).flatMap(id => FixtureCorpus.pages(id, s"text for $id " * 30)))))
  }

  test("single-reference enrichment has no re-execution risk") {
    val embedded = EnrichStages.embedChunks(chunks, enricher)
    val findings = EnrichmentLint.check(embedded)
    assert(findings.nonEmpty, "embedChunks must register as imperative")
    assert(!EnrichmentLint.hasReexecutionRisk(embedded))
  }

  test("self-joined enrichment subtree is flagged") {
    val embedded = EnrichStages.embedChunks(chunks, enricher)
    val a = embedded.select("document_id", "chapter_number", "section_number",
      "chunk_number", "embedding")
    val b = embedded.select("document_id", "chapter_number", "section_number",
      "chunk_number")
    val joined = a.join(b,
      Seq("document_id", "chapter_number", "section_number", "chunk_number"))
    assert(EnrichmentLint.hasReexecutionRisk(joined),
      "two branches over the same embedChunks subtree must be flagged")
  }
}
