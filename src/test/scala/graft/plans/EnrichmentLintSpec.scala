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

  test("speculation guard: flags speculation × enrichment, and ONLY that") {
    val embedded = EnrichStages.embedChunks(chunks, enricher)
    // polarity 1: speculation off (the real conf of this test context,
    // read through the default path) → no hazard even with enrichment
    assert(!EnrichmentLint.speculationHazard(embedded))
    // polarity 2: speculation on + enrichment stage → hazard, loudly
    // (a live context's core conf cannot be flipped, so the flag is
    // injected — the same value the SparkConf path would return under
    // spark-submit --conf spark.speculation=true)
    assert(EnrichmentLint.speculationHazard(embedded, Some(true)))
    val e = intercept[IllegalStateException] {
      EnrichmentLint.requireNoSpeculation(embedded, Some(true))
    }
    assert(e.getMessage.contains("speculation"))
    // polarity 3: speculation on but a purely relational plan (no
    // imperative node anywhere) → clean
    val relational = spark.range(10).toDF().selectExpr("id * 2 as v")
    assert(!EnrichmentLint.speculationHazard(relational, Some(true)))
    EnrichmentLint.requireNoSpeculation(relational, Some(true)) // no throw
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
