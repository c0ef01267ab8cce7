package graft.enrich

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator
import graft.text.Tokens

/** L9/S22: enrichment cost accounting
  * (stage_01_chapter_processing.py:92-94,652-658;
  * stage_04_embedding_generation.py:92,496-500).
  *
  * Accumulator-backed decorator over any Enricher: every call meters
  * estimated prompt/completion/embedding tokens on the executors; the
  * driver reads the totals after an action and prices them with the
  * reference's constants ($0.01/1k prompt, $0.03/1k completion,
  * $0.00013/1k embedding). This is the engine's process-monitor feed —
  * at scale the report row appends to the monitor table via JDBC.
  */
final class CostMeter(spark: SparkSession) extends Serializable {
  val chatCalls: LongAccumulator = spark.sparkContext.longAccumulator("enrich.chatCalls")
  val promptTokens: LongAccumulator = spark.sparkContext.longAccumulator("enrich.promptTokens")
  val completionTokens: LongAccumulator = spark.sparkContext.longAccumulator("enrich.completionTokens")
  val embedCalls: LongAccumulator = spark.sparkContext.longAccumulator("enrich.embedCalls")
  val embedTokens: LongAccumulator = spark.sparkContext.longAccumulator("enrich.embedTokens")

  def costUsd: Double =
    promptTokens.value * 0.01 / 1000 +
      completionTokens.value * 0.03 / 1000 +
      embedTokens.value * 0.00013 / 1000
}

/** Metering wrapper: counts estimator-A tokens for every call. */
final class MeteredEnricher(inner: Enricher, meter: CostMeter) extends Enricher {

  override def embeddingDims: Int = inner.embeddingDims

  override def chapterSegmentSummary(segment: String, prevSummary: Option[String],
      isFinal: Boolean): String = {
    val out = inner.chapterSegmentSummary(segment, prevSummary, isFinal)
    meter.chatCalls.add(1)
    meter.promptTokens.add(Tokens.estimateA(segment) +
      prevSummary.map(Tokens.estimateA).getOrElse(0))
    meter.completionTokens.add(Tokens.estimateA(out))
    out
  }

  override def sectionSummary(sectionContent: String, chapterSummary: String,
      hierarchy: String, previousSummaries: Seq[String]): String = {
    val out = inner.sectionSummary(sectionContent, chapterSummary, hierarchy, previousSummaries)
    meter.chatCalls.add(1)
    meter.promptTokens.add(Tokens.estimateA(sectionContent) +
      Tokens.estimateA(chapterSummary) +
      previousSummaries.takeRight(5).map(Tokens.estimateA).sum)
    meter.completionTokens.add(Tokens.estimateA(out))
    out
  }

  override def describeDocument(documentContent: String): (String, String) = {
    val out = inner.describeDocument(documentContent)
    meter.chatCalls.add(1)
    meter.promptTokens.add(Tokens.estimateA(documentContent))
    meter.completionTokens.add(Tokens.estimateA(out._1) + Tokens.estimateA(out._2))
    out
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    meter.embedCalls.add(1)
    meter.embedTokens.add(texts.map(Tokens.estimateA).sum)
    inner.embedBatch(texts)
  }

  override def ocrPage(image: Array[Byte], pageNumber: Int): String = {
    val out = inner.ocrPage(image, pageNumber)
    meter.chatCalls.add(1)
    meter.completionTokens.add(Tokens.estimateA(out))
    out
  }

  override def visionAnalyze(passName: String, prompt: String,
      image: Array[Byte]): String = {
    val out = inner.visionAnalyze(passName, prompt, image)
    meter.chatCalls.add(1)
    meter.promptTokens.add(Tokens.estimateA(prompt))
    meter.completionTokens.add(Tokens.estimateA(out))
    out
  }

  override def visionSynthesize(pageVisionData: Seq[(String, String)],
      pageNumber: Int): String = {
    val out = inner.visionSynthesize(pageVisionData, pageNumber)
    meter.chatCalls.add(1)
    meter.promptTokens.add(
      pageVisionData.map(p => Tokens.estimateA(p._2)).sum)
    meter.completionTokens.add(Tokens.estimateA(out))
    out
  }
}
