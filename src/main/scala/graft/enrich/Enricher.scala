package graft.enrich

/** The external-enrichment seam (SURVEY §2.7): every LLM/embedding/OCR call
  * in the reference flows through this trait, injected into mapPartitions /
  * flatMapGroups operators. Production supplies HTTP clients (with retry,
  * token caching, batching, cost metering — client concerns, not operator
  * concerns); tests and the driver-checkable queries use the deterministic
  * stub below so the engine is verifiable without a network.
  *
  * Task-retry safety: Spark may re-execute a task; a live-LLM impl must be
  * made effectively idempotent (cache keyed by content hash) so re-runs are
  * replays (SURVEY §7.4 hazard 2). The deterministic stub is trivially so.
  */
trait Enricher extends Serializable {

  /** G8 fold step (stage_01_chapter_processing.py:773-810): summarize one
    * chapter segment given the accumulated summary so far. */
  def chapterSegmentSummary(segment: String, prevSummary: Option[String],
      isFinal: Boolean): String

  /** G9 (stage_02_section_processing.py:1755-1774): summarize one section
    * given chapter summary, hierarchy breadcrumb, and up to the last five
    * previous section summaries. */
  def sectionSummary(sectionContent: String, chapterSummary: String,
      hierarchy: String, previousSummaries: Seq[String]): String

  /** L4 (catalog stage3_generate_summaries.py:513-626): one call yielding
    * (document_description, document_usage). */
  def describeDocument(documentContent: String): (String, String)

  /** L6 (stage_04_embedding_generation.py:444-535): embed a batch of texts,
    * index-aligned. Never called with empty strings — the operator
    * substitutes " " and restores null afterwards (P9). */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]

  /** S13 (semantic search/stage_01_chapter_processing.py:419-503): one
    * OCR call converting one page image to markdown. S14's concurrency
    * (the reference's per-page thread pool) comes from Spark
    * partitioning around this seam (EnrichStages.ocrPages). */
  def ocrPage(image: Array[Byte], pageNumber: Int): String

  /** L8/S20 (catalog search - vision/stage2_process_vision.py:363-446):
    * one vision-model call for one analysis pass over one page image. */
  def visionAnalyze(passName: String, prompt: String,
      image: Array[Byte]): String

  /** S21 (stage2_process_vision.py:485-543): synthesize the six pass
    * outputs into a Markdown rendition of the page. The prompt shape is
    * `Prompts.visionSynthesis` (parity-tested). */
  def visionSynthesize(pageVisionData: Seq[(String, String)],
      pageNumber: Int): String

  /** Embedding dimensionality (reference: 2000; tests may shrink). */
  def embeddingDims: Int
}

/** Pure-function enricher: extractive summaries + seeded pseudo-embeddings.
  * Same input → same output, forever — the engine's correctness tests and
  * golden outputs are built on this. */
final class DeterministicEnricher(val embeddingDims: Int = 64) extends Enricher {

  private def firstSentences(text: String, n: Int): String = {
    val trimmed = text.trim.replaceAll("\\s+", " ")
    val parts = trimmed.split("(?<=[.!?])\\s+").filter(_.nonEmpty)
    parts.take(n).mkString(" ")
  }

  private def h64(s: String): Long = {
    // FNV-1a 64-bit: stable, dependency-free
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  // zero-padded so tags are ALWAYS 8 hex chars (unpadded toHexString
  // shrinks on leading-zero hashes, which would break length-based
  // oracles with ~2^-36 probability per value)
  private def tag8(h: Long): String = f"$h%016x".take(8)

  override def chapterSegmentSummary(segment: String, prevSummary: Option[String],
      isFinal: Boolean): String = {
    val head = firstSentences(segment, 2)
    val carry = prevSummary.map(p => firstSentences(p, 1) + " ").getOrElse("")
    val tag = if (isFinal) "FINAL" else "PART"
    s"[$tag ${tag8(h64(segment))}] $carry$head"
  }

  override def sectionSummary(sectionContent: String, chapterSummary: String,
      hierarchy: String, previousSummaries: Seq[String]): String = {
    val ctx = previousSummaries.takeRight(5)
    val head = firstSentences(sectionContent, 2)
    s"(${ctx.length} prior) $head"
  }

  override def describeDocument(documentContent: String): (String, String) = {
    val head = firstSentences(documentContent, 3)
    // md5-derived tag (portable-hash pattern): any engine, including the
    // DuckDB oracle, reproduces the usage string bit-for-bit
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(documentContent.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(8)
    (s"Description: $head",
      s"Usage: reference document $md5hex")
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      val base = h64(t)
      val v = Array.tabulate(embeddingDims) { d =>
        val x = h64(s"$base:$d")
        // map to [-1, 1): high 24 bits as a float fraction
        ((x >>> 40).toInt / 8388608.0f) - 1.0f
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      if (norm == 0f) v else v.map(_ / norm)
    }

  private def h64b(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= b(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Portable-hash stub (the md5 pattern, like describeDocument): the
    * full markdown is reproducible by ANY engine with md5 over the page
    * bytes, so the OCR path is value-checkable end to end (q_ocr_pages
    * hashes the reassembled per-page markdown). */
  override def ocrPage(image: Array[Byte], pageNumber: Int): String = {
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(image).map(b => f"${b & 0xff}%02x").mkString
    s"# OCR Page $pageNumber\n\n[scan $md5hex] ${image.length} bytes"
  }

  override def visionAnalyze(passName: String, prompt: String,
      image: Array[Byte]): String = {
    val tag = tag8(h64b(image) ^ h64(passName) ^ h64(prompt))
    s"[$passName $tag] ${image.length} bytes analyzed"
  }

  override def visionSynthesize(pageVisionData: Seq[(String, String)],
      pageNumber: Int): String =
    (s"# Page $pageNumber" +:
      pageVisionData.map { case (name, result) =>
        s"## ${name.toUpperCase.replace('_', ' ')}\n$result"
      }).mkString("\n\n")
}
