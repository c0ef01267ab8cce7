package graft.enrich

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** One chat message as sent to an LLM endpoint. */
final case class ChatMessage(role: String, content: String)

/** Prompt builders for every enrichment call the reference system makes
  * (SURVEY §2.7 L2/L3/L4/L5/L8). All pure text assembly — byte-parity with
  * the reference is asserted by PromptParitySpec against goldens produced
  * by RUNNING the reference's own builders:
  *
  *  - chapter rolling-summary prompt:
  *    `semantic search/stage_01_chapter_processing.py:530-631`
  *  - section summary prompt (last-5 sliding context):
  *    `semantic search/stage_02_section_processing.py:1299-1383`
  *  - catalog usage/description prompt (python-format template):
  *    `catalog search/stage3_generate_summaries.py:115-183,530-541`
  *  - SAB99 structured-extract variant:
  *    `catalog search - sab99/stage3_generate_summaries.py:110-270,617-627`
  *  - vision 6-pass prompts + markdown synthesis:
  *    `catalog search - vision/stage2_process_vision.py:130-179,485-533`
  *
  * The fixed template blocks live under `src/main/resources/graft/prompts/`
  * (extracted mechanically by tools/extract_reference_prompts.py — they are
  * the reference's prompt *data*, which parity requires verbatim); the
  * assembly logic around them is reimplemented here.
  */
object Prompts {

  private val mapper = new ObjectMapper

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/graft/prompts/$name")
    require(in != null, s"missing prompt resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Python `str.format` semantics for the subset the reference templates
    * use: named `{field}` substitution plus `{{`/`}}` brace escapes. */
  private[enrich] def pythonFormat(template: String,
      fields: Map[String, String]): String = {
    val sb = new StringBuilder(template.length + 256)
    var i = 0
    while (i < template.length) {
      val c = template.charAt(i)
      if (c == '{' && i + 1 < template.length && template.charAt(i + 1) == '{') {
        sb.append('{'); i += 2
      } else if (c == '}' && i + 1 < template.length &&
          template.charAt(i + 1) == '}') {
        sb.append('}'); i += 2
      } else if (c == '{') {
        val end = template.indexOf('}', i)
        require(end > i, s"unterminated placeholder at $i")
        val key = template.substring(i + 1, end)
        sb.append(fields.getOrElse(key,
          throw new IllegalArgumentException(s"missing field '$key'")))
        i = end + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ---------------------------------------------------------------------
  // L2 — chapter analysis (stage_01_chapter_processing.py:530-631)
  // ---------------------------------------------------------------------

  val chapterToolName = "provide_chapter_analysis"
  lazy val chapterToolSchema: JsonNode = mapper.readTree(resource("chapter_tool.json"))

  val chapterSystemPrompt: String =
    """<role>
      |You are an expert financial reporting specialist analyzing EY technical accounting guidance.
      |</role>
      |
      |<context>
      |You are processing content from comprehensive accounting guidance manuals covering IFRS and US GAAP.
      |The content will be used to build a searchable knowledge base for accounting professionals.
      |</context>
      |
      |<objective>
      |Extract and structure key information from the provided text segment to create
      |a detailed, structured summary following specific guidelines.
      |</objective>
      |
      |<style>
      |- Technical and precise
      |- Structured with clear sections
      |- Comprehensive yet concise
      |- Professional tone
      |</style>
      |
      |<tone>
      |Expert, analytical, objective
      |</tone>
      |
      |<audience>
      |Accounting professionals requiring specific technical guidance
      |</audience>
      |
      |<response_format>
      |YOU MUST use the 'provide_chapter_analysis' tool to structure your response.
      |DO NOT provide a plain text response.
      |</response_format>""".stripMargin

  private val chapterSummaryRequirements =
    """Create a condensed summary in EXACTLY 2-3 sentences that captures:
      |1. The primary purpose and scope of this chapter
      |2. The main accounting standards and technical topics covered (e.g., IFRS 16, ASC 842)
      |3. Key applicability, outcomes, or decision points
      |
      |Be extremely concise while embedding all critical information. Do NOT use section headers or bullet points.
      |Total output must be 2-3 complete sentences only.""".stripMargin

  private val chapterTaskFinal =
    """<task>
      |This is the FINAL segment. Synthesize ALL information from previous and current segments.
      |Ensure the summary comprehensively covers the ENTIRE chapter content.
      |</task>""".stripMargin

  private val chapterTaskContinue =
    "<task>\nIntegrate this segment with previous context. \nUpdate and expand the summary to include new information.\nMaintain continuity with previous analysis.\n</task>"

  private val chapterTaskInitial =
    """<task>
      |Analyze this initial segment and create the foundation summary.
      |Focus only on the content provided in the current segment.
      |</task>""".stripMargin

  private val chapterCriticalRequirement =
    """<critical_requirement>
      |YOU MUST USE THE 'provide_chapter_analysis' TOOL TO PROVIDE YOUR RESPONSE.
      |The tool must include the 'summary' field with comprehensive content.
      |</critical_requirement>""".stripMargin

  /** Rolling chapter-summary prompt: fold each budget segment with the
    * previous summary as context; the final segment asks for synthesis. */
  def chapterAnalysis(segmentText: String, prevSummary: Option[String],
      isFinalSegment: Boolean): Seq[ChatMessage] = {
    val parts = Seq.newBuilder[String]
    prevSummary.foreach { prev =>
      parts += "<previous_context>"
      parts += s"<previous_summary>\n$prev\n</previous_summary>"
      parts += "</previous_context>"
    }
    parts += s"<current_segment>\n$segmentText\n</current_segment>"
    parts += "<instructions>"
    parts += "<summary_requirements>"
    parts += chapterSummaryRequirements
    parts += "</summary_requirements>"
    parts += (if (isFinalSegment && prevSummary.isDefined) chapterTaskFinal
      else if (prevSummary.isDefined) chapterTaskContinue
      else chapterTaskInitial)
    parts += "</instructions>"
    parts += chapterCriticalRequirement
    Seq(ChatMessage("system", chapterSystemPrompt),
      ChatMessage("user", parts.result().mkString("\n")))
  }

  // ---------------------------------------------------------------------
  // L3 — section analysis (stage_02_section_processing.py:1299-1383)
  // ---------------------------------------------------------------------

  val sectionToolName = "provide_section_analysis"
  lazy val sectionToolSchema: JsonNode = mapper.readTree(resource("section_tool.json"))

  val sectionSystemPrompt: String =
    "<role>You are an expert financial reporting specialist analyzing EY technical accounting guidance.</role>\n<expertise>Deep knowledge of IFRS, US GAAP, accounting standards, and technical implementation guidance.</expertise>"

  private val sectionObjective =
    """Create a condensed summary that:
      |1. Captures the essential purpose and content of this section
      |2. Naturally embeds relevant accounting standards and technical references
      |3. Provides sufficient detail for semantic search and retrieval
      |4. Maintains continuity with previous sections in the chapter""".stripMargin

  private val sectionStyle =
    """Technical and precise, using domain-specific terminology.
      |Embed standards naturally: "Explains IFRS 16 lease classification criteria including..."
      |Include specific references: "per ASC 842-10-15" when mentioned in content.
      |Write in present tense, third person.""".stripMargin

  private val sectionResponseRequirements =
    """EXACTLY 2-3 complete sentences.
      |Must be self-contained and understandable without reading the full section.
      |Naturally embed all relevant metadata, standards, and technical terms.
      |Focus on WHAT the section covers and WHY it matters.""".stripMargin

  /** Section summary prompt with the last-5 previous summaries as sliding
    * context (the reference's `previous_summaries[-5:]`). */
  def sectionAnalysis(sectionContent: String, chapterSummary: String,
      hierarchy: String, previousSummaries: Seq[String]): Seq[ChatMessage] = {
    val parts = Seq.newBuilder[String]
    parts += "<prompt>"
    parts += "<context>"
    parts += "<document_type>EY Technical Accounting Guidance</document_type>"
    parts += s"<chapter_summary>$chapterSummary</chapter_summary>"
    parts += s"<section_hierarchy>$hierarchy</section_hierarchy>"
    if (previousSummaries.nonEmpty) {
      parts += "<previous_sections>"
      parts += previousSummaries.takeRight(5).mkString("\n\n")
      parts += "</previous_sections>"
    }
    parts += "</context>"
    parts += "<objective>"
    parts += sectionObjective
    parts += "</objective>"
    parts += "<style>"
    parts += sectionStyle
    parts += "</style>"
    parts += "<tone>"
    parts += "Professional, authoritative, and concise. Neutral and factual."
    parts += "</tone>"
    parts += "<audience>"
    parts += "Professional accountants, auditors, and financial reporting specialists searching for specific technical guidance."
    parts += "</audience>"
    parts += "<current_section>"
    parts += sectionContent
    parts += "</current_section>"
    parts += "<response_requirements>"
    parts += sectionResponseRequirements
    parts += "</response_requirements>"
    parts += "<response_format>YOU MUST use the 'provide_section_analysis' tool to provide your response.</response_format>"
    parts += "</prompt>"
    Seq(ChatMessage("system", sectionSystemPrompt),
      ChatMessage("user", parts.result().mkString("\n")))
  }

  // ---------------------------------------------------------------------
  // L4/L5 — catalog + SAB99 variant (single formatted system message)
  // ---------------------------------------------------------------------

  val catalogToolName = "generate_catalog_fields"
  lazy val catalogToolSchema: JsonNode = mapper.readTree(resource("catalog_tool.json"))
  lazy val sab99ToolSchema: JsonNode = mapper.readTree(resource("sab99_tool.json"))

  private lazy val catalogTemplate = resource("catalog_system.txt")
  private lazy val sab99Template = resource("sab99_system.txt")

  private def formatted(template: String, markdownContent: String,
      detailLevel: String, documentSource: String, filename: String): String =
    pythonFormat(template, Map(
      "markdown_content" -> markdownContent,
      "detail_level" -> detailLevel,
      "document_source" -> documentSource,
      "filename" -> filename))

  /** L4: catalog usage/description prompt — one system message, the
    * document content embedded in the template. */
  def catalogMessages(markdownContent: String, detailLevel: String,
      documentSource: String, filename: String): Seq[ChatMessage] =
    Seq(ChatMessage("system", formatted(catalogTemplate, markdownContent,
      detailLevel, documentSource, filename)))

  /** L5: SAB99 structured-extract variant (config-swapped template, same
    * call shape and tool). */
  def sab99Messages(markdownContent: String, detailLevel: String,
      documentSource: String, filename: String): Seq[ChatMessage] =
    Seq(ChatMessage("system", formatted(sab99Template, markdownContent,
      detailLevel, documentSource, filename)))

  // ---------------------------------------------------------------------
  // L8 — vision passes + markdown synthesis
  // ---------------------------------------------------------------------

  /** The six fixed vision passes in the reference's declaration order. */
  lazy val visionPasses: Seq[(String, String)] = {
    val node = mapper.readTree(resource("vision_prompts.json"))
    node.properties().asScala.toSeq.map(e => e.getKey -> e.getValue.asText())
  }

  val visionSynthesisSystemPrompt: String =
    "You are an expert technical writer specializing in interpreting multi-modal analysis results. " +
      "Your task is to synthesize vision model outputs describing an infographic page into a " +
      "comprehensive and accurate Markdown representation of that page."

  private val visionSynthesisInstruction =
    "Synthesize the above multi-pass vision model analysis into a single, coherent Markdown document " +
      "representing this page's content. Preserve structure like tables and lists where possible. " +
      "Focus on accurately representing the information conveyed visually and textually."

  /** S21: combine per-pass outputs into the synthesis call
    * (`stage2_process_vision.py:507-533`). `pageVisionData` preserves pass
    * order (the reference iterates dict insertion order). */
  def visionSynthesis(pageVisionData: Seq[(String, String)],
      pageNumber: Int): Seq[ChatMessage] = {
    val parts = Seq.newBuilder[String]
    parts += s"Vision Model Analysis for Page $pageNumber:\n"
    pageVisionData.foreach { case (passName, result) =>
      parts += s"--- ${passName.toUpperCase.replace('_', ' ')} ---"
      parts += result
      parts += ""
    }
    parts += "---"
    parts += visionSynthesisInstruction
    Seq(ChatMessage("system", visionSynthesisSystemPrompt),
      ChatMessage("user", parts.result().mkString("\n")))
  }
}
