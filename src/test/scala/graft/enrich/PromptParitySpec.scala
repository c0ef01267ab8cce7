package graft.enrich

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Byte-level parity for the enrichment prompt builders and the
  * tool-enforcement retry machine (L1/L2/L3/L4/L5/L8), against goldens
  * produced by RUNNING the reference's own builders — including the retry
  * loop driven by a scripted fake client (tools/gen_reference_golden.py).
  */
class PromptParitySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper

  private lazy val cases: Seq[JsonNode] =
    scala.io.Source.fromFile("src/test/resources/reference_golden.jsonl", "UTF-8")
      .getLines().map(mapper.readTree).toSeq

  private def ofKind(kind: String): Seq[JsonNode] =
    cases.filter(_.get("kind").asText == kind)

  private def messages(node: JsonNode): Seq[ChatMessage] =
    node.elements().asScala.toSeq.map(m =>
      ChatMessage(m.get("role").asText, m.get("content").asText))

  test("L2: chapter analysis prompt matches the reference byte-for-byte") {
    val cs = ofKind("chapterPrompt")
    assert(cs.nonEmpty)
    cs.foreach { c =>
      val prev = if (c.get("prev").isNull) None else Some(c.get("prev").asText)
      val got = Prompts.chapterAnalysis(
        c.get("segment").asText, prev, c.get("final").asBoolean)
      assert(got == messages(c.get("messages")),
        s"chapter prompt mismatch (prev=${prev.isDefined}, final=${c.get("final")})")
    }
  }

  test("L3: section analysis prompt matches the reference byte-for-byte") {
    val cs = ofKind("sectionPrompt")
    assert(cs.nonEmpty)
    // cover the >5-previous-summaries truncation path
    assert(cs.exists(_.get("previous").size > 5))
    cs.foreach { c =>
      val prevs = c.get("previous").elements().asScala.toSeq.map(_.asText)
      val got = Prompts.sectionAnalysis(c.get("content").asText,
        c.get("chapter_summary").asText, c.get("hierarchy").asText, prevs)
      assert(got == messages(c.get("messages")),
        s"section prompt mismatch (n_prev=${prevs.length})")
    }
  }

  test("L4/L5: catalog + sab99 system prompts match byte-for-byte") {
    val cs = ofKind("catalogPrompt")
    assert(cs.nonEmpty)
    cs.foreach { c =>
      val (md, dl, src, fn) = (c.get("md").asText, c.get("detail").asText,
        c.get("source").asText, c.get("filename").asText)
      assert(Prompts.catalogMessages(md, dl, src, fn) ==
        Seq(ChatMessage("system", c.get("catalog").asText)), "catalog prompt")
      assert(Prompts.sab99Messages(md, dl, src, fn) ==
        Seq(ChatMessage("system", c.get("sab99").asText)), "sab99 prompt")
    }
  }

  test("tool schemas match the reference (order-insensitive JSON)") {
    val c = ofKind("toolSchemas").head
    assert(Prompts.chapterToolSchema == c.get("chapter"))
    assert(Prompts.sectionToolSchema == c.get("section"))
    assert(Prompts.catalogToolSchema == c.get("catalog"))
    assert(Prompts.sab99ToolSchema == c.get("sab99"))
    assert(Prompts.chapterToolSchema.path("function").path("name").asText ==
      Prompts.chapterToolName)
    assert(Prompts.catalogToolSchema.path("function").path("name").asText ==
      Prompts.catalogToolName)
  }

  test("L8: the six vision passes match in order and content") {
    val want = ofKind("visionPasses").head.get("passes").elements().asScala
      .toSeq.map(p => p.get("name").asText -> p.get("prompt").asText)
    assert(want.length == 6)
    assert(Prompts.visionPasses == want)
  }

  test("L8: vision synthesis messages match the reference assembly") {
    val cs = ofKind("visionSynth")
    assert(cs.nonEmpty)
    cs.foreach { c =>
      val passes = c.get("passes").elements().asScala.toSeq
        .map(p => p.get("name").asText -> p.get("result").asText)
      val got = Prompts.visionSynthesis(passes, c.get("page").asInt)
      assert(got == messages(c.get("messages")), "vision synthesis mismatch")
    }
  }

  test("T3/G8: chapter segmentation + rolling fold match the reference") {
    import graft.text.Segmenter
    val cs = ofKind("chapterFold")
    assert(cs.nonEmpty)
    assert(cs.exists(_.get("segments").size > 1), "segmentation never triggered")
    cs.foreach { c =>
      val text = c.get("text").asText
      val want = c.get("segments").elements().asScala.toSeq.map(_.asText)
      val segs = Segmenter.segmentChapter(text, limit = 3000, buffer = 2000)
      assert(segs == want, s"segments mismatch (${segs.length} vs ${want.length})")
      // fold wiring: each segment's prompt carries the prior scripted
      // summary; the last non-empty segment is flagged final
      var prev: Option[String] = None
      val got = segs.zipWithIndex.map { case (seg, i) =>
        val m = Prompts.chapterAnalysis(seg, prev, i == segs.length - 1)
        prev = Some(s"SUMMARY ${i + 1}")
        m
      }
      val wantMsgs = c.get("messages").elements().asScala.toSeq.map(messages)
      assert(got == wantMsgs, "fold prompt sequence mismatch")
      assert(c.get("result").asText == s"SUMMARY ${segs.length}")
    }
  }

  test("T4/G9: section segmentation + segment fold match the reference") {
    import graft.text.Segmenter
    val cs = ofKind("sectionFold")
    assert(cs.nonEmpty)
    assert(cs.exists(_.get("segments").size > 1), "segmentation never triggered")
    cs.foreach { c =>
      val content = c.get("content").asText
      val want = c.get("segments").elements().asScala.toSeq.map(_.asText)
      val segs = Segmenter.segmentSection(content, limit = 5000, buffer = 4000)
      assert(segs == want, s"segments mismatch (${segs.length} vs ${want.length})")
      val prevs = c.get("previous").elements().asScala.toSeq.map(_.asText)
      val ch = c.get("chapter_summary").asText
      val hier = c.get("hierarchy").asText
      val got = segs.zipWithIndex.map { case (seg, i) =>
        val p = if (i == 0) prevs
          else prevs :+ s"Previous segment summary: SSUM $i"
        Prompts.sectionAnalysis(seg, ch, hier, p)
      }
      val wantMsgs = c.get("messages").elements().asScala.toSeq.map(messages)
      assert(got == wantMsgs, "section fold prompt sequence mismatch")
      assert(c.get("result").asText == s"SSUM ${segs.length}")
    }
  }

  test("L1: retry machine reproduces the reference's attempt trace exactly") {
    val cs = ofKind("retryTrace")
    assert(cs.length >= 9)
    cs.foreach { c =>
      val script = c.get("script").elements().asScala.toSeq.map(_.asText)
      val base = messages(c.get("base_messages"))
      var step = 0
      var seen = Vector.empty[Seq[ChatMessage]]
      val result = ToolRetry.run(base, "provide_chapter_analysis",
        Seq("summary"), msgs => {
          seen :+= msgs
          val s = script(math.min(step, script.length - 1)); step += 1
          s match {
            case "api_error" => ToolRetry.ApiError("boom")
            case "no_tool" => ToolRetry.NoToolCall
            case "wrong_tool" => ToolRetry.ToolCall("other_tool", "{}")
            case "bad_json" =>
              ToolRetry.ToolCall("provide_chapter_analysis", "{not json")
            case "empty_summary" =>
              ToolRetry.ToolCall("provide_chapter_analysis", """{"summary": ""}""")
            case "good" => ToolRetry.ToolCall("provide_chapter_analysis",
              """{"summary": "A fine summary."}""")
          }
        })
      // per-attempt messages (incl. enforcement insertion position)
      val wantAttempts = c.get("attempt_messages").elements().asScala.toSeq
        .map(messages)
      assert(seen == wantAttempts, s"attempt messages for $script")
      // sleep schedule (flat vs exponential backoff)
      val wantSleeps = c.get("sleeps").elements().asScala.toSeq.map(_.asInt)
      assert(result.sleptSec == wantSleeps, s"sleep schedule for $script")
      // final outcome
      if (c.get("result").isNull) assert(result.args.isEmpty)
      else {
        val want = c.get("result").properties().asScala
          .map(e => e.getKey -> e.getValue.asText).toMap
        assert(result.args.contains(want), s"result for $script")
      }
    }
  }
}
