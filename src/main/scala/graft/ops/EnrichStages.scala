package graft.ops

import org.apache.spark.sql.Dataset
import graft.enrich.Enricher
import graft.model._
import graft.text.{PageTags, Segmenter, Sections}

/** Enrichment pipeline stages (SURVEY §2.7, stages 01/02-summaries/04).
  *
  * Structure over parallelism: G8/G9 are sequential folds WITHIN a chapter
  * (each call's output feeds the next call's input) and cannot be window
  * functions — they run in flatMapGroups over chapter-sorted rows, parallel
  * across chapters. Embedding (L6) has no cross-row dependence — it is
  * mapPartitions with client-side batching (batch 32, reference
  * stage_04_embedding_generation.py:85).
  */
object EnrichStages {

  /** Stage-01 core (G5+T3+G8+J11/P1): group pages by chapter, ordered
    * concat "\n\n", fixed-budget segmentation, rolling summary fold, then
    * broadcast the chapter summary back onto every page. */
  def enrichPages(pages: Dataset[PageRecord], enricher: Enricher): Dataset[EnrichedPageRecord] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .filter((p: PageRecord) => p.chapter_number.isDefined)
      .groupByKey(p => (p.document_id, p.chapter_number.get))
      .flatMapGroups { (key: (String, Int), it: Iterator[PageRecord]) =>
        val chapterPages = it.toSeq.sortBy(_.page_number)
        val chapterText = chapterPages.map(_.content).mkString("\n\n") // G5
        val segments = Segmenter.segmentChapter(chapterText)           // T3
        val summary = segments.zipWithIndex.foldLeft(Option.empty[String]) {
          case (prev, (seg, i)) =>                                     // G8 fold
            Some(enricher.chapterSegmentSummary(seg, prev, i == segments.length - 1))
        }.getOrElse("")
        chapterPages.map { p =>                                        // J11 + P1
          EnrichedPageRecord(
            document_id = p.document_id, filename = p.filename,
            filepath = p.filepath, source_filename = p.source_filename,
            chapter_number = key._2, chapter_name = p.chapter_name,
            chapter_summary = summary, chapter_page_count = chapterPages.length,
            page_number = p.page_number, page_reference = p.page_reference,
            source_page_number = p.source_page_number, content = p.content)
        }
      }
  }

  /** Stage-02 summary pass (G9): per chapter in section order, each summary
    * sees the previous five; stored summary = "hierarchy\n\nsummary"; the
    * context entries carry the "[Section N]" prefix
    * (stage_02_section_processing.py:1760-1770). Oversized sections are
    * budget-segmented and folded — each segment call appends the
    * accumulated segment summary to the context, exactly the reference's
    * loop (stage_02:1416-1507, parity-tested via PromptParitySpec). */
  def summarizeSections(sections: Dataset[SectionRecord],
      enricher: Enricher,
      tokenLimit: Int = Segmenter.GptInputTokenLimit,
      tokenBuffer: Int = Segmenter.TokenBuffer + 2000): Dataset[SectionRecord] = {
    val spark = sections.sparkSession
    import spark.implicits._
    sections
      .groupByKey(s => (s.document_id, s.chapter_number))
      .flatMapGroups { (_: (String, Int), it: Iterator[SectionRecord]) =>
        val ordered = it.toSeq.sortBy(_.section_number)
        val out = scala.collection.mutable.ArrayBuffer[SectionRecord]()
        val previous = scala.collection.mutable.ArrayBuffer[String]()
        ordered.foreach { s =>
          // the reference's empty-content guard (stage_02:1396-1407):
          // blank sections get the default summary, no model call
          val generated = if (s.section_content == null ||
              s.section_content.trim.isEmpty)
            s"Section covering ${s.section_title}"
          else Segmenter.segmentSection(s.section_content, tokenLimit,
            tokenBuffer).zipWithIndex.foldLeft("") {
            case (acc, (seg, i)) =>
              val ctx = if (i == 0) previous.toSeq
                else previous.toSeq :+ s"Previous segment summary: $acc"
              enricher.sectionSummary(seg, s.chapter_summary,
                s.section_hierarchy, ctx)
          }
          val full = s"${s.section_hierarchy}\n\n$generated"
          out += s.copy(section_summary = full)
          previous += s"[Section ${s.section_number}] $full"
        }
        out
      }
  }

  /** Stage-04 (T11+L6+P9): strip page tags, embed in batches of 32; blank
    * text embeds as null (empty→" " substitution then null restore —
    * stage_04_embedding_generation.py:470-517). */
  def embedChunks(chunks: Dataset[ChunkRecord], enricher: Enricher,
      batchSize: Int = 32): Dataset[EmbeddedChunkRecord] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val cleaned = batch.map(c => PageTags.clean(c.chunk_content))
        val blank = cleaned.map(_.trim.isEmpty)
        val inputs = cleaned.zip(blank).map { case (t, b) => if (b) " " else t }
        val vectors = enricher.embedBatch(inputs)
        batch.lazyZip(vectors).lazyZip(blank).map { (c, v, isBlank) =>
          EmbeddedChunkRecord(
            document_id = c.document_id, chapter_number = c.chapter_number,
            section_number = c.section_number, chunk_number = c.chunk_number,
            chunk_content = c.chunk_content,
            embedding = if (isBlank) None else Some(v))
        }
      }
    }
  }

  /** Catalog stage-3 analog (L4+L6): per-document description/usage plus
    * embeddings of both. */
  def describeDocuments(docs: Dataset[(Long, String)], enricher: Enricher,
      batchSize: Int = 50): Dataset[(Long, String, String, Array[Float], Array[Float])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val described = batch.map { case (id, text) =>
          val (desc, usage) = enricher.describeDocument(text)
          (id, desc, usage)
        }
        val descVecs = enricher.embedBatch(described.map(_._2))
        val usageVecs = enricher.embedBatch(described.map(_._3))
        described.lazyZip(descVecs).lazyZip(usageVecs).map { (d, dv, uv) =>
          (d._1, d._2, d._3, dv, uv)
        }
      }
    }
  }

  /** S13+S14: per-page OCR through the enrichment seam. The reference
    * fans pages across a thread pool per document
    * (`semantic search/stage_01_chapter_processing.py:419-503`); here
    * the same fan-out is Spark partitioning — every page row is an
    * independent task-parallel call, which scales past one machine's
    * thread pool. Output: (doc_id, page_number, markdown). */
  def ocrPages(pages: Dataset[(Long, Int, Array[Byte])],
      enricher: Enricher): Dataset[(Long, Int, String)] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.map { case (docId, pageNo, image) =>
      (docId, pageNo, enricher.ocrPage(image, pageNo))
    }
  }

  /** Vision stage-2 analog (S20+S21/L8,
    * `catalog search - vision/stage2_process_vision.py:545-591`): run the
    * six fixed analysis passes over each page image in declaration order,
    * then synthesize the pass outputs into the page's Markdown. One row
    * per page; the per-page fan-out parallelism the reference gets from
    * its thread pool comes from Spark partitioning here. Output:
    * (doc_id, page_number, markdown, n_passes). */
  def visionPages(pages: Dataset[(Long, Int, Array[Byte])],
      enricher: Enricher): Dataset[(Long, Int, String, Int)] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val passes = graft.enrich.Prompts.visionPasses
    pages.map { case (docId, pageNo, image) =>
      val results = passes.map { case (name, prompt) =>
        name -> enricher.visionAnalyze(name, prompt, image)
      }
      (docId, pageNo, enricher.visionSynthesize(results, pageNo),
        results.length)
    }
  }
}
