package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{ChunkRecord, PageRecord, SectionRecord}
import graft.text.{Chunker, PageTags, Sections}

/** The semantic document pipeline as Dataset transforms (SURVEY §3.1).
  *
  * Parallelism contract: all order-sensitive text algebra (T5–T8, W12) is
  * pure Scala over one chapter's rows, invoked from
  * `groupByKey(chapter).flatMapGroups` — sequential within a chapter,
  * embarrassingly parallel across chapters. Chapters are bounded (≤ a few
  * hundred pages), so materializing one group in memory is safe at any
  * corpus scale; the only shuffle is the groupBy on the chapter key.
  * Chunking (T8) is per-section pure → a flatMap, zero extra shuffles.
  */
object DocPipeline {

  /** One chapter's pages (page-sorted) → its SectionRecords. */
  private def chapterSections(docId: String, chapterNum: Int,
      chapterPages: Seq[PageRecord]): Seq[SectionRecord] = {
    val first = chapterPages.head
    val tagged = chapterPages.map(p =>
      (Some(p.page_number): Option[Int], p.page_reference, p.content))
    val sections = Sections.mergeSmall(
      Sections.hierarchicalSplit(tagged, first.chapter_name))
    sections.zipWithIndex.map { case (s, idx) =>
      SectionRecord(
        document_id = docId,
        filename = first.filename,
        filepath = first.filepath,
        source_filename = first.source_filename,
        chapter_number = chapterNum,
        chapter_name = first.chapter_name,
        chapter_summary = "",
        chapter_page_count = chapterPages.length,
        section_number = s.sectionNumber,
        section_title = s.title,
        section_level = s.level,
        splitting_level = s.splittingLevel,
        section_hierarchy = Sections.hierarchyString(sections, idx),
        section_summary = "",
        section_start_page = s.startPage,
        section_end_page = s.endPage,
        section_page_count = s.pageCount,
        section_start_reference = "",
        section_end_reference = "",
        section_token_count = s.tokenCount,
        section_content = s.content)
    }
  }

  /** Stage-02 core: pages → sections (tag embed, hierarchical split,
    * small-section merge, breadcrumbs). Null-chapter pages are dropped
    * (P2: routed to an unassigned path by callers that need them). */
  def pagesToSections(pages: Dataset[PageRecord]): Dataset[SectionRecord] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .filter((p: PageRecord) => p.chapter_number.isDefined)
      .groupByKey(p => (p.document_id, p.chapter_number.get))
      .flatMapGroups { (key: (String, Int), it: Iterator[PageRecord]) =>
        chapterSections(key._1, key._2, it.toSeq.sortBy(_.page_number))
      }
  }

  /** Ordered variant of pages→sections: the chapter shuffle is a RANGE
    * partition of the (small) page rows with an in-partition sort, and the
    * chapter algebra runs over consecutive groups — so the output arrives
    * globally ordered by (document_id, chapter_number, section_number)
    * with NO post-compute sort.
    *
    * Why it matters at scale: a global `orderBy` placed AFTER the text
    * algebra re-executes the whole computation for range-boundary
    * sampling and then shuffles the computed (large) section rows; this
    * path sorts the cheap input rows once and computes exactly once.
    * Equal keys land in one range partition, so consecutive grouping is
    * key-complete (OrderedPipelineSpec pins row AND order equality with
    * `pagesToSections(...).orderBy(...)`). */
  def pagesToSectionsOrdered(pages: Dataset[PageRecord]): Dataset[SectionRecord] = {
    val spark = pages.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    pages
      .filter((p: PageRecord) => p.chapter_number.isDefined)
      .repartitionByRange(col("document_id"), col("chapter_number"))
      .sortWithinPartitions(
        col("document_id"), col("chapter_number"), col("page_number"))
      .mapPartitions { it =>
        groupConsecutive(it)(p => (p.document_id, p.chapter_number.get))
          .flatMap { case ((docId, ch), chapterPages) =>
            chapterSections(docId, ch, chapterPages)
          }
      }
  }

  /** Group a sorted iterator's consecutive equal-key runs (streaming — one
    * group buffered at a time; chapters are bounded). */
  private[ops] def groupConsecutive[T, K](it: Iterator[T])(key: T => K): Iterator[(K, Seq[T])] =
    new Iterator[(K, Seq[T])] {
      private val in = it.buffered
      override def hasNext: Boolean = in.hasNext
      override def next(): (K, Seq[T]) = {
        val k = key(in.head)
        val buf = scala.collection.mutable.ArrayBuffer[T]()
        while (in.hasNext && key(in.head) == k) buf += in.next()
        (k, buf.toSeq)
      }
    }

  /** Stage-02b (W5/W6+J13): chapter-wide page-boundary correction via the
    * position-map/tag-scan algorithm (text.PageCorrection). One
    * flatMapGroups on the chapter key; sequential within a chapter by
    * construction of the position map. */
  def correctSectionPages(sections: Dataset[SectionRecord]): Dataset[SectionRecord] = {
    val spark = sections.sparkSession
    import spark.implicits._
    import graft.text.PageCorrection
    sections
      .groupByKey(s => (s.document_id, s.chapter_number))
      .flatMapGroups { (_: (String, Int), it: Iterator[SectionRecord]) =>
        val ordered = it.toSeq.sortBy(_.section_number)
        val corrected = PageCorrection.correctChapter(ordered.map(s =>
          PageCorrection.Sec(s.section_number, s.section_content,
            s.section_start_page, s.section_end_page,
            s.section_start_reference, s.section_end_reference)))
        val byNum = corrected.map(c => c.sectionNumber -> c).toMap
        ordered.map { s =>
          val c = byNum(s.section_number)
          s.copy(
            section_start_page = c.startPage,
            section_end_page = c.endPage,
            section_page_count = PageTags.pageCount(c.startPage, c.endPage),
            section_start_reference = c.startRef,
            section_end_reference = c.endRef)
        }
      }
  }

  /** Stage-03 core: sections → chunks (T8). Pure per-row explode. */
  def sectionsToChunks(sections: Dataset[SectionRecord],
      cfg: Chunker.Config = Chunker.Config()): Dataset[ChunkRecord] = {
    val spark = sections.sparkSession
    import spark.implicits._
    sections.flatMap { s =>
      Chunker.chunkWithTokens(s.section_content, cfg).zipWithIndex.map { case ((c, tok), i) =>
        ChunkRecord(
          document_id = s.document_id,
          filename = s.filename,
          filepath = s.filepath,
          source_filename = s.source_filename,
          chapter_number = s.chapter_number,
          chapter_name = s.chapter_name,
          chapter_summary = s.chapter_summary,
          chapter_page_count = s.chapter_page_count,
          section_number = s.section_number,
          section_summary = s.section_summary,
          section_start_page = s.section_start_page,
          section_end_page = s.section_end_page,
          section_page_count = s.section_page_count,
          chunk_number = i + 1,
          chunk_start_page = None,
          chunk_end_page = None,
          chunk_start_reference = "",
          chunk_end_reference = "",
          chunk_token_count = tok,
          chunk_content = c)
      }
    }
  }

  /** Stage-03b (W7–W11): chapter-wide chunk page-boundary correction.
    * One flatMapGroups on the chapter key, same shape as stage-02b. */
  def correctChunkPages(chunks: Dataset[ChunkRecord]): Dataset[ChunkRecord] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    import graft.text.ChunkCorrection
    chunks
      .groupByKey(c => (c.document_id, c.chapter_number))
      .flatMapGroups { (_: (String, Int), it: Iterator[ChunkRecord]) =>
        val ordered = it.toSeq.sortBy(c => (c.section_number, c.chunk_number))
        val corrected = ChunkCorrection.correctChapter(ordered.map(c =>
          ChunkCorrection.Chk(c.section_number, c.chunk_number, c.chunk_content,
            c.section_start_page, c.section_end_page,
            c.chunk_start_page, c.chunk_end_page,
            c.chunk_start_reference, c.chunk_end_reference)))
        val byKey = corrected.map(k => (k.sectionNumber, k.chunkNumber) -> k).toMap
        ordered.map { c =>
          val k = byKey((c.section_number, c.chunk_number))
          c.copy(
            chunk_start_page = k.startPage,
            chunk_end_page = k.endPage,
            chunk_start_reference = k.startRef,
            chunk_end_reference = k.endRef)
        }
      }
  }

  /** Stage-04 tag strip (T11): chunk content cleaned for embedding. */
  def stripTags(chunks: Dataset[ChunkRecord]): Dataset[ChunkRecord] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.map(c => c.copy(chunk_content = PageTags.clean(c.chunk_content)))
  }
}
