package graft.model

/** Record kinds of the document pipeline (SURVEY §1.1; field contracts from
  * the reference's stage I/O, FIXTURES.md §B). Case classes give Dataset[T]
  * encoders for the order-sensitive group algebra; relational stages use
  * the same shapes as DataFrames.
  */

/** B1: one page of OCR'd markdown, chapter-assigned.
  * (ey prep stage_00_pdf_to_markdown.py:478-485 + chapter_splitter fields.) */
final case class PageRecord(
    document_id: String,
    filename: String,
    filepath: String,
    source_filename: String,
    chapter_number: Option[Int],
    chapter_name: String,
    page_number: Int,
    page_reference: String,
    source_page_number: Int,
    content: String)

/** B3: one identified section of a chapter.
  * (stage_02_section_processing.py:1784-1805.) */
final case class SectionRecord(
    document_id: String,
    filename: String,
    filepath: String,
    source_filename: String,
    chapter_number: Int,
    chapter_name: String,
    chapter_summary: String,
    chapter_page_count: Int,
    section_number: Int,
    section_title: String,
    section_level: Int,
    splitting_level: Int,
    section_hierarchy: String,
    section_summary: String,
    section_start_page: Option[Int],
    section_end_page: Option[Int],
    section_page_count: Int,
    section_start_reference: String,
    section_end_reference: String,
    section_token_count: Int,
    section_content: String)

/** B4: one chunk of a section. (stage_03_content_chunking.py:531-561.) */
final case class ChunkRecord(
    document_id: String,
    filename: String,
    filepath: String,
    source_filename: String,
    chapter_number: Int,
    chapter_name: String,
    chapter_summary: String,
    chapter_page_count: Int,
    section_number: Int,
    section_summary: String,
    section_start_page: Option[Int],
    section_end_page: Option[Int],
    section_page_count: Int,
    chunk_number: Int,
    chunk_start_page: Option[Int],
    chunk_end_page: Option[Int],
    chunk_start_reference: String,
    chunk_end_reference: String,
    chunk_token_count: Int,
    chunk_content: String)

/** B2: page + chapter-level enrichment (stage_01_chapter_processing.py:909-923). */
final case class EnrichedPageRecord(
    document_id: String,
    filename: String,
    filepath: String,
    source_filename: String,
    chapter_number: Int,
    chapter_name: String,
    chapter_summary: String,
    chapter_page_count: Int,
    page_number: Int,
    page_reference: String,
    source_page_number: Int,
    content: String)

/** B4 final: chunk + embedding (stage_04_embedding_generation.py:589-594). */
final case class EmbeddedChunkRecord(
    document_id: String,
    chapter_number: Int,
    section_number: Int,
    chunk_number: Int,
    chunk_content: String,
    embedding: Option[Array[Float]])
