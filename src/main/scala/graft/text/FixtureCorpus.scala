package graft.text

import graft.model.PageRecord

/** Deterministic synthetic corpus: turns each `documents` row into a
  * one-chapter mini-document of markdown pages (headings H1–H3, paragraphs,
  * lists) so the section splitter (T5/T6), merger (T7) and chunker (T8)
  * all trigger on driver-provided data — no randomness, every page a pure
  * function of (doc_id, text). FIXTURES.md §C describes the shape.
  */
object FixtureCorpus {

  /** Pages of the synthetic document built from one `documents` row. */
  def pages(docId: Long, text: String): Seq[PageRecord] = {
    val words = Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty)
    val safe = if (words.isEmpty) Array("empty") else words
    val nPages = 2 + (docId % 4).toInt // 2..5 pages
    // Every 7th doc gets fat pages so sections exceed chunker limits.
    val wordsPerPage = if (docId % 7 == 0) 700 else 60 + (docId % 5).toInt * 30

    def word(i: Long): String = safe(((i % safe.length) + safe.length).toInt % safe.length)

    (1 to nPages).map { p =>
      val sb = new StringBuilder
      val headingLevel = 1 + ((docId + p) % 3).toInt
      sb.append("#" * headingLevel).append(s" Part $p of doc $docId\n\n")
      var w = docId * 131 + p * 17
      val total = wordsPerPage
      var emitted = 0
      var sentenceLen = 0
      while (emitted < total) {
        sb.append(word(w))
        w += 1; emitted += 1; sentenceLen += 1
        if (sentenceLen >= 8) {
          sb.append(". ")
          // capitalized next word keeps the sentence-end break regex live
          sb.append(word(w).capitalize)
          w += 1; emitted += 1
          sentenceLen = 1
        } else sb.append(" ")
        if (emitted % 40 == 0) sb.append("\n\n")
      }
      sb.append(".\n")
      if (p % 2 == 0) {
        sb.append("\n")
        (1 to 3).foreach(k => sb.append(s"- ${word(w + k)} item $k\n"))
      }
      // (document_id, chapter_number) is unique per source doc: one
      // synthetic chapter per documents row, docId as the chapter number.
      PageRecord(
        document_id = s"DOC_${docId % 3}",
        filename = s"doc_$docId.pdf",
        filepath = s"/corpus/doc_$docId.pdf",
        source_filename = s"source_${docId % 3}.pdf",
        chapter_number = Some(docId.toInt),
        chapter_name = s"Chapter $docId",
        page_number = p,
        page_reference = s"$docId-$p",
        source_page_number = docId.toInt * 10 + p,
        content = sb.toString)
    }
  }
}
