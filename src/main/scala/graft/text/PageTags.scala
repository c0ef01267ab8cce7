package graft.text

import scala.util.matching.Regex

/** Embedded page-tag machinery (SURVEY T11–T13, G6, W4).
  *
  * The semantic pipeline carries page provenance through text stages by
  * embedding HTML-comment tags per page:
  *   `<!-- PageHeader PageNumber="N" PageReference="R" -->`
  * This object reimplements, bit-for-bit, the reference's tag functions:
  *  - strip (stage_02_section_processing.py:531-543)
  *  - embed (stage_02_section_processing.py:546-604)
  *  - metadata extraction (stage_02_section_processing.py:607-631)
  *  - positional extraction (stage_02b_section_page_correction.py:260-300)
  *  - page-range automaton (stage_02b_section_page_correction.py:303-396)
  */
object PageTags {

  /** One parsed tag: character position, "header"|"footer", page, ref. */
  final case class Tag(position: Int, tagType: String, pageNumber: Int, pageReference: String)

  /** One resolved page span: [start, end] char positions (inclusive). */
  final case class PageRange(start: Int, end: Int, pageNumber: Int)

  private val cleanHeader = new Regex("(?i)<!--\\s*PageHeader[^>]*?-->")
  private val cleanFooter = new Regex("(?i)<!--\\s*PageFooter[^>]*?-->")
  private val cleanNumber = new Regex("<!--\\s*Page[Nn]umber[^>]*?-->")
  private val cleanBreak = new Regex("<!--\\s*PageBreak[^>]*?-->")

  /** T11: strip any existing page tags and collapse blank runs. */
  def clean(content: String): String = {
    if (content == null || content.isEmpty) return ""
    var c = cleanHeader.replaceAllIn(content, "")
    c = cleanFooter.replaceAllIn(c, "")
    c = cleanNumber.replaceAllIn(c, "")
    c = cleanBreak.replaceAllIn(c, "")
    c = c.replaceAll("\n\n\n+", "\n\n")
    c.trim
  }

  /** html.escape(s, quote=True) equivalent. */
  def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&#x27;")

  /** G6: page content joined with header/footer tags per page. Pages must
    * already be in order; empty page numbers are skipped. */
  def embed(pages: Seq[(Option[Int], String, String)]): String = {
    // (page_number, page_reference, content)
    val sb = new StringBuilder
    pages.foreach { case (pageNum, pageRef, content) =>
      pageNum.foreach { n =>
        val ref = htmlEscape(Option(pageRef).getOrElse(""))
        val cleaned = clean(Option(content).getOrElse(""))
        sb.append(s"""<!-- PageHeader PageNumber="$n" PageReference="$ref" -->\n""")
        sb.append(cleaned)
        if (cleaned.nonEmpty && !cleaned.endsWith("\n")) sb.append("\n")
        sb.append(s"""<!-- PageFooter PageNumber="$n" PageReference="$ref" -->\n""")
      }
    }
    sb.toString
  }

  private val metaPattern =
    new Regex("""<!-- Page(?:Header|Footer) PageNumber="(\d+)" PageReference="([^"]*)" -->""")

  /** Page metadata of a content span: (startPage, endPage, uniquePageCount).
    * (stage_02_section_processing.py:607-631 — analyzes, never modifies.) */
  def extractMetadata(content: String): (Option[Int], Option[Int], Int) = {
    val pages = metaPattern.findAllMatchIn(content).map(_.group(1).toInt).toSeq
    if (pages.isEmpty) (None, None, 0)
    else {
      val uniq = pages.distinct.sorted
      (Some(uniq.min), Some(uniq.max), uniq.size)
    }
  }

  /** max(1, end-start+1); 0 when either bound is missing. */
  def pageCount(start: Option[Int], end: Option[Int]): Int = (start, end) match {
    case (Some(s), Some(e)) => math.max(1, e - s + 1)
    case _ => 0
  }

  private val headerPos =
    new Regex("""(?i)<!-- PageHeader PageNumber="(\d+)" PageReference="([^"]*)" -->""")
  private val footerPos =
    new Regex("""(?i)<!-- PageFooter PageNumber="(\d+)" PageReference="([^"]*)" -->""")

  /** T12: all tags with char positions, sorted by position. */
  def extractTags(content: String): Seq[Tag] = {
    if (content == null || content.isEmpty) return Nil
    val hs = headerPos.findAllMatchIn(content).map(m =>
      Tag(m.start, "header", m.group(1).toInt, m.group(2)))
    val fs = footerPos.findAllMatchIn(content).map(m =>
      Tag(m.start, "footer", m.group(1).toInt, m.group(2)))
    (hs ++ fs).toSeq.sortBy(_.position)
  }

  /** W4: the header/footer scan automaton — open a span on header, close on
    * footer; footer-without-header back-fills from the previous range end;
    * an unterminated header runs to end-of-content. Returns the ranges and
    * the page→reference map (header refs win). */
  def buildPageRanges(tags: Seq[Tag], content: String): (Seq[PageRange], Map[Int, String]) = {
    if (tags.isEmpty) return (Nil, Map.empty)
    val ranges = scala.collection.mutable.ArrayBuffer[PageRange]()
    var references = Map[Int, String]()
    var currentPage: Option[Int] = None
    var pageStart = 0

    def footerEnd(pos: Int): Int = {
      val idx = content.indexOf("-->", pos)
      if (idx != -1) idx + 2
      else {
        val window = content.substring(pos, math.min(pos + 200, content.length))
        "<!-- PageFooter[^>]*?-->".r.findFirstMatchIn(window) match {
          case Some(m) => pos + m.end - 1
          case None => pos + 54
        }
      }
    }

    tags.zipWithIndex.foreach { case (Tag(pos, tagType, pageNum, pageRef), _) =>
      if (!references.contains(pageNum) || tagType == "header")
        references += pageNum -> pageRef

      if (tagType == "header") {
        currentPage match {
          case Some(cp) if cp != pageNum =>
            ranges += PageRange(pageStart, pos - 1, cp)
            currentPage = Some(pageNum); pageStart = pos
          case None =>
            currentPage = Some(pageNum); pageStart = pos
          case _ => () // duplicate header for same page — ignore
        }
      } else { // footer
        currentPage match {
          case Some(cp) if cp == pageNum =>
            ranges += PageRange(pageStart, footerEnd(pos), cp)
            currentPage = None
          case None =>
            val start = if (ranges.nonEmpty) ranges.last.end + 1 else 0
            ranges += PageRange(start, footerEnd(pos), pageNum)
          case _ => () // footer for a different page than the open one — dropped
        }
      }
    }
    currentPage.foreach(cp => ranges += PageRange(pageStart, content.length - 1, cp))
    (ranges.sortBy(_.start).toSeq, references)
  }
}
