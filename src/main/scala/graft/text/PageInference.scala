package graft.text

import scala.util.matching.Regex

/** W1–W3: multi-pass page-boundary inference
  * (stage_02_section_processing.py:646-875). Runs after hierarchical split
  * (stage_02:1103-1106) and again post-merge.
  *
  * Passes, in order (later passes see earlier passes' fills):
  *  1. position-based: a section with no pages takes the page of the last
  *     tag marker before its position in the full content (first
  *     occurrence via indexOf — the reference uses str.find);
  *  2. neighbor scan: nearest previous end / next start; sandwiched-equal
  *     → that page; adjacent (+1) → prev page; gap → [prev, next−1];
  *     one-sided → that single page;
  *  3. sandwich pass for interior sections (prev_end == next_start, or
  *     exactly-one-page gap → conservatively the earlier page);
  *  4. first section ← next known start; last section ← previous known
  *     end; then a final immediate-neighbor sandwich fallback.
  */
object PageInference {

  private val marker: Regex =
    new Regex("""<!-- Page(?:Header|Footer) PageNumber="(\d+)" PageReference="([^"]*)" -->""")

  def inferPageBoundaries(input: Seq[Sections.Section],
      fullContent: String): Seq[Sections.Section] = {
    val sections = input.toArray
    def fill(i: Int, s: Int, e: Int): Unit =
      sections(i) = sections(i).copy(startPage = Some(s), endPage = Some(e),
        pageCount = PageTags.pageCount(Some(s), Some(e)))

    // Pass 1: position-based
    val positions = marker.findAllMatchIn(fullContent)
      .map(m => (m.start, m.group(1).toInt)).toArray
    if (positions.nonEmpty) {
      var i = 0
      while (i < sections.length) {
        if (sections(i).startPage.isEmpty) {
          val sectionStart = fullContent.indexOf(sections(i).content)
          if (sectionStart != -1) {
            var currentPage: Option[Int] = None
            var k = 0
            var stop = false
            while (k < positions.length && !stop) {
              if (positions(k)._1 < sectionStart) currentPage = Some(positions(k)._2)
              else stop = true
              k += 1
            }
            currentPage.foreach(p => fill(i, p, p))
          }
        }
        i += 1
      }
    }

    // Pass 2: neighbor scan (in order — later sections see earlier fills)
    var i = 0
    while (i < sections.length) {
      if (sections(i).startPage.isEmpty) {
        val prevPage = (i - 1 to 0 by -1).iterator
          .flatMap(j => sections(j).endPage).nextOption()
        val nextPage = (i + 1 until sections.length).iterator
          .flatMap(j => sections(j).startPage).nextOption()
        (prevPage, nextPage) match {
          case (Some(p), Some(n)) =>
            if (p == n) fill(i, p, p)
            else if (n - p == 1) fill(i, p, p)
            else fill(i, p, n - 1)
          case (Some(p), None) => fill(i, p, p)
          case (None, Some(n)) => fill(i, n, n)
          case _ => ()
        }
      }
      i += 1
    }

    // Pass 3: interior sandwich
    i = 1
    while (i < sections.length - 1) {
      if (sections(i).startPage.isEmpty) {
        (sections(i - 1).endPage, sections(i + 1).startPage) match {
          case (Some(pe), Some(ns)) if pe == ns => fill(i, pe, pe)
          case (Some(pe), Some(ns)) if pe + 1 == ns => fill(i, pe, pe)
          case _ => ()
        }
      }
      i += 1
    }

    // Pass 4: first/last specials
    if (sections.nonEmpty) {
      if (sections.head.startPage.isEmpty)
        sections.iterator.drop(1).flatMap(_.startPage).nextOption()
          .foreach(p => fill(0, p, p))
      val lastIdx = sections.length - 1
      if (sections(lastIdx).startPage.isEmpty)
        sections.view.slice(0, lastIdx).reverseIterator
          .flatMap(_.endPage).nextOption()
          .foreach(p => fill(lastIdx, p, p))
    }

    // Final fallback: immediate-neighbor sandwich (sets page count to 1)
    i = 0
    while (i < sections.length) {
      if (sections(i).startPage.isEmpty && i > 0 && i < sections.length - 1) {
        (sections(i - 1).endPage, sections(i + 1).startPage) match {
          case (Some(pe), Some(ns)) if pe == ns =>
            sections(i) = sections(i).copy(startPage = Some(pe),
              endPage = Some(pe), pageCount = 1)
          case _ => ()
        }
      }
      i += 1
    }
    sections.toSeq
  }
}
