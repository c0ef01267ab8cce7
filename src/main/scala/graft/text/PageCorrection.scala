package graft.text

/** Stage-2b section page-boundary correction (SURVEY W5/W6 + J13;
  * stage_02b_section_page_correction.py:399-725).
  *
  * Chapter-wide algorithm over ordered sections:
  *  1. position map: concatenate section contents, record each section's
  *     inclusive [start,end] char span;
  *  2. scan page tags (W4 automaton, PageTags.buildPageRanges);
  *  3. a section's pages = all page ranges its span overlaps → min/max
  *     become its bounds, with the page→reference map filling refs;
  *  4. first-section rule: a first section with no pages gets page 1;
  *  5. neighbor inference for still-missing sections: sandwiched → gap
  *     span / same page / prev end; last section → prev end + 1;
  *  6. continuity: an overlap clamps current.end to next.start − 1 (gaps
  *     are reported, not fixed);
  *  7. recount pages; ensure refs.
  */
object PageCorrection {

  /** Minimal section shape for correction. */
  final case class Sec(
      sectionNumber: Int,
      content: String,
      startPage: Option[Int],
      endPage: Option[Int],
      startRef: String = "",
      endRef: String = "")

  def correctChapter(input: Seq[Sec]): Seq[Sec] = {
    if (input.isEmpty) return input
    val sections = input.sortBy(_.sectionNumber).toArray

    // Step 1: position map over the concatenation (inclusive end)
    var pos = 0
    val spans = sections.map { s =>
      val start = pos
      val end = pos + s.content.length - 1
      pos += s.content.length
      (start, end)
    }
    val fullContent = sections.map(_.content).mkString("")

    // Step 2/3: tag scan → page ranges
    val tags = PageTags.extractTags(fullContent)
    if (tags.isEmpty) return sections.toSeq // fall back to existing bounds
    val (ranges, refs) = PageTags.buildPageRanges(tags, fullContent)
    if (ranges.isEmpty) return sections.toSeq

    def ref(p: Int): String = refs.getOrElse(p, "")
    // tracks whether a step explicitly keyed the start/end reference — the
    // reference's step 7 backfills only refs never set (dict-key presence)
    val hasStartRef = Array.fill(sections.length)(false)
    val hasEndRef = Array.fill(sections.length)(false)

    // Step 4: overlap assignment
    var i = 0
    while (i < sections.length) {
      val (s, e) = spans(i)
      val pages = ranges.collect {
        case PageTags.PageRange(rs, re, p) if s <= re && e >= rs => p
      }
      if (pages.nonEmpty) {
        val (lo, hi) = (pages.min, pages.max)
        sections(i) = sections(i).copy(
          startPage = Some(lo), endPage = Some(hi),
          startRef = ref(lo), endRef = ref(hi))
        hasStartRef(i) = true; hasEndRef(i) = true
      }
      i += 1
    }

    // First-section rule
    if (sections.head.startPage.isEmpty) {
      sections(0) = sections(0).copy(
        startPage = Some(1), endPage = Some(1),
        startRef = ref(1), endRef = ref(1))
      hasStartRef(0) = true; hasEndRef(0) = true
    }

    // Step 5: neighbor inference
    i = 0
    while (i < sections.length) {
      if (sections(i).startPage.isEmpty) {
        var inferred = false
        if (i > 0) {
          sections(i - 1).endPage.foreach { prevEnd =>
            // a NEXT section must exist for either inner branch; the last
            // section falls through to the prev_end + 1 rule below
            // (stage_02b:590-600 nesting)
            if (i + 1 < sections.length) {
              if (sections(i + 1).startPage.isDefined) {
                val nextStart = sections(i + 1).startPage.get
                val (lo, hi) =
                  if (prevEnd == nextStart) (prevEnd, prevEnd)          // sandwiched
                  else if (nextStart > prevEnd) (prevEnd + 1, nextStart - 1) // gap span
                  else (prevEnd, prevEnd)                               // overlap
                sections(i) = sections(i).copy(startPage = Some(lo), endPage = Some(hi))
                inferred = true
              } else {
                sections(i) = sections(i).copy(
                  startPage = Some(prevEnd), endPage = Some(prevEnd))
                inferred = true
              }
            }
          }
        }
        if (!inferred && i == sections.length - 1 && i > 0)
          sections(i - 1).endPage.foreach { prevEnd =>
            sections(i) = sections(i).copy(
              startPage = Some(prevEnd + 1), endPage = Some(prevEnd + 1))
            inferred = true
          }
        if (inferred) {
          sections(i) = sections(i).copy(
            startRef = ref(sections(i).startPage.get),
            endRef = ref(sections(i).endPage.get))
          hasStartRef(i) = true; hasEndRef(i) = true
        }
      }
      i += 1
    }

    // Step 6: continuity — clamp overlaps only (sets ONLY the end ref)
    i = 0
    while (i < sections.length - 1) {
      (sections(i).endPage, sections(i + 1).startPage) match {
        case (Some(currEnd), Some(nextStart))
            if nextStart < currEnd &&
              nextStart > sections(i).startPage.getOrElse(0) =>
          sections(i) = sections(i).copy(
            endPage = Some(nextStart - 1), endRef = ref(nextStart - 1))
          hasEndRef(i) = true
        case _ => ()
      }
      i += 1
    }

    // Step 7: backfill refs never explicitly set for sections with pages
    // (stage_02b:660-666); page counts derived by callers
    i = 0
    while (i < sections.length) {
      if (sections(i).startPage.isDefined && sections(i).endPage.isDefined) {
        if (!hasStartRef(i))
          sections(i) = sections(i).copy(startRef = ref(sections(i).startPage.get))
        if (!hasEndRef(i))
          sections(i) = sections(i).copy(endRef = ref(sections(i).endPage.get))
      }
      i += 1
    }
    sections.toSeq
  }
}
