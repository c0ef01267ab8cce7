package graft.text

import scala.util.matching.Regex

/** Hierarchical section identification (SURVEY T5/T6/T7, W12).
  *
  * Semantics reimplemented from `semantic search/stage_02_section_processing.py`:
  *  - heading-level split with page-tag boundary pullback (T5, :909-1011)
  *  - recursive deepening while a section spans >3 pages (T6, :1014-1072)
  *  - small-section merge, prev-first with level guards (T7, :1145-1272)
  *  - breadcrumb hierarchy strings (W12, :1118-1142)
  */
object Sections {

  final case class Section(
      title: String,
      level: Int,
      content: String,
      tokenCount: Int,
      parentTitle: String,
      startPage: Option[Int],
      endPage: Option[Int],
      pageCount: Int,
      splittingLevel: Int = 0,
      sectionNumber: Int = 0)

  val MinSectionTokens = 250
  val MaxSectionTokens = 750
  val PageThreshold = 3
  val MaxHeadingLevel = 6

  private val boundaryTag =
    new Regex("""<!-- Page(?:Header|Footer) PageNumber="\d+" PageReference="[^"]*" -->""")

  /** T5: split content at heading level `level` (`^#{level} title`).
    * A heading's span is pulled back over an immediately-preceding page tag
    * (≤200-char lookback, whitespace-only between tag and heading); intro
    * text before the first heading becomes its own section pinned to
    * start page 1. */
  // one compiled pattern per heading level — this runs per chapter per
  // recursion level, and per-call Regex compilation was the hot spot in
  // the sectioning stage
  private val headingPatterns: Array[Regex] =
    Array.tabulate(8)(l =>
      new Regex(s"(?m)^(#{${math.max(l, 1)}})\\s+(.+)$$"))

  def splitByHeadingLevel(content: String, level: Int, parentTitle: String = ""): Seq[Section] = {
    val pattern =
      if (level >= 1 && level < headingPatterns.length) headingPatterns(level)
      else new Regex(s"(?m)^(#{$level})\\s+(.+)$$")
    val matches = pattern.findAllMatchIn(content).toSeq

    def meta(c: String): (Option[Int], Option[Int], Int) = PageTags.extractMetadata(c)

    if (matches.isEmpty) {
      val (s, e, n) = meta(content)
      return Seq(Section(
        title = if (parentTitle.nonEmpty) parentTitle else "Content",
        level = level, content = content, tokenCount = Tokens.estimateA(content),
        parentTitle = parentTitle, startPage = s, endPage = e, pageCount = n))
    }

    // Pull each heading's start back over an immediately-preceding page tag.
    val adjusted = matches.map { m =>
      val startPos = m.start
      val searchStart = math.max(0, startPos - 200)
      val preceding = content.substring(searchStart, startPos)
      val tagsBefore = boundaryTag.findAllMatchIn(preceding).toSeq
      val adjustedStart = tagsBefore.lastOption match {
        case Some(last) if preceding.substring(last.end).trim.isEmpty =>
          searchStart + last.start
        case _ => startPos
      }
      (adjustedStart, m)
    }

    val out = scala.collection.mutable.ArrayBuffer[Section]()

    // Intro before the first heading (original position — tags stay with it).
    val firstHeadingPos = matches.head.start
    if (firstHeadingPos > 0) {
      val intro = content.substring(0, firstHeadingPos).trim
      if (intro.nonEmpty) {
        val (_, e, _) = meta(intro)
        out += Section(
          title = if (parentTitle.nonEmpty) parentTitle else "Introduction",
          level = level, content = intro, tokenCount = Tokens.estimateA(intro),
          parentTitle = parentTitle,
          startPage = Some(1), endPage = e,
          pageCount = PageTags.pageCount(Some(1), e))
      }
    }

    adjusted.zipWithIndex.foreach { case ((startPos, m), i) =>
      val endPos = if (i < adjusted.length - 1) adjusted(i + 1)._1 else content.length
      val sectionContent = content.substring(startPos, endPos).trim
      val (s, e, n) = meta(sectionContent)
      out += Section(
        title = m.group(2).trim, level = level, content = sectionContent,
        tokenCount = Tokens.estimateA(sectionContent), parentTitle = parentTitle,
        startPage = s, endPage = e, pageCount = n)
    }
    out.toSeq
  }

  /** T6: recursively split while the section spans > pageThreshold pages,
    * deepening one heading level at a time up to H6; children missing page
    * info inherit the parent's. */
  def recursiveSplit(section: Section, currentLevel: Int,
      maxLevel: Int = MaxHeadingLevel, pageThreshold: Int = PageThreshold): Seq[Section] = {
    (section.startPage, section.endPage) match {
      case (Some(s), Some(e)) =>
        val span = e - s + 1
        if (span <= pageThreshold || currentLevel >= maxLevel)
          return Seq(section.copy(splittingLevel = currentLevel))
        val nextLevel = currentLevel + 1
        val subs = splitByHeadingLevel(section.content, nextLevel, section.title)
        if (subs.lengthCompare(1) <= 0)
          return Seq(section.copy(splittingLevel = currentLevel))
        subs.flatMap { sub =>
          val inherited =
            if (sub.startPage.isEmpty)
              sub.copy(startPage = section.startPage, endPage = section.endPage,
                pageCount = PageTags.pageCount(section.startPage, section.endPage))
            else sub
          recursiveSplit(inherited, nextLevel, maxLevel, pageThreshold)
        }
      case _ => Seq(section.copy(splittingLevel = currentLevel))
    }
  }

  /** T5+T6+W1–W3 entry: embed tags, split at H1, deepen, number from 1,
    * infer missing page boundaries from the full content
    * (stage_02_section_processing.py:1076-1107). */
  def hierarchicalSplit(pages: Seq[(Option[Int], String, String)],
      chapterName: String): Seq[Section] = {
    val full = PageTags.embed(pages)
    val initial = splitByHeadingLevel(full, level = 1, parentTitle = chapterName)
    val split = initial.flatMap(s => recursiveSplit(s, currentLevel = 1))
    val numbered = split.zipWithIndex.map { case (s, i) => s.copy(sectionNumber = i + 1) }
    PageInference.inferPageBoundaries(numbered, full)
  }

  /** T7: merge sections under MinSectionTokens into the previous section
    * when levels allow (current ≥ prev) and the sum stays ≤ MaxSectionTokens,
    * else into the next (mirror rule); page bounds become min/max; sections
    * renumbered densely from 1. Prev-merge is checked before next-merge —
    * the reference's asymmetry is semantic. */
  def mergeSmall(sections: Seq[Section],
      minTokens: Int = MinSectionTokens, maxTokens: Int = MaxSectionTokens): Seq[Section] = {
    if (sections.isEmpty) return sections
    val merged = scala.collection.mutable.ArrayBuffer[Section]()
    val consumed = scala.collection.mutable.Set[Int]()

    def mergePages(aStart: Option[Int], aEnd: Option[Int],
        bStart: Option[Int], bEnd: Option[Int]): (Option[Int], Option[Int]) = {
      val s = (aStart, bStart) match {
        case (Some(x), Some(y)) => Some(math.min(x, y))
        case (None, Some(y)) => Some(y)
        case (x, _) => x
      }
      val e = (aEnd, bEnd) match {
        case (Some(x), Some(y)) => Some(math.max(x, y))
        case (None, Some(y)) => Some(y)
        case (x, _) => x
      }
      (s, e)
    }

    var i = 0
    while (i < sections.length) {
      if (consumed.contains(i)) { i += 1 }
      else {
        val current = sections(i)
        if (current.tokenCount < minTokens) {
          val mergedWithPrev = merged.lastOption match {
            case Some(prev)
                if current.level >= prev.level &&
                  prev.tokenCount + current.tokenCount <= maxTokens =>
              val (s, e) = mergePages(prev.startPage, prev.endPage,
                current.startPage, current.endPage)
              merged(merged.length - 1) = prev.copy(
                content = prev.content + "\n" + current.content,
                tokenCount = prev.tokenCount + current.tokenCount,
                startPage = s, endPage = e, pageCount = PageTags.pageCount(s, e))
              consumed += i
              true
            case _ => false
          }
          if (!mergedWithPrev) {
            if (i + 1 < sections.length && !consumed.contains(i + 1)) {
              val next = sections(i + 1)
              if (next.level >= current.level &&
                  current.tokenCount + next.tokenCount <= maxTokens) {
                val (s, e) = mergePages(current.startPage, current.endPage,
                  next.startPage, next.endPage)
                merged += current.copy(
                  content = current.content + "\n" + next.content,
                  tokenCount = current.tokenCount + next.tokenCount,
                  startPage = s, endPage = e, pageCount = PageTags.pageCount(s, e))
                consumed += (i + 1)
              } else merged += current
            } else merged += current
          }
        } else merged += current
        i += 1
      }
    }
    merged.zipWithIndex.map { case (s, idx) => s.copy(sectionNumber = idx + 1) }.toSeq
  }

  /** W12: breadcrumb string for section at `idx` — running map of the
    * latest title per heading level over all PRIOR sections, truncating
    * deeper levels whenever a shallower heading appears; join levels
    * 1..level-1 plus the section's own title with " > ". */
  def hierarchyString(all: Seq[Section], idx: Int): String = {
    val section = all(idx)
    var levelTitles = Map[Int, String]()
    (0 until idx).foreach { i =>
      val prev = all(i)
      levelTitles += prev.level -> prev.title
      levelTitles = levelTitles.filter { case (l, _) => l <= prev.level }
    }
    val parts = (1 until section.level).flatMap(levelTitles.get) :+ section.title
    parts.filter(_.nonEmpty).mkString(" > ")
  }
}
