package graft.text

/** Stage-3b chunk page-boundary correction (SURVEY W7–W11;
  * stage_03b_chunk_page_correction.py:413-749).
  *
  * Chapter-wide over (section_number, chunk_number)-ordered chunks:
  *  1-4. position map over the chunk concatenation → tag scan → each
  *       chunk's pages = min/max of overlapping page ranges (W7);
  *  5-7. sections where NO chunk got pages infer a span from neighbor
  *       sections' chunks (prev last end +1 .. next first start −1,
  *       clamped when inverted; section bounds as fallback) and
  *       distribute it proportionally across their chunks (W8+W9);
  *  8.   remaining chunks fill from in-section neighbors (W10);
  *  9.   overlap between consecutive chunks clamps current.end to
  *       next.start (W11 — note: to next.start, not next.start−1; the
  *       reference allows chunks to share a boundary page).
  * No-tags chapters fall back to section bounds for every chunk.
  */
object ChunkCorrection {

  final case class Chk(
      sectionNumber: Int,
      chunkNumber: Int,
      content: String,
      sectionStartPage: Option[Int],
      sectionEndPage: Option[Int],
      startPage: Option[Int] = None,
      endPage: Option[Int] = None,
      startRef: String = "",
      endRef: String = "")

  def correctChapter(input: Seq[Chk]): Seq[Chk] = {
    if (input.isEmpty) return input
    val chunks = input.sortBy(c => (c.sectionNumber, c.chunkNumber)).toArray

    // Steps 1-2: position map + tags
    var pos = 0
    val spans = chunks.map { c =>
      val s = pos; val e = pos + c.content.length - 1
      pos += c.content.length
      (s, e)
    }
    val fullContent = chunks.map(_.content).mkString("")
    val tags = PageTags.extractTags(fullContent)

    if (tags.isEmpty) {
      // fallback: section bounds
      return chunks.map { c =>
        (c.sectionStartPage, c.sectionEndPage) match {
          case (Some(s), Some(e)) => c.copy(startPage = Some(s), endPage = Some(e))
          case _ => c
        }
      }.toSeq
    }

    val (ranges, refs) = PageTags.buildPageRanges(tags, fullContent)
    if (ranges.isEmpty) return chunks.toSeq
    def ref(p: Int): String = refs.getOrElse(p, "")

    // Step 4: overlap assignment (W7)
    var i = 0
    while (i < chunks.length) {
      val (s, e) = spans(i)
      val pages = ranges.collect {
        case PageTags.PageRange(rs, re, p) if s <= re && e >= rs => p
      }
      if (pages.nonEmpty)
        chunks(i) = chunks(i).copy(
          startPage = Some(pages.min), endPage = Some(pages.max),
          startRef = ref(pages.min), endRef = ref(pages.max))
      i += 1
    }

    val sectionNums = chunks.map(_.sectionNumber).distinct.sorted
    def sectionIdx(sn: Int): Array[Int] =
      chunks.indices.filter(chunks(_).sectionNumber == sn).toArray

    // Steps 6-7: whole-section inference + proportional distribution (W8+W9)
    val needsInference = sectionNums.filter(sn =>
      sectionIdx(sn).forall(chunks(_).startPage.isEmpty)).toSet
    sectionNums.zipWithIndex.foreach { case (sn, si) =>
      if (needsInference(sn)) {
        val idxs = sectionIdx(sn)
        val first = chunks(idxs.head)
        val prevLast: Option[Int] =
          if (si > 0 && !needsInference(sectionNums(si - 1)))
            chunks(sectionIdx(sectionNums(si - 1)).last).endPage
          else None
        val nextFirst: Option[Int] =
          if (si < sectionNums.length - 1 && !needsInference(sectionNums(si + 1)))
            chunks(sectionIdx(sectionNums(si + 1)).head).startPage
          else None
        val bounds: Option[(Int, Int)] = (prevLast, nextFirst) match {
          case (Some(p), Some(n)) =>
            val (s, e) = (p + 1, n - 1)
            Some(if (e < s) (p, p) else (s, e))
          case (Some(p), None) =>
            Some((p + 1, first.sectionEndPage.getOrElse(p + 1)))
          case (None, Some(n)) =>
            Some((first.sectionStartPage.getOrElse(n - 1), n - 1))
          case (None, None) =>
            for (s <- first.sectionStartPage; e <- first.sectionEndPage) yield (s, e)
        }
        bounds.foreach { case (lo, hi) =>
          val total = idxs.length
          val avail = hi - lo + 1
          idxs.zipWithIndex.foreach { case (ci, j) =>
            val (cs, ce) =
              if (avail == 1 || total == 1) (lo, hi)
              else {
                val s = lo + (j * avail) / total
                val e = math.min(lo + ((j + 1) * avail) / total - 1, hi)
                (s, e)
              }
            chunks(ci) = chunks(ci).copy(
              startPage = Some(cs), endPage = Some(ce),
              startRef = ref(cs), endRef = ref(ce))
          }
        }
      }
    }

    // Step 8: in-section neighbor fill (W10)
    sectionNums.foreach { sn =>
      val idxs = sectionIdx(sn)
      idxs.zipWithIndex.foreach { case (ci, j) =>
        if (chunks(ci).startPage.isEmpty) {
          var filled: Option[(Int, Int)] = None
          if (j > 0) {
            chunks(idxs(j - 1)).endPage.foreach { prevEnd =>
              if (j < idxs.length - 1 && chunks(idxs(j + 1)).startPage.isDefined)
                filled = Some((prevEnd, chunks(idxs(j + 1)).startPage.get))
              else if (j == idxs.length - 1)
                filled = Some((prevEnd, chunks(ci).sectionEndPage.getOrElse(prevEnd)))
            }
          }
          if (filled.isEmpty && j == 0)
            chunks(ci).sectionStartPage.foreach { ss =>
              val end =
                if (j < idxs.length - 1)
                  chunks(idxs(j + 1)).startPage.getOrElse(ss)
                else chunks(ci).sectionEndPage.getOrElse(ss)
              filled = Some((ss, end))
            }
          filled.foreach { case (s, e) =>
            chunks(ci) = chunks(ci).copy(
              startPage = Some(s), endPage = Some(e),
              startRef = ref(s), endRef = ref(e))
          }
        }
      }
    }

    // Step 9: continuity clamp (W11: end = next.start, shared page allowed)
    sectionNums.foreach { sn =>
      val idxs = sectionIdx(sn)
      var j = 0
      while (j < idxs.length - 1) {
        (chunks(idxs(j)).endPage, chunks(idxs(j + 1)).startPage) match {
          case (Some(ce), Some(ns)) if ns < ce =>
            chunks(idxs(j)) = chunks(idxs(j)).copy(
              endPage = Some(ns), endRef = ref(ns))
          case _ => ()
        }
        j += 1
      }
    }

    chunks.toSeq
  }
}
