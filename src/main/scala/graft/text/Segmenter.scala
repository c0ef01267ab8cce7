package graft.text

/** Fixed-budget text segmentation for LLM context windows (SURVEY T3/T4).
  *
  * Both variants ceil-divide the estimated tokens by the available budget
  * and slice proportionally by characters; the chapter variant (T3,
  * stage_01_chapter_processing.py:686-771) cuts at raw char offsets, the
  * section variant (T4, stage_02_section_processing.py:1416-1451) pulls
  * each cut back to the last sentence end (". ") or newline in range.
  * Blank segments are dropped in both.
  */
object Segmenter {

  val GptInputTokenLimit = 80000
  val TokenBuffer = 2000

  /** Shared budget rule: at least 1000 tokens of room. */
  def availableTokens(limit: Int = GptInputTokenLimit, buffer: Int = TokenBuffer): Int =
    math.max(1000, limit - buffer)

  /** T3: chapter segmentation at plain char offsets. */
  def segmentChapter(text: String,
      limit: Int = GptInputTokenLimit, buffer: Int = TokenBuffer): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val totalTokens = Tokens.estimateA(text)
    if (totalTokens == 0) return Nil
    val available = availableTokens(limit, buffer)
    if (totalTokens <= available) return Seq(text)

    val numSegments = math.max(1, (totalTokens + available - 1) / available)
    val targetTokens = math.max(1, totalTokens / numSegments)
    val charsPerToken = text.length.toDouble / totalTokens
    val segmentLen = (targetTokens * charsPerToken).toInt

    slice(text, numSegments, segmentLen, sentenceAware = false)
  }

  /** T4: section segmentation with sentence-boundary pullback. */
  def segmentSection(text: String,
      limit: Int = GptInputTokenLimit, buffer: Int = TokenBuffer): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val totalTokens = Tokens.estimateA(text)
    val available = availableTokens(limit, buffer)
    if (totalTokens <= available) return Seq(text)

    val numSegments = math.max(1, (totalTokens + available - 1) / available)
    val charsPerToken = text.length.toDouble / totalTokens
    val segmentLen = (available * charsPerToken).toInt

    slice(text, numSegments, segmentLen, sentenceAware = true)
  }

  private def slice(text: String, numSegments: Int, segmentLen: Int,
      sentenceAware: Boolean): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i < numSegments && start < text.length) {
      val segment =
        if (i == numSegments - 1) text.substring(start)
        else {
          var end = math.min(start + segmentLen, text.length)
          if (sentenceAware) {
            // rfind(". ", start, end): match must lie fully inside [start,end)
            val lastPeriod =
              if (end - 2 < start) -1
              else { val p = text.lastIndexOf(". ", end - 2); if (p >= start) p else -1 }
            val lastNewline =
              if (end - 1 < start) -1
              else { val p = text.lastIndexOf("\n", end - 1); if (p >= start) p else -1 }
            val breakPoint = math.max(lastPeriod, lastNewline)
            if (breakPoint > start) end = breakPoint + 1
          }
          val s = text.substring(start, end)
          start = end
          s
        }
      if (segment.nonEmpty && segment.trim.nonEmpty) out += segment
      i += 1
    }
    out.toSeq
  }
}
