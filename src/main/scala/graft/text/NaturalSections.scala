package graft.text

import java.util.regex.Pattern

/** T9/T10: per-page natural-boundary sectioning with min-section force
  * split (catalog search/stage3_generate_summaries.py:631-823).
  *
  * T9 groups blank-line-separated paragraphs into sections, starting a new
  * section at markdown headers, list starts, tables, or when a long
  * paragraph (>200 chars) lands on an already-large section (>300 chars).
  * T10 guarantees ≥ minSections by splitting (the largest section /
  * the single section) — evenly by sentences when there are enough,
  * else by character count with a ≤50-char backtrack to whitespace.
  */
object NaturalSections {

  private val paraSplit = Pattern.compile("\\n\\s*\\n")
  private val headerRe = "^#+\\s+".r
  private val listRe = "^(\\d+\\.|\\-|\\*|•)\\s+".r
  private val sentenceSplit = Pattern.compile("(?<=[.!?])\\s+")

  /** T9: natural paragraph/section boundaries; whole content when none. */
  def detectNaturalBoundaries(content: String): Seq[String] = {
    if (content == null || content.isEmpty) return Nil
    val paragraphs = paraSplit.split(content, -1).map(_.trim).filter(_.nonEmpty)
    val sections = scala.collection.mutable.ArrayBuffer[String]()
    var current = scala.collection.mutable.ArrayBuffer[String]()

    def flush(): Unit =
      if (current.nonEmpty) { sections += current.mkString("\n"); current.clear() }

    paragraphs.foreach { para =>
      val lines = para.split("\n")
      val firstLine = lines.headOption.map(_.trim).getOrElse("")
      if (headerRe.findFirstIn(firstLine).isDefined) {
        flush(); current += para
      } else if (listRe.findFirstIn(firstLine).isDefined) {
        val prevFirst = current.lastOption.map(_.split("\n").head).getOrElse("")
        if (current.nonEmpty && listRe.findFirstIn(prevFirst).isEmpty) flush()
        current += para
      } else if (firstLine.startsWith("|") && lines.length > 1 &&
          lines(1).trim.startsWith("|")) {
        flush(); current += para
      } else {
        if (current.nonEmpty && para.length > 200 &&
            current.mkString("\n").length > 300) {
          flush(); current += para
        } else current += para
      }
    }
    flush()
    val out = sections.map(_.trim).filter(_.nonEmpty).toSeq
    if (out.isEmpty) Seq(content.trim) else out
  }

  /** T10 core: split into exactly numSections — evenly by sentences when
    * possible, else by chars with whitespace backtrack (≤50). */
  def forceSplit(content: String, numSections: Int): Seq[(Int, String)] = {
    if (content == null || numSections <= 1) return Seq((1, content))
    val sentences = sentenceSplit.split(content, -1)
    if (sentences.length >= numSections) {
      val per = sentences.length / numSections
      val extra = sentences.length % numSections
      var idx = 0
      (0 until numSections).flatMap { i =>
        val n = per + (if (i < extra) 1 else 0)
        val text = sentences.slice(idx, idx + n).mkString(" ").trim
        idx += n
        if (text.nonEmpty) Some((i + 1, text)) else None
      }
    } else {
      val len = content.length
      val sectionLen = len / numSections
      (0 until numSections).flatMap { i =>
        val start = i * sectionLen
        var end = if (i == numSections - 1) len else (i + 1) * sectionLen
        if (i < numSections - 1) {
          val searchStart = math.max(start, end - 50)
          var j = math.min(end, len - 1)
          var found = false
          while (!found && j > searchStart) {
            if (content.charAt(j) == ' ' || content.charAt(j) == '\n') {
              end = j; found = true
            }
            j -= 1
          }
        }
        val text = content.substring(start, end).trim
        if (text.nonEmpty) Some((i + 1, text)) else None
      }
    }
  }

  /** T9+T10 entry: ≥ minSections sections per page, ids dense from 1. */
  def splitPage(pageContent: String, minSections: Int = 2): Seq[(Int, String)] = {
    if (pageContent == null || pageContent.trim.isEmpty) return Seq((1, ""))
    val natural = detectNaturalBoundaries(pageContent)
    if (natural.length >= minSections)
      return natural.zipWithIndex.map { case (s, i) => (i + 1, s) }
    if (natural.length == 1) return forceSplit(natural.head, minSections)

    // split the largest natural section into enough parts
    val largestIdx = natural.indices.maxBy(i => natural(i).length)
    val out = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    var counter = 1
    natural.zipWithIndex.foreach { case (s, i) =>
      if (i == largestIdx && natural.length < minSections) {
        val needed = minSections - natural.length + 1
        forceSplit(s, needed).foreach { case (_, text) =>
          out += ((counter, text)); counter += 1
        }
      } else {
        out += ((counter, s)); counter += 1
      }
    }
    out.toSeq
  }
}
