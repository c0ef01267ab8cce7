package graft.text

import scala.util.matching.Regex

/** T8: priority break-point chunker
  * (semantic search/stage_03_content_chunking.py:323-561).
  *
  * A section at or under `maxTokens` (estimator B) is one chunk. Larger
  * sections are cut greedily: each cut lands inside the window
  * [pos + minTokens·4c, pos + hardMax·4c], at the best candidate break —
  * ranked by (priority, distance from pos + 625·4c) — where candidates are,
  * in priority order: H2/H3 headings, blank lines, list starts, sentence
  * ends, comma/semicolon. Page-tag HTML comments are protected zones no
  * break may fall inside; with no candidate in range the cut falls at the
  * next zone start, else at the window max.
  */
object Chunker {

  final case class Config(minTokens: Int = 500, maxTokens: Int = 750,
      hardMax: Int = 800, avgCharsPerToken: Double = 4.0)

  final case class Zone(start: Int, end: Int)
  final case class Break(position: Int, breakType: String, priority: Int)

  private val zoneRe = new Regex("""<!--\s*Page(?:Header|Footer)[^>]*?-->""")
  private val headingRe = new Regex("""\n(#{2,3})\s+[^\n]+""")
  private val paragraphRe = new Regex("""\n\n+""")
  private val listRe = new Regex("""\n(?=[-*•]\s|\d+\.\s)""")
  private val sentenceRe = new Regex("""[.!?]\s+(?=[A-Z])""")
  private val commaRe = new Regex("""[,;]\s+""")

  def protectedZones(content: String): Seq[Zone] =
    zoneRe.findAllMatchIn(content).map(m => Zone(m.start, m.end)).toSeq

  private def inZone(pos: Int, zones: Seq[Zone]): Boolean =
    zones.exists(z => z.start <= pos && pos < z.end)

  /** All candidate break points, position-sorted. */
  def breakPoints(content: String, zones: Seq[Zone]): Seq[Break] = {
    val out = scala.collection.mutable.ArrayBuffer[Break]()
    headingRe.findAllMatchIn(content).foreach { m =>
      if (!inZone(m.start, zones)) out += Break(m.start, "heading", 1)
    }
    paragraphRe.findAllMatchIn(content).foreach { m =>
      val pos = m.start
      if (!inZone(pos, zones) &&
          !out.exists(b => b.breakType == "heading" && math.abs(b.position - pos) < 10))
        out += Break(pos, "paragraph", 2)
    }
    listRe.findAllMatchIn(content).foreach { m =>
      if (!inZone(m.start, zones)) out += Break(m.start, "list", 3)
    }
    sentenceRe.findAllMatchIn(content).foreach { m =>
      val pos = m.end - 1
      if (!inZone(pos, zones)) out += Break(pos, "sentence", 4)
    }
    commaRe.findAllMatchIn(content).foreach { m =>
      val pos = m.end - 1
      if (!inZone(pos, zones)) out += Break(pos, "comma", 5)
    }
    out.sortBy(_.position).toSeq
  }

  /** Best cut after `startPos` (stage_03_content_chunking.py:467-493). */
  def findBestBreak(content: String, startPos: Int, targetTokens: Int,
      breaks: Seq[Break], zones: Seq[Zone], cfg: Config): Int = {
    val minEnd = startPos + (cfg.minTokens * cfg.avgCharsPerToken).toInt
    val maxEnd = math.min(startPos + (cfg.hardMax * cfg.avgCharsPerToken).toInt, content.length)
    val idealEnd = startPos + (targetTokens * cfg.avgCharsPerToken).toInt

    val candidates = breaks.filter(b =>
      b.position >= minEnd && b.position <= maxEnd && b.position > startPos)
    if (candidates.isEmpty) {
      zones.find(z => z.start >= minEnd && z.start <= maxEnd && z.start > startPos) match {
        case Some(z) => z.start
        case None => math.min(maxEnd, content.length)
      }
    } else
      candidates.minBy(b => (b.priority, math.abs(b.position - idealEnd))).position
  }

  /** Chunk a section's content; returns (chunk text, estimator-B token
    * count) pairs, positionally ordered. Empty content → no chunks.
    *
    * The reference rescans the remaining text with the token regex on
    * every cut; a TokenSpans index (one regex pass) answers each
    * remaining/slice estimate with bit-identical arithmetic, turning the
    * per-section cost from O(chunks × length) into O(length). The counts
    * equal `Tokens.estimateB` of each chunk exactly (TokenSpansSpec).
    */
  def chunkWithTokens(content: String, cfg: Config = Config()): Seq[(String, Int)] = {
    if (content == null || content.isEmpty) return Nil
    val spans = TokenSpans(content)
    val totalTokens = spans.estimateBFrom(0)
    if (totalTokens <= cfg.maxTokens) return Seq((content, totalTokens))

    val zones = protectedZones(content)
    val breaks = breakPoints(content, zones)
    val targetTokens = (cfg.minTokens + cfg.maxTokens) / 2

    val out = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    var pos = 0
    var continue = true
    while (continue && pos < content.length) {
      val remainingTokens = spans.estimateBFrom(pos)
      if (remainingTokens <= cfg.maxTokens) {
        out += ((content.substring(pos), remainingTokens))
        continue = false
      } else {
        val breakPos = findBestBreak(content, pos, targetTokens, breaks, zones, cfg)
        out += ((content.substring(pos, breakPos), spans.estimateB(pos, breakPos)))
        pos = breakPos
      }
    }
    out.toSeq
  }

  /** Chunk texts only (parity surface used by the golden suite). */
  def chunk(content: String, cfg: Config = Config()): Seq[String] =
    chunkWithTokens(content, cfg).map(_._1)
}
