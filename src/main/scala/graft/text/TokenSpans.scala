package graft.text

/** Precomputed estimator-B token spans of one string.
  *
  * The chunker (T8) needs the estimator-B value of many suffixes and slices
  * of the same section: the reference rescans the remaining text on every
  * cut (`stage_03_content_chunking.py:430-446` calls `estimate_tokens` on
  * `remaining_text` each iteration), which is O(chunks × length) regex
  * work. This index runs the token regex ONCE and answers any
  * `estimateB(substring(from, until))` in O(tokens-in-range) float
  * additions — with bit-identical results, because:
  *
  *  - a slice boundary can only truncate a `\w+` run (punctuation tokens
  *    are single code points), and the truncated piece is itself a full
  *    `\b\w+\b` match of the slice, so its weight is a pure function of
  *    the clipped length;
  *  - weights are summed LEFT-TO-RIGHT over the clipped tokens, the same
  *    fp-addition order a fresh scan of the slice produces (suffix sums
  *    computed right-to-left or by prefix-subtraction would differ in
  *    final ulps and could flip the trailing `.toInt`).
  *
  * TokenSpansSpec pins `estimateB(from, until) ==
  * Tokens.estimateB(content.substring(from, until))` property-style.
  */
final class TokenSpans private (
    contentLength: Int, starts: Array[Int], ends: Array[Int]) {

  /** First token index whose span ends after `pos` (tokens are sorted and
    * disjoint, so this is the first token a slice starting at `pos` can
    * intersect). */
  private def firstEndingAfter(pos: Int): Int = {
    var lo = 0
    var hi = ends.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ends(mid) <= pos) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Exact `Tokens.estimateB(content.substring(from, until))`. */
  def estimateB(from: Int, until: Int): Int = {
    val len = math.min(until, contentLength) - math.max(from, 0)
    if (len <= 0) return 0
    var wordTokens = 0.0
    var i = firstEndingAfter(from)
    while (i < starts.length && starts(i) < until) {
      val l = math.min(ends(i), until) - math.max(starts(i), from)
      if (l > 0) {
        if (l <= 3) wordTokens += 1
        else if (l <= 7) wordTokens += 1.3
        else wordTokens += l / 4.5
      }
      i += 1
    }
    val charEstimate = len / 4.0
    (wordTokens * 0.7 + charEstimate * 0.3).toInt
  }

  /** estimateB of the suffix starting at `from`. */
  def estimateBFrom(from: Int): Int = estimateB(from, contentLength)
}

object TokenSpans {
  /** One pass of the estimator-B token regex over `content`. */
  def apply(content: String): TokenSpans = {
    val starts = scala.collection.mutable.ArrayBuilder.make[Int]
    val ends = scala.collection.mutable.ArrayBuilder.make[Int]
    if (content != null && content.nonEmpty) {
      Tokens.wordRe.findAllMatchIn(content).foreach { m =>
        starts += m.start
        ends += m.end
      }
    }
    new TokenSpans(if (content == null) 0 else content.length,
      starts.result(), ends.result())
  }
}
