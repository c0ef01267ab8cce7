package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Token-count estimators. The reference deliberately uses TWO different
  * estimators in different stages — both are kept, exactly:
  *
  *  - `estimateA`: chars/3.5 clamped to [chars/10, chars/2]
  *    (semantic search/stage_01_chapter_processing.py:314-330; same fn in
  *    stage_04_embedding_generation.py:300-321). Used by chapter/section
  *    segmentation (T3/T4).
  *  - `estimateB`: word-weighted — regex word split, ≤3 chars → 1 token,
  *    ≤7 → 1.3, else len/4.5; blended 0.7·word + 0.3·(chars/4)
  *    (stage_03_content_chunking.py:278-321). Used by the chunker (T8).
  *
  * Each estimator exists twice: a pure-Scala version (for the group-local
  * text engine running inside flatMapGroups) and a Catalyst Column version
  * (codegen-friendly, oracle-checkable, for column-level pipelines). Specs
  * assert the two agree.
  */
object Tokens {

  /** T1: character-heuristic estimator (pure). */
  def estimateA(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val n = text.length
    val est = (n / 3.5).toInt
    val maxTokens = n / 2  // MIN_CHARS_PER_TOKEN = 2
    val minTokens = n / 10 // MAX_CHARS_PER_TOKEN = 10
    math.max(minTokens, math.min(est, maxTokens))
  }

  private[text] val wordRe = """\b\w+\b|[^\w\s]""".r

  /** T2: word-weighted estimator (pure). */
  def estimateB(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    var wordTokens = 0.0
    wordRe.findAllIn(text).foreach { w =>
      if (w.length == 0) ()
      else if (w.length <= 3) wordTokens += 1
      else if (w.length <= 7) wordTokens += 1.3
      else wordTokens += w.length / 4.5
    }
    val charEstimate = text.length / 4.0
    (wordTokens * 0.7 + charEstimate * 0.3).toInt
  }

  /** T1 as a Catalyst expression (identical arithmetic, trunc-toward-zero
    * like Python int()). */
  def estimateACol(text: Column): Column = {
    val n = length(text)
    val est = (n.cast("double") / 3.5).cast("int") // positive → trunc == floor
    when(text.isNull || n === 0, 0)
      .otherwise(greatest(floor(n / 10).cast("int"),
        least(est, floor(n / 2).cast("int"))))
  }

  /** T2 as a Catalyst expression — a native codegen'd call into the pure
    * estimator (the former `regexp_extract_all` + `aggregate` HOF form was
    * CodegenFallback, interpreted per row). null → 0 like the pure form. */
  def estimateBCol(text: Column): Column =
    coalesce(graft.functions.GraftFunctions.tokenEstimateB(text), lit(0))
}
