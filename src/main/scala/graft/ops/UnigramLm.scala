package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING and application —
  * the probabilistic companion to [[Bpe]]'s merge-table tokenizer
  * (Kudo 2018: seed a substring vocabulary, EM-fit piece probabilities,
  * tokenize by Viterbi). BPE alone under-covers the tokenizer-analysis
  * corner of the text stack: real pipelines compare both families
  * before committing a vocab.
  *
  * Deterministic, oracle-able recipe (the q_text_unigram_* mirrors
  * unroll every round as CTEs):
  *  - SEED: all substrings of the corpus's distinct words up to
  *    `maxPieceLen` chars, weighted by word frequency; every single
  *    character is kept (coverage guarantee), plus the top `vocabSize`
  *    multi-char pieces by (freq DESC, piece ASC).
  *  - LOG-PROBS on an INTEGER NANO GRID: logp_nano = HALF_UP-rounded
  *    ln(count/total)·1e9 as a LONG — Viterbi then runs on exact
  *    integer adds (no float anywhere in the DP), so both engines
  *    replay the same path bit-for-bit; java HALF_UP == DuckDB ROUND
  *    (the int8Quantize convention), and the single ln per vocab entry
  *    is the established ln9-class risk surface.
  *  - EM (`emIters` rounds): E-step Viterbi-segments each DISTINCT word
  *    under the current table (ties: higher score, then LONGER last
  *    piece — the mirror's ORDER BY score DESC, l DESC); piece counts
  *    are word-frequency-weighted exact longs. M-step: +1 Laplace on
  *    single chars only (coverage survives pruning), drop multi-char
  *    pieces that won no position, re-derive logp_nano.
  *
  * Scale posture: the corpus is touched ONCE for word counts;
  * everything after is VOCABULARY-scale (the [[Bpe]] posture). Each EM
  * round is one distributed flatMap over distinct words + one
  * vocab-scale aggregation collect; the trained table (≤ alphabet +
  * vocabSize rows) is broadcast metadata, and application is the
  * distinct-word Viterbi joined back to corpus words by key — never a
  * per-occurrence re-segmentation.
  */
object UnigramLm {

  /** ln(p) on the integer nano grid — HALF_UP matches DuckDB's ROUND
    * away-from-zero on the negative values ln produces. */
  private def lnNano(p: Double): Long =
    java.math.BigDecimal.valueOf(math.log(p) * 1e9)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Integer-score Viterbi segmentation of `w` under `vocab`
    * (piece → logp_nano). Returns (total score, pieces) or None if some
    * prefix is uncoverable (impossible when every char of `w` is in the
    * vocab — the trainer guarantees that for its own corpus). Ties pick
    * the LONGER last piece, matching the mirror's ORDER BY score DESC,
    * l DESC. */
  private[graft] def viterbi(w: String, vocab: Map[String, Long],
      maxLen: Int): Option[(Long, List[String])] = {
    val n = w.length
    val score = Array.fill(n + 1)(Long.MinValue)
    val bpLen = Array.fill(n + 1)(0)
    score(0) = 0L
    var i = 1
    while (i <= n) {
      var bestS = Long.MinValue
      var bestL = 0
      var l = 1
      while (l <= maxLen && l <= i) {
        if (score(i - l) != Long.MinValue) vocab.get(w.substring(i - l, i))
          .foreach { lp =>
            val s = score(i - l) + lp
            if (s > bestS || (s == bestS && l > bestL)) { bestS = s; bestL = l }
          }
        l += 1
      }
      score(i) = bestS
      bpLen(i) = bestL
      i += 1
    }
    if (score(n) == Long.MinValue) None
    else {
      var pieces = List.empty[String]
      var p = n
      while (p > 0) { val l = bpLen(p); pieces = w.substring(p - l, p) :: pieces; p -= l }
      Some((score(n), pieces))
    }
  }

  /** (piece, count) → next log-prob table: Laplace +1 on single chars,
    * zero-count multi-char pieces pruned. Driver-side, vocab-scale. */
  private def toTable(counts: Map[String, Long]): Map[String, (Long, Long)] = {
    val kept = counts.map { case (p, c) =>
      p -> (c + (if (p.length == 1) 1L else 0L))
    }.filter(_._2 > 0)
    val total = kept.values.sum.toDouble
    kept.map { case (p, c) => p -> (c, lnNano(c / total)) }
  }

  /** Distinct corpus words with occurrence counts — the shared
    * tokenization contract (TextAnalysis.tokensNonEmpty). */
  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokensNonEmpty(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Train the unigram table: EM over the staged distinct-word frame.
    * Returns the final (piece → (count, logp_nano)) map — metadata the
    * caller broadcasts — plus the staged word frame for reuse
    * (the caller MUST release it via the returned thunk). */
  private def trainTable(docs: DataFrame, textCol: String,
      maxPieceLen: Int, vocabSize: Int, emIters: Int)
      : (Map[String, (Long, Long)], DataFrame, () => Unit) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = Checkpoints.stage(wordCounts(docs, textCol), eager = true)
    // seed candidates: every substring up to maxPieceLen, freq-weighted
    val subsU = udf((w: String) =>
      (for {
        i <- 0 until w.length
        l <- 1 to math.min(maxPieceLen, w.length - i)
      } yield w.substring(i, i + l)))
    val cand = words.select(col("cnt"), explode(subsU(col("w"))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
    val chars = cand.filter(length(col("piece")) === 1)
    val multi = cand.filter(length(col("piece")) > 1)
      .orderBy(col("freq").desc, col("piece")).limit(vocabSize)
    val seed = chars.unionByName(multi).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total0 = seed.values.sum.toDouble
    var table = seed.map { case (p, c) => p -> (c, lnNano(c / total0)) }
    (1 to emIters).foreach { _ =>
      val vocab = table.map { case (p, (_, lp)) => p -> lp }
      val counts = words.as[(String, Long)].flatMap { case (w, cnt) =>
        viterbi(w, vocab, maxPieceLen).toSeq
          .flatMap(_._2.map(piece => piece -> cnt))
      }.groupBy(col("_1").as("piece")).agg(sum(col("_2")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      table = toTable(table.keys.map(p => p -> counts.getOrElse(p, 0L)).toMap)
    }
    (table, words, () => Checkpoints.release(words))
  }

  /** Trained vocabulary report: (piece, n_count, logp_nano) after
    * `emIters` EM rounds — n_count is the final M-step count (Laplace
    * included). */
  def vocabTable(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      vocabSize: Int = 20, emIters: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (table, _, release) =
      trainTable(docs, textCol, maxPieceLen, vocabSize, emIters)
    release()
    table.toSeq.map { case (p, (c, lp)) => (p, c, lp) }
      .toDF("piece", "n_count", "logp_nano")
  }

  /** Per-document Viterbi tokenization under the vocabulary trained on
    * `trainDocs`: (id, n_words, n_pieces, nll_nano). The Viterbi runs
    * once per DISTINCT word and joins back by key (the Bpe.tokenCounts
    * deployment shape); nll_nano = −Σ logp_nano over the document's
    * pieces, an exact long. A word with an uncoverable character (train
    * and score corpora differ) surfaces as a poison row (id −1) rather
    * than a silent drop — the mirror carries the same sentinel. */
  def tokenCounts(trainDocs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, maxPieceLen: Int = 4, vocabSize: Int = 20,
      emIters: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (table, _, release) =
      trainTable(trainDocs, textCol, maxPieceLen, vocabSize, emIters)
    release()
    val vocab = table.map { case (p, (_, lp)) => p -> lp }
    val segU = udf((w: String) => viterbi(w, vocab, maxPieceLen)
      .map { case (s, pieces) => (pieces.length, -s) }.orNull)
    val perWord = wordCounts(docs, textCol).select(col("w"))
      .withColumn("seg", segU(col("w")))
    val scored = docs
      .select(col(idCol).cast("long").as("id"),
        explode(TextAnalysis.tokensNonEmpty(col(textCol))).as("w"))
      .join(perWord, Seq("w"))
    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("seg._1").cast("long")).as("n_pieces"),
        sum(col("seg._2")).as("nll_nano"))
      .unionByName(
        scored.filter(col("seg").isNull).limit(1)
          .select(lit(-1L).as("id"), lit(-1L).as("n_words"),
            lit(-1L).as("n_pieces"), lit(-1L).as("nll_nano")))
      .withColumnRenamed("id", idCol)
  }
}
