package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer laws: Viterbi optimality against brute-force
  * segmentation enumeration (the DP must find the max integer score,
  * and its tie law is longer-last-piece), coverage (every corpus char
  * survives training), exact-integer NLL accounting, and determinism.
  */
class UnigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abab banana aba nana"),
    (1L, "banana abab abab"),
    (2L, "nana ban aba banana"))
    .toDF("doc_id", "text")

  /** All segmentations of w into vocab pieces of length <= maxLen. */
  private def allSegs(w: String, vocab: Map[String, Long],
      maxLen: Int): Seq[(Long, List[String])] = {
    if (w.isEmpty) Seq((0L, Nil))
    else (1 to math.min(maxLen, w.length)).flatMap { l =>
      val piece = w.substring(0, l)
      vocab.get(piece).toSeq.flatMap { lp =>
        allSegs(w.substring(l), vocab, maxLen)
          .map { case (s, ps) => (s + lp, piece :: ps) }
      }
    }
  }

  test("viterbi finds the brute-force max score; ties take the longer last piece") {
    val vocab = Map("a" -> -5L, "b" -> -7L, "n" -> -6L, "ab" -> -9L,
      "ba" -> -9L, "na" -> -8L, "ana" -> -13L, "nan" -> -15L)
    Seq("banana", "abab", "nana", "aba", "ban", "a").foreach { w =>
      val Some((score, pieces)) = UnigramLm.viterbi(w, vocab, 4)
      val all = allSegs(w, vocab, 4)
      assert(all.nonEmpty)
      assert(score === all.map(_._1).max, s"word $w")
      assert(pieces.mkString("") === w, s"pieces must re-spell $w")
      assert(all.exists { case (s, ps) => s == score && ps == pieces },
        s"chosen segmentation must be one of the optimal set for $w")
    }
    // explicit tie law: "ab" via ["ab"](-9) vs ["a","b"](-12) — the
    // single longer piece wins outright; and with equal-score paths the
    // longer LAST piece is chosen
    val tie = Map("a" -> -4L, "b" -> -4L, "ab" -> -8L)
    val Some((s, ps)) = UnigramLm.viterbi("ab", tie, 4)
    assert(s === -8L && ps === List("ab"))
  }

  test("uncoverable input returns None, covered input never does") {
    assert(UnigramLm.viterbi("axa", Map("a" -> -1L), 4).isEmpty)
    assert(UnigramLm.viterbi("aaa", Map("a" -> -1L), 4).nonEmpty)
  }

  test("trained vocab covers every corpus char; log-probs negative; deterministic") {
    val v1 = UnigramLm.vocabTable(docs, "text", vocabSize = 8, emIters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val v2 = UnigramLm.vocabTable(docs, "text", vocabSize = 8, emIters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v1.sortBy(_._1).toSeq === v2.sortBy(_._1).toSeq)
    val pieces = v1.map(_._1).toSet
    val chars = docs.collect().flatMap(_.getString(1).replace(" ", "")).toSet
    chars.foreach(c => assert(pieces(c.toString), s"char $c must survive"))
    v1.foreach { case (p, c, lp) =>
      assert(c > 0L, s"$p count")
      assert(lp < 0L, s"$p logp must be negative")
    }
  }

  test("token counts: exact NLL accounting and piece-count bounds") {
    val vocab = UnigramLm.vocabTable(docs, "text", vocabSize = 8, emIters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val out = UnigramLm.tokenCounts(docs, docs, "doc_id", "text",
      vocabSize = 8, emIters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set(0L, 1L, 2L), "no poison row on a shared corpus")
    val byDoc = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq).toMap
    byDoc.foreach { case (id, words) =>
      val (nWords, nPieces, nll) = out(id)
      assert(nWords === words.length.toLong)
      val expect = words.map(w => UnigramLm.viterbi(w, vocab, 4).get)
      assert(nPieces === expect.map(_._2.length.toLong).sum)
      assert(nll === expect.map(s => -s._1).sum, s"doc $id exact NLL")
      assert(nPieces >= nWords && nPieces <= words.map(_.length).sum)
    }
  }
}
