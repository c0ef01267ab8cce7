package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** BPE training pinned against an independent in-memory trainer (same
  * tie rule: max weighted pair count, then lexicographic (a, b); same
  * greedy left-to-right non-overlapping merge application), plus the
  * textbook corpus, the self-overlap case, and the OOV fallback.
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference trainer over (word, count) with list segmentation. */
  private def refTrain(words: Map[String, Long],
      k: Int): (Seq[(String, String, Long)], Map[String, Int]) = {
    var seg: Map[String, Vector[String]] =
      words.map { case (w, _) => w -> w.map(_.toString).toVector }
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until k) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- seg; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      if (counts.nonEmpty) {
        val ((a, b), s) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        merges += ((a, b, s))
        seg = seg.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2 // greedy left-to-right, non-overlapping
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    (merges.result(), seg.map { case (w, s) => w -> s.length })
  }

  private def corpusWords(text: Seq[String]): Map[String, Long] =
    text.flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, v) => w -> v.size.toLong }

  test("merge table matches the reference trainer on the textbook corpus") {
    val texts = Seq(
      "low low low low low",
      "lower lower newest newest newest newest newest newest",
      "widest widest widest")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 6)._1
      .map(m => (m.a, m.b, m.count))
    val (want, _) = refTrain(corpusWords(texts), 6)
    assert(got == want)
  }

  test("self-overlapping pair merges greedily left-to-right") {
    val docs = Seq((0L, "aaa aaa bb")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, "text", 1)
    // pair (a,a) appears twice per "aaa" (overlap counted), ×2 docs = 4
    assert(merges.head.a == "a" && merges.head.b == "a" &&
      merges.head.count == 4L)
    val n = vocab.collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(n("aaa") == 2, "greedy: aaa -> [aa, a]")
    assert(n("bb") == 2, "(b,b) lost the argmax; bb stays unmerged")
  }

  test("token counts: vocabulary lookup plus merge REPLAY on OOV words") {
    val train = Seq((0L, "abab abab cd")).toDF("doc_id", "text")
    // "zzz": OOV, no learned merge applies -> its 3 characters.
    // "ababab": OOV but built from merged pairs — real BPE replays the
    // trained table on the char segmentation: (a,b) -> [ab,ab,ab], then
    // (ab,ab) greedy left-to-right -> [abab, ab] = 2 tokens (the
    // pre-r10 char-count fallback would have said 6).
    val apply0 = Seq((1L, "abab cd zzz ababab")).toDF("doc_id", "text")
    val out = Bpe.tokenCounts(train, apply0, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (_, nTok, nWords) = out.head
    val (_, vocabLens) = refTrain(corpusWords(Seq("abab abab cd")), 2)
    val want = vocabLens("abab") + vocabLens("cd") + 3L + 2L
    assert(nWords == 4L && nTok == want)
  }

  test("corpus merges are frequency-sorted and application shrinks counts") {
    val docs = graft.Tables.documents(spark, sfDir)
    val merges = Bpe.train(docs, "text", 8)._1
    assert(merges.length == 8)
    assert(merges.map(_.count) == merges.map(_.count).sortBy(-_),
      "winning counts must be non-increasing over rounds")
    val toks = Bpe.tokenCounts(docs, docs, "doc_id", "text", 8)
      .agg(sum("n_bpe_tokens"), sum("n_words")).as[(Long, Long)].head()
    val chars = docs.select(
      sum(size(filter(split(col("text"), "\\s+"), t => t =!= "")))).as[Long].head()
    assert(toks._2 == chars, "word totals agree with the tokenizer split")
    assert(toks._1 < docs.select(sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .as[Long].head(), "BPE tokens must undercut raw character count")
  }
}
