package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application — the
  * tokenization stage a training-data pipeline runs before token
  * budgeting, packing, and shard writing. The existing token
  * estimators (TextAnalysis) approximate a tokenizer's counts; this
  * learns an actual merge table from the corpus and counts real
  * BPE tokens with it.
  *
  * Algorithm (classic character-level BPE): start from the corpus's
  * DISTINCT words with occurrence counts, each segmented into single
  * characters; each round counts adjacent symbol pairs weighted by
  * word frequency, merges the most frequent pair (ties → lexicographic
  * smallest (a, b)), and re-segments. `numMerges` rounds produce the
  * ranked merge table.
  *
  * Scale posture: everything after the first aggregation operates on
  * the distinct-word frame — VOCABULARY-scale, not corpus-scale (the
  * 100 TB corpus is touched once, for the word counts; a vocabulary is
  * millions of rows at web scale). Each round is one pair-count
  * aggregation (map-side combinable) plus one driver-side argmax over
  * a single collected row — numMerges driver barriers, the same
  * metadata-scale collect budget as the PQ codebooks. Per-round
  * segmentations stage through [[Checkpoints]] so round r's aggregation
  * reads round r−1's blocks instead of recomputing the merge chain
  * (O(k) total work, not O(k²)); application is an equi-join of corpus
  * words against the trained vocabulary, never a per-row re-merge.
  *
  * Determinism contract (the q_text_bpe_* oracles replay training in
  * DuckDB with unrolled rounds): integer counts only — no floats
  * anywhere — and the segmentation is carried as a FRAMED STRING, each
  * symbol wrapped as <0x01>sym<0x02>. Applying merge (a, b) is then a
  * literal replace of <0x01>a<0x02><0x01>b<0x02> with
  * <0x01>ab<0x02>: the frame characters make symbol boundaries exact
  * (a suffix of a longer symbol can never false-match), and both
  * engines' `replace` scan left-to-right continuing AFTER each match,
  * which IS greedy non-overlapping BPE application ("aaa" + merge(a,a)
  * → ["aa","a"]). Corpus text must not contain <0x01>/<0x02> (they
  * would frame-break both engines identically).
  */
object Bpe {

  private val O = "\u0001" // symbol open frame
  private val C = "\u0002" // symbol close frame

  /** Shared tokenization contract — see TextAnalysis.tokensNonEmpty. */
  private def toks(text: Column): Column =
    TextAnalysis.tokensNonEmpty(text)

  /** Framed single-character segmentation of a word. */
  private def seg0(w: Column): Column =
    regexp_replace(w, "(.)", s"$O$$1$C")

  /** Symbols of a framed segmentation (frames stripped). */
  private def symsOf(seg: Column): Column =
    split(regexp_replace(seg, s"^$O|$C$$", ""), s"$C$O")

  /** Adjacent symbol pairs as (a, b) structs; empty for 1-symbol words
    * (slice of length 0 — never a descending `sequence`). */
  private def pairsOf(seg: Column): Column = {
    val syms = symsOf(seg)
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))
  }

  /** One trained merge: rank (0-based), the two symbols, and the
    * weighted pair count that won the round. */
  final case class Merge(rank: Int, a: String, b: String, count: Long)

  /** Train `numMerges` BPE merges on the corpus. Returns the merge
    * table and the FINAL segmented vocabulary (word, occurrence count,
    * symbol count) — the apply-side artifact. Stops early if the
    * vocabulary runs out of adjacent pairs. */
  def train(docs: DataFrame, textCol: String,
      numMerges: Int): (Seq[Merge], DataFrame) = {
    val words = docs
      .select(explode(toks(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var seg = Checkpoints.stage(
      words.select(col("w"), col("cnt"), seg0(col("w")).as("seg")),
      eager = false)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    // the lazy-stage chain's release point: round k's argmax collect is
    // the first action on seg_k, which materializes seg_k's deferred
    // localCheckpoint BY READING seg_{k-1}'s blocks — so seg_{k-1}
    // (`prev`) becomes dead exactly after that collect, and a 100-merge
    // training run carries 2 staged vocab frames instead of 100 (the
    // r11 ladder measured 5.6× steady-time inflation from exactly this
    // class of accumulated dead block). `prev` is never the frame we
    // return, and the final seg's still-unmaterialized deferred write
    // keeps its own predecessor alive (released only by a LATER round's
    // collect, which never comes for the last one).
    var prev: DataFrame = null
    while (rank < numMerges && !exhausted) {
      val best = seg
        .select(col("cnt"), explode(pairsOf(col("seg"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("s"))
        .orderBy(col("s").desc, col("a"), col("b"))
        .limit(1).collect()
      if (prev != null) { Checkpoints.release(prev); prev = null }
      if (best.isEmpty) exhausted = true // every word is one symbol
      else {
        val (a, b, s) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, a, b, s)
        prev = seg
        seg = Checkpoints.stage(
          seg.select(col("w"), col("cnt"),
            replace(col("seg"), lit(s"$O$a$C$O$b$C"), lit(s"$O$a$b$C"))
              .as("seg")),
          eager = false)
        rank += 1
      }
    }
    val vocab = seg.select(col("w"), col("cnt"),
      size(symsOf(col("seg"))).as("n_syms"))
    (merges.result(), vocab)
  }

  /** Merge table as a DataFrame (merge_rank, sym_a, sym_b, pair_count). */
  def mergeTable(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges)._1
      .map(m => (m.rank, m.a, m.b, m.count))
      .toDF("merge_rank", "sym_a", "sym_b", "pair_count")
  }

  /** Per-document REAL BPE token counts under a vocabulary trained on
    * `trainDocs`: each document's words join the trained vocabulary's
    * final segmentation (an equi-join on the word — the deployment
    * shape: tokenize by lookup for the overwhelmingly-common in-vocab
    * case). Out-of-vocabulary words get the trained merge table
    * REPLAYED on their character segmentation — standard BPE applies
    * learned merges to unseen words too, so an unseen word built from
    * frequent merged pairs counts its true (smaller) token count, not
    * its character count (the pre-r10 fallback, which overstated).
    * The replay is a rank-ordered fold of literal framed replaces —
    * one projection chain, codegen-friendly, no extra shuffle; it is
    * exactly the training-side re-segmentation step, so lookup and
    * replay can never disagree on a shared word. */
  def tokenCounts(trainDocs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, numMerges: Int): DataFrame = {
    val (merges, segFinal) = train(trainDocs, textCol, numMerges)
    val vocab = segFinal.select(col("w"), col("n_syms"))
    val oovSeg = merges.foldLeft(seg0(col("w"))) { (s, m) =>
      replace(s, lit(s"$O${m.a}$C$O${m.b}$C"), lit(s"$O${m.a}${m.b}$C"))
    }
    docs.select(col(idCol), explode(toks(col(textCol))).as("w"))
      .join(vocab, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(coalesce(col("n_syms").cast("long"),
          size(symsOf(oovSeg)).cast("long"))).as("n_bpe_tokens"),
        count(lit(1)).as("n_words"))
  }
}
