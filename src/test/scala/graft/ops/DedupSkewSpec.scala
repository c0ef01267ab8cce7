package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.queries.DedupQueries

/** Hot-shingle skew guard (the df > N/8 cap in the n-gram Jaccard join):
  * a corpus-wide boilerplate sentence must NOT create a quadratic hot
  * bucket — capped candidates stay at the true-overlap pairs only. */
class DedupSkewSpec extends SparkSpecBase {

  test("planted stop-shingle: capped join meets only true near-dup pairs") {
    import spark.implicits._
    val boiler = "this disclaimer appears verbatim in every single document"
    val n = 120
    // every doc shares the boilerplate; docs 7 and 8 additionally share a
    // long unique tail (the one true near-dup pair)
    val dupTail = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (0 until n).map { i =>
      val tail =
        if (i == 7 || i == 8) dupTail
        else s"unique$i word$i token$i item$i value$i extra$i"
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text")

    val (inter, _) = DedupQueries.ngramCandidates(docs, n.toLong)
    val pairs = inter.collect()
    // uncapped, the boilerplate shingles alone would meet all
    // C(120,2) = 7,140 pairs; the cap removes them from the universe
    assert(pairs.length == 1,
      s"expected exactly the planted pair, got ${pairs.length} candidates")
    assert(pairs.head.getLong(0) == 7L && pairs.head.getLong(1) == 8L)

    // and the full query scores the surviving pair on unique shingles
    // only (identical tails -> jaccard 1.0)
    val out = DedupQueries.ngramJaccardOn(docs, n.toLong).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("jaccard") == 1.0)
  }

  test("hot cap keeps genuinely-rare shingles: df <= N/8 survives") {
    import spark.implicits._
    val n = 80
    // a shingle shared by exactly 9 docs (df 9 <= 80/8 = 10) must still
    // generate candidates among those docs
    val shared = "rare phrase shared by a handful only"
    val docs = (0 until n).map { i =>
      val text =
        if (i < 9) s"$shared filler$i pad$i"
        else s"unique$i word$i token$i item$i"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val (inter, _) = DedupQueries.ngramCandidates(docs, n.toLong)
    // the 9 sharers meet pairwise: C(9,2) = 36 candidate pairs
    assert(inter.count() == 36L)
  }
}
