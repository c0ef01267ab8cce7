package graft.ops

import graft.SparkSpecBase

/** Incremental LSH admission semantics on a planted fixture: an exact
  * copy of a corpus doc must collide on ALL bands, a novel doc on none,
  * and the pair frame must never contain corpus-corpus or
  * incoming-incoming pairs (the cost model the operator exists for).
  */
class IncrementalDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "completely different corpus content about database engines"),
    (3L, "a third corpus document describing shuffle partitioning"))
  private val incoming = Seq(
    // exact copy of corpus doc 1 -> all 4 bands collide
    (101L, "the quick brown fox jumps over the lazy dog again and again"),
    // novel content -> no collisions, admitted
    (102L, "entirely novel text that matches nothing in the corpus xyzzy"))

  test("copy collides on all bands, novel doc on none; sides never self-pair") {
    val cSig = Dedup.minhashSignature(corpus.toDF("doc_id", "text"), "doc_id", "text")
    val iSig = Dedup.minhashSignature(incoming.toDF("doc_id", "text"), "doc_id", "text")
    val pairs = Dedup.lshPairsAgainst(cSig, iSig, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every pair is incoming × corpus by construction of the ids
    assert(pairs.forall { case (i, c, _) => i >= 100L && c < 100L })
    val copy = pairs.filter(_._1 == 101L)
    assert(copy.exists { case (_, c, nb) => c == 1L && nb == 4L },
      s"exact copy should share all 4 bands with doc 1: ${copy.mkString(",")}")
    assert(!pairs.exists(_._1 == 102L), "novel doc must have no candidates")
  }

  test("registered query: admit verdict matches candidate presence") {
    val out = graft.queries.DedupQueries.incremental(spark, sfDir)
      .select("n_candidates", "admit").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getBoolean(1) == (r.getLong(0) == 0L)))
  }
}
