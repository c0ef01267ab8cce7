package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Scale contracts of the adaptive LSH family (r4's headline fix, locked
  * in as regressions here):
  *  - the maxTables recall clamp is DETECTABLE via achievedRecall, not a
  *    silent degradation;
  *  - candidate-row growth between the sf0.01 (n=500) and sf0.1 (n=5000)
  *    fixture scales is sub-quadratic because bucket depth b deepens with
  *    the corpus (a regression to constant b makes the ratio ~(10x)^2).
  */
class AdaptiveLshSpec extends SparkSpecBase {

  private val sf001 = "/root/testdata/sf0.01"
  private val sf01 = "/root/testdata/sf0.1"

  test("maxTables clamp: degraded recall is detectable, not silent") {
    // healthy operating point: the unclamped T is honored and delivers
    // the target
    val tHealthy = Similarity.adaptiveTables(0.85, 7, targetRecall = 0.99)
    assert(Similarity.achievedRecall(0.85, 7, tHealthy) >= 0.99)
    // pathological point (deep b x low threshold): T explodes past
    // maxTables; the clamp keeps the job bounded but achievedRecall
    // exposes how far below target the clamped configuration lands
    val tClamped = Similarity.adaptiveTables(0.35, 24, targetRecall = 0.99,
      maxTables = 512)
    assert(tClamped == 512)
    val achieved = Similarity.achievedRecall(0.35, 24, tClamped)
    assert(achieved < 0.10, s"expected collapsed recall, got $achieved")
  }

  test("adaptive cosine candidates: depth deepens and beats constant-b") {
    def emb(dir: String) = graft.Tables.embeddings(spark, dir)
    // θ=0.85 keeps T small so the spec is cheap; the property under test
    // (occupancy held constant by deepening b) is threshold-independent
    val (rowsS, bS, _, nS) =
      Similarity.adaptiveCandidateStats(emb(sf001), 0.85, maxPlanes = 7)
    val (rowsL, bL, _, nL) =
      Similarity.adaptiveCandidateStats(emb(sf01), 0.85, maxPlanes = 7)
    assert(nS == 500 && nL == 2000)
    assert(bL > bS, s"bucket depth must deepen with the corpus, got $bS -> $bL")
    // expected occupancy stays at/below target at both scales — THE
    // linearity invariant (constant b would take occupancy Θ(n))
    assert(nS.toDouble / (1 << bS) <= 64.0)
    assert(nL.toDouble / (1 << bL) <= 64.0)
    // self-calibrating quadratic check: the same corpus through a depth
    // FROZEN at the small-scale b must cost strictly more candidate rows
    // than the adaptive depth — this is exactly the r3 trap
    val (rowsFrozen, bF, _, _) = Similarity.adaptiveCandidateStats(
      emb(sf01), 0.85, minPlanes = bS, maxPlanes = bS)
    assert(bF == bS)
    assert(rowsL < rowsFrozen,
      s"adaptive $rowsL rows should beat frozen-b $rowsFrozen rows")
    // and growth stays far from quadratic: 4x corpus -> <16x candidates
    val ratio = rowsL.toDouble / rowsS
    assert(ratio <= (nL.toDouble / nS) * 4,
      s"candidate growth $rowsS -> $rowsL (${ratio}x) at ${nL / nS}x corpus")
  }

  test("deep-depth branch (b=7): adaptive pairs stay exact on planted near-dups") {
    // the fixture embedding tables stop at 2,000 vectors, so the b=6..7
    // legs of the adaptive generator were previously reasoned about but
    // never executed; this synthetic 4,200-vector corpus (> 64·2^6)
    // forces b=7 and proves the deep branch end to end: depth choice,
    // table compensation, and full recall on planted near-identical pairs
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val base = (0 until 2100).map { i =>
      (i.toLong * 2, Seq.fill(64)(rng.nextGaussian().toFloat))
    }
    val planted = base.flatMap { case (id, v) =>
      val dup = v.map(x => x + 0.001f * rng.nextGaussian().toFloat)
      Seq((id, v), (id + 1, dup))
    }.toDF("vec_id", "embedding")
    val (_, b, t, n) = Similarity.adaptiveCandidateStats(planted, 0.9)
    assert(n == 4200 && b == 7, s"n=$n must select b=7, got b=$b")
    assert(Similarity.achievedRecall(0.9, b, t) >= 0.99)
    val pairs = Similarity.cosinePairsAdaptive(planted, 0.9)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (2i, 2i+1) duplicate pair is cos ≈ 1 and must be found
    val wanted = base.map { case (id, _) => (id, id + 1) }.toSet
    val missed = wanted -- pairs
    assert(missed.isEmpty, s"b=7 run missed ${missed.size} planted pairs")
  }

  test("simhash banded candidates are output-bound, not bucket-bound") {
    // the sf0.1 documents corpus has a genuinely dense near-dup structure
    // (planted duplicate clusters), so the TRUE pair count grows
    // super-linearly — the scalable property is that candidates track the
    // true output (plus a small birthday term), not bucket saturation
    def stats(dir: String): (Long, Long, Long) = {
      val s = Dedup.simhash64(graft.Tables.documents(spark, dir),
        "doc_id", "text")
      val n = s.count()
      val banded = s.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(k =>
          struct(lit(k).as("k"),
            shiftrightunsigned(col("simhash"), 16 * k)
              .bitwiseAND(lit(65535L)).as("band"))): _*)).as("b"))
        .select(col("doc_id"), col("simhash"),
          col("b.k").as("k"), col("b.band").as("band"))
      val a = banded.select(col("doc_id").as("id_a"),
        col("simhash").as("sh_a"), col("k"), col("band"))
      val cand = a.join(
        banded.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"),
          col("k"), col("band")),
        Seq("k", "band")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      val candN = cand.count()
      val trueN = cand
        .filter(Dedup.hamming(col("sh_a"), col("sh_b")) <= 8).count()
      (n, candN, trueN)
    }
    val (nL, candL, trueL) = stats(sf01)
    val allPairs = nL.toDouble * (nL - 1) / 2
    // random-collision (birthday) term at 16-bit bands: 4·C(n,2)/65536.
    // The r3 trap (8-bit bands, 256 buckets) made THIS term dominate —
    // ~195k random candidates at n=5000. With 65,536 buckets it must be
    // a rounding error of the candidate set: what remains is structural
    // (correlated template families sharing bands at hamming 9-20, which
    // no band cardinality can remove — measured ~188k candidates of
    // which ~18k verify at hamming ≤ 8)
    val birthday = 4.0 * nL * (nL - 1) / 2 / 65536
    assert(birthday / candL <= 0.05,
      s"n=$nL: birthday ~${birthday.toLong} is ${birthday / candL} of " +
        s"$candL candidates — bucket saturation is back")
    // and the candidate join stays far below all-pairs (the join is
    // selective even on this dense corpus)
    assert(candL / allPairs <= 0.05,
      s"candidates $candL of ${allPairs.toLong} pairs " +
        s"(${candL / allPairs}) — near all-pairs join")
    assert(trueL > 0)
  }
}
