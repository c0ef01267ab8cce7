package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Perceptual-hash image dedup: the locality contract of the stub
  * thumbnail (the property the whole path rests on), the banding's
  * pigeonhole recall guarantee at Hamming ≤ 3, invalid-item exclusion,
  * and the planted-variant recovery rate on the fixture corpus. */
class PHashSpec extends SparkSpecBase {
  import spark.implicits._

  test("stub thumbnail is locality-preserving: k-byte edit moves <= k pixels") {
    val base = ("the quick brown fox jumps over the lazy dog " * 8).getBytes("UTF-8")
    val p0 = Multimodal.StubDecoder.thumbnail("image", base, 64)
    // flip 3 bytes at scattered positions
    val edited = base.clone()
    edited(10) = 'X'.toByte; edited(100) = 'Y'.toByte; edited(200) = 'Z'.toByte
    val p1 = Multimodal.StubDecoder.thumbnail("image", edited, 64)
    val changed = (0 until 64).count(i => p0(i) != p1(i))
    assert(changed <= 3, s"3-byte edit changed $changed pixels")
    assert(changed > 0, "edit must be visible at all")
  }

  test("strided pixels: no degenerate constant pixel across the corpus") {
    // every pixel position must vary across documents — a constant
    // pixel would put the whole corpus into one LSH band bucket
    val texts = graft.Tables.documents(spark, sfDir)
      .select(col("text")).limit(50).as[String].collect()
    val thumbs = texts.map(t =>
      Multimodal.StubDecoder.thumbnail("image", t.getBytes("UTF-8"), 64))
    (0 until 64).foreach { i =>
      assert(thumbs.map(_(i)).distinct.length > 1,
        s"pixel $i is constant over 50 docs — degenerate band feed")
    }
  }

  test("banding guarantees recall at Hamming <= 3 (pigeonhole over 4 bands)") {
    // craft signature rows directly: pairs at distance 1, 2, 3 with the
    // flipped bits deliberately SPREAD across different bands — the
    // adversarial placement for banding — must all still be found
    val baseHi = 0x12345678L
    val baseLo = 0x0BCDEF01L
    val rows = Seq(
      (0L, baseHi, baseLo, true),
      (1L, baseHi ^ 1L, baseLo, true),                    // d=1 (band 2)
      (2L, baseHi ^ (1L << 20), baseLo ^ 1L, true),       // d=2 (bands 3,0)
      (3L, baseHi ^ 1L, baseLo ^ (1L << 3) | 0L, true),   // d=2 (bands 2,0)
      (4L, baseHi ^ (1L << 2) ^ (1L << 20), baseLo ^ (1L << 17), true) // d=3
    ).toDF("media_id", "hi32", "lo32", "valid")
    val pairs = Multimodal.pHashPairs(rows, maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // all pairs among ids 0..4 are within hamming <= 5 of each other via
    // the base; at minimum every (0, x) pair with d <= 3 must be present
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((0L, 4L)))
  }

  test("invalid (empty-payload) items hash to zero and never pair") {
    val m = Seq(
      (1L, "image", Array.emptyByteArray),
      (2L, "image", Array.emptyByteArray),
      (3L, "image", "hello world".getBytes("UTF-8")))
      .toDS()
    val h = Multimodal.pHash(m)
    val inv = h.filter(!col("valid")).select("hi32", "lo32")
      .as[(Long, Long)].collect()
    assert(inv.toSet === Set((0L, 0L)) && inv.length == 2)
    // two empty items agree on every band; without the valid filter they
    // would emit a spurious hamming-0 pair
    assert(Multimodal.pHashPairs(h).count() === 0)
  }

  test("fixture corpus: planted 4-byte re-encode variants are recovered") {
    val docs = graft.Tables.documents(spark, sfDir)
    val m = docs.select((col("doc_id") * 2).as("media_id"),
        lit("image").as("kind"), encode(col("text"), "UTF-8").as("payload"))
      .unionByName(docs.select((col("doc_id") * 2 + 1).as("media_id"),
        lit("image").as("kind"),
        encode(concat(col("text"), lit("!!!!")), "UTF-8").as("payload")))
      .as[(Long, String, Array[Byte])]
    val pairs = Multimodal.pHashPairs(Multimodal.pHash(m))
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.forall(_._3 <= 10), "a pair above the Hamming cut escaped")
    val nDocs = docs.count()
    val planted = pairs.count { case (a, b, _) => a % 2 == 0 && b == a + 1 }
    // a 4-byte append flips <= 4 pixels directly plus a few mean-boundary
    // bits; the overwhelming majority must land under the cut
    assert(planted >= (nDocs * 9) / 10,
      s"only $planted of $nDocs planted variants recovered")
  }
}
