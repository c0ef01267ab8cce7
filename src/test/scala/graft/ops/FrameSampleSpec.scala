package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Frame sampling: the count law (capped 1-per-interval ladder under
  * the decoded duration), fingerprint agreement with the decoder seam
  * called directly, the video-only/empty-exclusion rules, monotone
  * frame offsets, and partitioning determinism.
  */
class FrameSampleSpec extends SparkSpecBase {

  private def items: Seq[(Long, String, Array[Byte])] = Seq(
    (1L, "video", "the quick brown fox jumps over the lazy dog " * 20),
    (2L, "video", "short clip"),
    (3L, "image", "not a video at all"),
    (4L, "audio", "also not a video"),
    (5L, "video", ""), // empty payload -> no rows
    (6L, "video", "x" * 500))
    .map { case (id, k, s) => (id, k, s.getBytes("UTF-8")) }

  private def run(parts: Int = 4) = {
    import spark.implicits._
    Multimodal.frameSample(items.toDS().repartition(parts))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getString(3), r.getInt(4)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("count law, fingerprints, and exclusions match the seam") {
    val got = run()
    val videoIds = Seq(1L, 2L, 6L)
    assert(got.map(_._1).distinct === videoIds)
    items.filter(i => videoIds.contains(i._1)).foreach { case (id, k, b) =>
      val dur = Multimodal.StubDecoder.decode(k, b).durationMs
      val n = math.min((dur - 1) / 1000 + 1, 8L).toInt
      val mine = got.filter(_._1 == id)
      assert(mine.map(_._2) === (0 until n), s"item $id")
      assert(mine.forall(_._5 == n))
      mine.foreach { case (_, i, ms, fp, _) =>
        assert(ms === i * 1000L)
        val frame = Multimodal.StubDecoder.frameAt(k, b, ms, 64)
        val ref = java.security.MessageDigest.getInstance("MD5")
          .digest(frame).map("%02x".format(_)).mkString
        assert(fp === ref, s"item $id frame $i")
      }
    }
  }

  test("frame offsets are monotone in the timestamp") {
    val (_, k, b) = items.head
    val dur = Multimodal.StubDecoder.decode(k, b).durationMs
    val starts = (0L until dur by 500).map { ms =>
      val f = Multimodal.StubDecoder.frameAt(k, b, ms, 4)
      (ms * b.length / dur).toInt -> f
    }
    assert(starts.map(_._1) === starts.map(_._1).sorted)
  }

  test("result is independent of partitioning") {
    assert(run(parts = 7) === run(parts = 2))
  }

  test("frameAt is total in ms: out-of-range timestamps clamp, not throw") {
    val (_, k, b) = items.head
    val dur = Multimodal.StubDecoder.decode(k, b).durationMs
    // at/past the duration: empty-or-edge slice (copyOfRange used to
    // throw from>to here — r10 ADVICE); negative: clamps to the start
    assert(Multimodal.StubDecoder.frameAt(k, b, dur, 8).length <= 8)
    assert(Multimodal.StubDecoder.frameAt(k, b, dur * 10, 8)
      .sameElements(Array.emptyByteArray))
    assert(Multimodal.StubDecoder.frameAt(k, b, -5L, 4)
      .sameElements(Multimodal.StubDecoder.frameAt(k, b, 0L, 4)))
  }
}
