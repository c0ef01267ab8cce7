package graft.ops

import org.scalacheck.Gen
import graft.{PropCheck, SparkSpecBase}

/** Property pin: on random small corpora over a tight alphabet (dense
  * pair collisions, frequent ties, heavy self-overlap), the distributed
  * BPE trainer must produce exactly the reference trainer's merge
  * table AND final per-word symbol counts. The tight alphabet is the
  * adversarial region — "aaaa"-style words exercise the greedy
  * non-overlap rule, and equal pair counts exercise the lexicographic
  * tie rule on every round. */
class BpePropSpec extends SparkSpecBase with PropCheck {
  import spark.implicits._

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
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    (merges.result(), seg.map { case (w, s) => w -> s.length })
  }

  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, wordGen))

  test("random tight-alphabet corpora: trainer ≡ reference, merges and vocab") {
    forAll(corpusGen, n = 12) { ws =>
      val text = ws.mkString(" ")
      val docs = Seq((0L, text)).toDF("doc_id", "text")
      val (merges, vocab) = Bpe.train(docs, "text", 3)
      val counts = ws.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
      val (want, wantVocab) = refTrain(counts, 3)
      assert(merges.map(m => (m.a, m.b, m.count)) == want,
        s"corpus='$text'")
      val gotVocab = vocab.collect()
        .map(r => r.getString(0) -> r.getInt(2)).toMap
      assert(gotVocab == wantVocab, s"corpus='$text'")
    }
  }
}
