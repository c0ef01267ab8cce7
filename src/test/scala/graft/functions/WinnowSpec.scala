package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.PropCheck
import org.scalacheck.Gen

/** The O(n) rolling-hash + monotonic-deque winnowing kernel must agree
  * with an independent brute-force reimplementation (per-gram Horner,
  * per-window scan-min, collapse) — the same definition the DuckDB oracle
  * uses — plus the winnowing containment guarantee. */
class WinnowSpec extends AnyFunSuite with PropCheck {

  private val M = 1000000007L
  private val B = 131L

  /** Brute force: Horner per gram, scan-min per window, collapse. */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    def horner(from: Int, until: Int): Long = {
      var h = 0L
      (from until until).foreach(i => h = (h * B + cps(i)) % M)
      h
    }
    if (cps.length < k) return Seq(horner(0, cps.length))
    val hs = (0 to cps.length - k).map(i => horner(i, i + k))
    val mins =
      if (hs.length <= w) Seq(hs.min)
      else (0 to hs.length - w).map(p => hs.slice(p, p + w).min)
    mins.foldLeft(List.empty[Long]) {
      case (acc, m) if acc.headOption.contains(m) => acc
      case (acc, m) => m :: acc
    }.reverse
  }

  private def winnow(s: String, k: Int = 8, w: Int = 8): Seq[Long] = {
    val a = GraftFnUtil.winnow(UTF8String.fromString(s), k, w)
    a.toLongArray().toSeq
  }

  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 400)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('.', ',', 'é')))
  } yield cs.mkString

  test("kernel equals the brute-force definition on random text") {
    forAll(text) { s =>
      assert(winnow(s) == reference(s, 8, 8))
      assert(winnow(s, 4, 3) == reference(s, 4, 3))
    }
  }

  test("short and empty texts fingerprint as one whole-text hash") {
    assert(winnow("") == Seq(0L))
    assert(winnow("ab") == Seq((('a'.toLong * B + 'b') % M)))
    assert(winnow("exactly8") == reference("exactly8", 8, 8))
  }

  test("winnowing guarantee: a long shared substring shares a fingerprint") {
    val shared = "the quick brown fox jumps over the lazy dog near the bank"
    val a = winnow("PREFIX A " + shared + " SUFFIX ONE")
    val b = winnow("totally different lead-in " + shared + " and another tail")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
  }

  test("unrelated texts rarely collide") {
    val a = winnow("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val b = winnow("one two three four five six seven eight nine ten eleven")
    assert(a.toSet.intersect(b.toSet).isEmpty)
  }
}
