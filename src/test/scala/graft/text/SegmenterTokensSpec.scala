package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.PropCheck
import org.scalacheck.Gen

/** T1/T2/T3/T4 invariants and golden values derived by executing the
  * reference formulas by hand. */
class SegmenterTokensSpec extends AnyFunSuite with PropCheck {

  test("estimateA golden values") {
    assert(Tokens.estimateA("") == 0)
    assert(Tokens.estimateA(null) == 0)
    // 35 chars: int(35/3.5)=10, clamp [3,17] → 10
    assert(Tokens.estimateA("a" * 35) == 10)
    // tiny string: int(2/3.5)=0 clamped up to 2/10=0 → 0? no: min=0,max=1 → 0
    assert(Tokens.estimateA("ab") == 0)
    assert(Tokens.estimateA("a" * 100) == 28)
  }

  test("estimateB golden values") {
    assert(Tokens.estimateB("") == 0)
    // "the cat sat" → words the(1) cat(1) sat(1) = 3.0; char est 11/4=2.75
    // final = 3*0.7 + 2.75*0.3 = 2.1 + 0.825 = 2.925 → 2
    assert(Tokens.estimateB("the cat sat") == 2)
    // "consolidated" → len 12 → 12/4.5 = 2.667; char 12/4=3 → 2.667*.7+3*.3=2.767 → 2
    assert(Tokens.estimateB("consolidated") == 2)
  }

  test("estimators are monotone-ish: never negative, bounded by length") {
    forAll(Gen.asciiPrintableStr) { s =>
      val a = Tokens.estimateA(s)
      val b = Tokens.estimateB(s)
      assert(a >= 0 && b >= 0)
      assert(a <= math.max(1, s.length))
    }
  }

  private val longText: Gen[String] =
    Gen.chooseNum(100, 2000).map(n =>
      (1 to n).map(i => s"word$i sample text. ").mkString)

  test("T3: short text is one segment, long text partitions exactly") {
    forAll(longText) { t =>
      val segs = Segmenter.segmentChapter(t, limit = 300, buffer = 0)
      assert(segs.nonEmpty)
      // chapter variant slices at raw offsets: exact partition unless a
      // blank segment was dropped (generator emits no blank runs)
      assert(segs.mkString("") == t)
      if (Tokens.estimateA(t) <= 1000) assert(segs == Seq(t))
    }
  }

  test("T4: sentence-aware cuts land after '. ' or newline") {
    forAll(longText) { t =>
      val segs = Segmenter.segmentSection(t, limit = 300, buffer = 0)
      assert(segs.mkString("") == t)
      segs.dropRight(1).foreach { s =>
        assert(s.endsWith(".") || s.endsWith("\n") || s.endsWith(" "),
          s"segment ends with '${s.takeRight(3)}'")
      }
    }
  }

  test("T3 honors the 1000-token floor on available budget") {
    val t = "lorem ipsum dolor sit amet. " * 400 // ~ 3200 tokens(A)
    val segs = Segmenter.segmentChapter(t, limit = 100, buffer = 90)
    // available = max(1000, 10) = 1000 → expect ceil(tokens/1000) segments
    val expected = (Tokens.estimateA(t) + 999) / 1000
    assert(segs.length == expected)
  }
}
