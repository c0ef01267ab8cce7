package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.PropCheck
import org.scalacheck.Gen

/** TokenSpans must reproduce Tokens.estimateB on EVERY slice bit-for-bit —
  * the chunker's one-pass index is only admissible because these agree
  * (the parity suite pins the chunker's outputs against the reference's
  * Python, which rescans each remaining suffix). */
class TokenSpansSpec extends AnyFunSuite with PropCheck {

  private val piece: Gen[String] = Gen.frequency(
    5 -> Gen.oneOf("alpha", "beta", "consolidated", "a", "ab", "abc", "abcd",
      "abcdefg", "abcdefgh", "impairment1", "x_y", "12345"),
    2 -> Gen.oneOf(" ", "  ", "\n", "\n\n", "\t"),
    2 -> Gen.oneOf(".", ", ", "; ", "!?", "—", "…", "(", ")"),
    1 -> Gen.oneOf("<!-- PageHeader PageNumber=\"3\" PageReference=\"3-r\" -->",
      "## Heading", "- item"))

  private val text: Gen[String] =
    Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString)

  test("estimateB(from, until) equals a fresh scan of the slice") {
    val cases = for {
      t <- text
      a <- Gen.chooseNum(0, 400)
      b <- Gen.chooseNum(0, 400)
    } yield (t, a, b)
    forAll(cases) { case (t, a, b) =>
      val spans = TokenSpans(t)
      val from = math.min(a, t.length)
      val until = math.min(math.max(b, from), t.length)
      assert(spans.estimateB(from, until) ==
        Tokens.estimateB(t.substring(from, until)))
      assert(spans.estimateBFrom(from) == Tokens.estimateB(t.substring(from)))
    }
  }

  test("full-string estimate matches, including empty and whitespace-only") {
    for (t <- Seq("", "   ", "\n\n", "word", "a b c", "x" * 5000))
      assert(TokenSpans(t).estimateBFrom(0) == Tokens.estimateB(t))
  }

  test("a cut inside a word weighs the truncated pieces like a fresh scan") {
    val t = "consolidated impairment"
    val spans = TokenSpans(t)
    for (cut <- 0 to t.length) {
      assert(spans.estimateB(0, cut) == Tokens.estimateB(t.substring(0, cut)))
      assert(spans.estimateBFrom(cut) == Tokens.estimateB(t.substring(cut)))
    }
  }

  test("chunkWithTokens counts equal estimateB of each emitted chunk") {
    forAll(text) { t =>
      Chunker.chunkWithTokens(t).foreach { case (c, n) =>
        assert(n == Tokens.estimateB(c))
      }
    }
  }
}
