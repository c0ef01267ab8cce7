package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.PropCheck
import org.scalacheck.Gen

/** T8 invariants (SURVEY §5): chunks reassemble exactly, numbering is
  * implicit in sequence order, no cut lands inside a protected page tag,
  * and single-chunk short-circuit at maxTokens. */
class ChunkerSpec extends AnyFunSuite with PropCheck {

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "consolidated", "revenue", "impairment", "lease")

  private val sentence: Gen[String] =
    Gen.chooseNum(4, 12).flatMap(n => Gen.listOfN(n, word))
      .map(ws => ws.mkString(" ").capitalize + ". ")

  private val paragraph: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, sentence)).map(_.mkString)

  private val pageTag: Gen[String] =
    Gen.chooseNum(1, 99).map(n =>
      s"""<!-- PageHeader PageNumber="$n" PageReference="$n-r" -->\n""")

  private val block: Gen[String] = Gen.frequency(
    6 -> paragraph.map(_ + "\n\n"),
    2 -> Gen.chooseNum(2, 4).map(l => "#" * 2 + " Heading text\n\n"),
    1 -> pageTag,
    1 -> Gen.const("- item one\n- item two\n\n"))

  private val document: Gen[String] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, block)).map(_.mkString)

  test("chunks reassemble to the exact input") {
    forAll(document) { doc =>
      val chunks = Chunker.chunk(doc)
      assert(chunks.mkString("") == doc)
    }
  }

  test("short content is a single chunk") {
    forAll(sentence) { s =>
      if (Tokens.estimateB(s) <= 750) assert(Chunker.chunk(s) == Seq(s))
    }
  }

  test("empty content gives no chunks") {
    assert(Chunker.chunk("") == Nil)
    assert(Chunker.chunk(null) == Nil)
  }

  test("no cut position falls inside a protected zone") {
    forAll(document) { doc =>
      val zones = Chunker.protectedZones(doc)
      val chunks = Chunker.chunk(doc)
      var pos = 0
      chunks.dropRight(1).foreach { c =>
        pos += c.length
        // pos is a cut point; it must not be strictly inside any tag
        assert(!zones.exists(z => z.start < pos && pos < z.end),
          s"cut at $pos inside a page-tag zone")
      }
    }
  }

  test("multi-chunk outputs keep every non-final chunk under hard-max chars window") {
    forAll(document) { doc =>
      val chunks = Chunker.chunk(doc)
      if (chunks.length > 1) {
        // each non-final cut is bounded by the search window max
        chunks.dropRight(1).foreach { c =>
          assert(c.length <= (800 * 4.0).toInt + 1)
        }
      }
    }
  }

  test("known layout: heading break preferred over comma") {
    val body = ("word " * 700).trim   // ~700 tokens of filler
    val doc = body + "\n## Later Heading\n" + body
    val chunks = Chunker.chunk(doc)
    assert(chunks.length >= 2)
    assert(chunks.mkString("") == doc)
  }
}
