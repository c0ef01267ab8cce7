package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.PropCheck
import org.scalacheck.Gen

/** T9/T10 invariants: min-section guarantee, dense ids, boundary types. */
class NaturalSectionsSpec extends AnyFunSuite with PropCheck {

  test("headers and tables start new sections") {
    val content =
      "intro paragraph text here\n\n# Header One\nbody of one\n\n| a | b |\n| 1 | 2 |"
    val s = NaturalSections.detectNaturalBoundaries(content)
    assert(s.length == 3)
    assert(s(1).startsWith("# Header One"))
    assert(s(2).startsWith("| a | b |"))
  }

  test("list start after prose begins a new section") {
    val content = "some prose paragraph\n\n- item one\n- item two"
    val s = NaturalSections.detectNaturalBoundaries(content)
    assert(s.length == 2)
    assert(s(1).startsWith("- item one"))
  }

  test("splitPage guarantees minimum sections with dense ids") {
    val prose = "One sentence here. Another sentence follows. A third one. And a fourth."
    val out = NaturalSections.splitPage(prose, minSections = 2)
    assert(out.length >= 2)
    assert(out.map(_._1) == (1 to out.length))
  }

  test("empty page yields single empty section") {
    assert(NaturalSections.splitPage("") == Seq((1, "")))
    assert(NaturalSections.splitPage("   ") == Seq((1, "")))
  }

  test("forceSplit by sentences distributes evenly") {
    val content = (1 to 7).map(i => s"Sentence number $i.").mkString(" ")
    val out = NaturalSections.forceSplit(content, 3)
    assert(out.length == 3)
    assert(out.map(_._1) == Seq(1, 2, 3))
    // 7 sentences over 3 sections -> 3/2/2
    assert(out.head._2.split("(?<=\\.)\\s+").length == 3)
  }

  test("forceSplit char path backtracks to whitespace") {
    val content = "abcdefghij " * 30 // no sentence ends
    val out = NaturalSections.forceSplit(content.trim, 3)
    assert(out.length == 3)
    out.dropRight(1).foreach(s => assert(!s._2.endsWith(" ")))
  }

  private val pageGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    blocks <- Gen.listOfN(n, Gen.oneOf(
      "plain paragraph with words. More words follow here.",
      "# A Header\nheader body",
      "- list item a\n- list item b",
      "Short."))
  } yield blocks.mkString("\n\n")

  test("property: sections non-empty, ids dense, at least min") {
    forAll(pageGen) { page =>
      val out = NaturalSections.splitPage(page, 2)
      assert(out.nonEmpty)
      assert(out.map(_._1) == (1 to out.length))
      if (page.trim.nonEmpty) {
        assert(out.length >= 2 || out.forall(_._2.nonEmpty))
        out.foreach { case (_, s) => assert(s.nonEmpty) }
      }
    }
  }
}
