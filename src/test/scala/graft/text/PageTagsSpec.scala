package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.PropCheck
import org.scalacheck.Gen

/** T11–T13/G6/W4 invariants: embed↔extract round trips, clean strips all
  * tags, the range automaton covers header..footer spans in order. */
class PageTagsSpec extends AnyFunSuite with PropCheck {

  private val pageContent: Gen[String] = Gen.oneOf(
    "Plain paragraph text for the page.",
    "# Heading\n\nBody text with words.",
    "Line one\n\nLine two\n\nLine three",
    "")

  private val pagesGen: Gen[Seq[(Option[Int], String, String)]] =
    Gen.chooseNum(1, 12).flatMap { n =>
      Gen.sequence[Seq[String], String]((1 to n).map(_ => pageContent)).map { cs =>
        cs.zipWithIndex.map { case (c, i) => (Some(i + 1): Option[Int], s"ref-${i + 1}", c) }
      }
    }

  test("embed then extractMetadata sees pages 1..n") {
    forAll(pagesGen) { pages =>
      val embedded = PageTags.embed(pages)
      val (start, end, count) = PageTags.extractMetadata(embedded)
      assert(start.contains(1))
      assert(end.contains(pages.length))
      assert(count == pages.length)
    }
  }

  test("clean removes every tag and the original text survives") {
    forAll(pagesGen) { pages =>
      val embedded = PageTags.embed(pages)
      val cleaned = PageTags.clean(embedded)
      assert(PageTags.extractTags(cleaned).isEmpty)
      pages.foreach { case (_, _, c) =>
        val t = PageTags.clean(c)
        if (t.nonEmpty) assert(cleaned.contains(t.linesIterator.next()))
      }
    }
  }

  test("extractTags returns position-sorted header/footer pairs") {
    forAll(pagesGen) { pages =>
      val tags = PageTags.extractTags(PageTags.embed(pages))
      assert(tags.length == pages.length * 2)
      assert(tags.map(_.position) == tags.map(_.position).sorted)
      assert(tags.grouped(2).forall(g =>
        g.head.tagType == "header" && g(1).tagType == "footer" &&
          g.head.pageNumber == g(1).pageNumber))
    }
  }

  test("buildPageRanges: one range per page, ordered, non-overlapping") {
    forAll(pagesGen) { pages =>
      val content = PageTags.embed(pages)
      val (ranges, refs) = PageTags.buildPageRanges(PageTags.extractTags(content), content)
      assert(ranges.map(_.pageNumber) == (1 to pages.length).toSeq)
      assert(refs == pages.map { case (n, r, _) => n.get -> r }.toMap)
      ranges.sliding(2).foreach {
        case Seq(a, b) => assert(a.end < b.start)
        case _ => ()
      }
    }
  }

  test("footer-without-header still closes a range (reference W4 edge)") {
    val content = "intro text\n" +
      "<!-- PageFooter PageNumber=\"7\" PageReference=\"r7\" -->\nrest"
    val (ranges, _) = PageTags.buildPageRanges(PageTags.extractTags(content), content)
    assert(ranges.length == 1)
    assert(ranges.head.pageNumber == 7)
    assert(ranges.head.start == 0)
  }

  test("header-without-footer runs to end of content (reference W4 edge)") {
    val content = "<!-- PageHeader PageNumber=\"3\" PageReference=\"r3\" -->\ntail text"
    val (ranges, _) = PageTags.buildPageRanges(PageTags.extractTags(content), content)
    assert(ranges == Seq(PageTags.PageRange(0, content.length - 1, 3)))
  }

  test("htmlEscape matches python html.escape(quote=True)") {
    assert(PageTags.htmlEscape("""a&b<c>d"e'f""") == "a&amp;b&lt;c&gt;d&quot;e&#x27;f")
  }
}
