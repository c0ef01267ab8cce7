package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** T5/T6/T7/W12 semantics pinned by hand-derived golden cases from the
  * reference (stage_02_section_processing.py). */
class SectionsSpec extends AnyFunSuite {

  private def mk(title: String, level: Int, tokens: Int,
      start: Option[Int] = None, end: Option[Int] = None): Sections.Section =
    Sections.Section(title, level, s"content of $title", tokens, "",
      start, end, PageTags.pageCount(start, end))

  test("splitByHeadingLevel: no headings → single Content section") {
    val s = Sections.splitByHeadingLevel("plain text, no headings", 1)
    assert(s.length == 1)
    assert(s.head.title == "Content")
    assert(s.head.startPage.isEmpty && s.head.pageCount == 0)
  }

  test("splitByHeadingLevel: intro pinned to page 1, sections carry tag pages") {
    val content =
      """intro paragraph before any heading
        |# First
        |<!-- PageHeader PageNumber="4" PageReference="r" -->
        |first body
        |<!-- PageFooter PageNumber="4" PageReference="r" -->
        |# Second
        |second body""".stripMargin
    val s = Sections.splitByHeadingLevel(content, 1)
    assert(s.map(_.title) == Seq("Introduction", "First", "Second"))
    assert(s.head.startPage.contains(1))
    assert(s.head.endPage.isEmpty) // no tags in intro → end stays None
    assert(s(1).startPage.contains(4) && s(1).endPage.contains(4))
  }

  test("heading boundary pulls back over an immediately-preceding page tag") {
    val content =
      "# A\nbody a\n<!-- PageHeader PageNumber=\"9\" PageReference=\"r9\" -->\n# B\nbody b"
    val s = Sections.splitByHeadingLevel(content, 1)
    assert(s.length == 2)
    // the tag belongs to section B, not A
    assert(s(1).content.startsWith("<!-- PageHeader PageNumber=\"9\""))
    assert(s(1).startPage.contains(9))
    assert(!s.head.content.contains("PageHeader"))
  }

  test("pullback does NOT happen when text sits between tag and heading") {
    val content =
      "# A\nbody a\n<!-- PageHeader PageNumber=\"9\" PageReference=\"r9\" -->\ntrailing words\n# B\nbody b"
    val s = Sections.splitByHeadingLevel(content, 1)
    assert(s.head.content.contains("PageHeader"))
    assert(s(1).content.startsWith("# B"))
  }

  test("recursiveSplit keeps sections within the page threshold untouched") {
    val sec = mk("T", 1, 100, Some(1), Some(3))
    val out = Sections.recursiveSplit(sec, 1)
    assert(out == Seq(sec.copy(splittingLevel = 1)))
  }

  test("recursiveSplit deepens a >3-page section at the next heading level") {
    val content =
      """## Sub1
        |<!-- PageHeader PageNumber="1" PageReference="r" -->
        |a
        |<!-- PageFooter PageNumber="1" PageReference="r" -->
        |## Sub2
        |<!-- PageHeader PageNumber="5" PageReference="r" -->
        |b
        |<!-- PageFooter PageNumber="5" PageReference="r" -->""".stripMargin
    val sec = Sections.Section("Top", 1, content, 100, "", Some(1), Some(5), 5)
    val out = Sections.recursiveSplit(sec, 1)
    assert(out.length == 2)
    assert(out.forall(_.level == 2))
    assert(out.map(_.splittingLevel) == Seq(2, 2))
  }

  test("mergeSmall: small section joins previous sibling when sum fits") {
    val a = mk("A", 1, 400); val b = mk("B", 1, 100)
    val out = Sections.mergeSmall(Seq(a, b))
    assert(out.length == 1)
    assert(out.head.tokenCount == 500)
    assert(out.head.content == a.content + "\n" + b.content)
    assert(out.head.sectionNumber == 1)
  }

  test("mergeSmall: prev-merge refused when current is shallower than prev") {
    val a = mk("A", 2, 400); val b = mk("B", 1, 100); val c = mk("C", 1, 300)
    val out = Sections.mergeSmall(Seq(a, b, c))
    // b (level 1) cannot merge into a (level 2); merges forward into c
    assert(out.length == 2)
    assert(out(1).tokenCount == 400)
    assert(out(1).content == b.content + "\n" + c.content)
  }

  test("mergeSmall: no merge when sums exceed max") {
    val a = mk("A", 1, 700); val b = mk("B", 1, 100); val c = mk("C", 1, 700)
    val out = Sections.mergeSmall(Seq(a, b, c))
    assert(out.length == 3)
    assert(out.map(_.sectionNumber) == Seq(1, 2, 3))
  }

  test("mergeSmall: page bounds become min/max across merged sections") {
    val a = mk("A", 1, 400, Some(3), Some(5))
    val b = mk("B", 1, 100, Some(6), Some(8))
    val out = Sections.mergeSmall(Seq(a, b))
    assert(out.head.startPage.contains(3))
    assert(out.head.endPage.contains(8))
    assert(out.head.pageCount == 6)
  }

  test("hierarchyString builds truncating breadcrumbs") {
    val secs = Seq(
      mk("Top", 1, 300),
      mk("Child", 2, 300),
      mk("Grand", 3, 300),
      mk("Top2", 1, 300),
      mk("Child2", 2, 300))
    assert(Sections.hierarchyString(secs, 2) == "Top > Child > Grand")
    // Top2 resets deeper levels: Child2 sees Top2, not Child
    assert(Sections.hierarchyString(secs, 4) == "Top2 > Child2")
  }

  test("hierarchicalSplit numbers sections densely from 1") {
    val pages = (1 to 4).map(p =>
      (Some(p): Option[Int], s"r$p", s"# H$p\nbody $p text"))
    val out = Sections.hierarchicalSplit(pages, "Ch")
    assert(out.map(_.sectionNumber) == (1 to out.length).toSeq)
  }
}
