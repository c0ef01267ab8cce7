package graft.enrich

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropCheck

/** Property tests for the pure enrichment machinery added in round 2. */
class EnrichPropSpec extends AnyFunSuite with PropCheck {

  private val field = Gen.asciiPrintableStr.map(_.take(60))

  test("pythonFormat: substitution + brace escapes for arbitrary field values") {
    val tmpl = "A {x} B {{lit}} C {y} D {{}} E"
    forAll(Gen.zip(field, field)) { case (x, y) =>
      val got = Prompts.pythonFormat(tmpl, Map("x" -> x, "y" -> y))
      assert(got == s"A $x B {lit} C $y D {} E")
    }
  }

  test("pythonFormat: length is base plus field lengths (the oracle identity)") {
    val tmpl = "head {a}{a} mid {b} tail {{x}}"
    val base = Prompts.pythonFormat(tmpl,
      Map("a" -> "", "b" -> "")).length
    forAll(Gen.zip(field, field)) { case (a, b) =>
      val got = Prompts.pythonFormat(tmpl, Map("a" -> a, "b" -> b))
      assert(got.length == base + 2 * a.length + b.length)
    }
  }

  test("pythonFormat rejects unknown fields") {
    intercept[IllegalArgumentException] {
      Prompts.pythonFormat("{missing}", Map("x" -> "1"))
    }
  }

  test("retry machine: attempts bounded, sleep schedule shape") {
    val outcomes = Gen.listOfN(6, Gen.oneOf("api", "no_tool", "bad", "good"))
    forAll(outcomes) { script =>
      var i = 0
      val r = ToolRetry.run(
        Seq(ChatMessage("system", "s"), ChatMessage("user", "u")),
        "t", Seq("f"), _ => {
          val s = script(math.min(i, script.length - 1)); i += 1
          s match {
            case "api" => ToolRetry.ApiError("x")
            case "no_tool" => ToolRetry.NoToolCall
            case "bad" => ToolRetry.ToolCall("t", "{")
            case "good" => ToolRetry.ToolCall("t", """{"f": "v"}""")
          }
        })
      assert(r.attempts <= ToolRetry.MaxAttempts)
      val firstGood = script.indexOf("good")
      if (firstGood >= 0 && firstGood < ToolRetry.MaxAttempts) {
        assert(r.args.contains(Map("f" -> "v")))
        assert(r.attempts == firstGood + 1)
        assert(r.sleptSec.length == firstGood)
      } else {
        assert(r.args.isEmpty)
        assert(r.sleptSec.length == ToolRetry.MaxAttempts)
      }
      // every sleep is the flat delay or an exponential API backoff step
      r.sleptSec.foreach(s => assert(
        Seq(3, 6, 12, 24).contains(s), s"unexpected sleep $s"))
    }
  }

  test("stub codec: split-merge round-trips arbitrary byte arrays") {
    import graft.ops.BinaryDocs
    val codec = new BinaryDocs.StubCodec(pageSize = 7)
    val bytesGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    forAll(bytesGen) { bytes =>
      val pages = codec.split(bytes)
      assert(pages.forall(_.length <= 7))
      assert(pages.dropRight(1).forall(_.length == 7))
      assert(codec.merge(pages).sameElements(bytes))
      assert(pages.length == (bytes.length + 6) / 7)
    }
  }
}
