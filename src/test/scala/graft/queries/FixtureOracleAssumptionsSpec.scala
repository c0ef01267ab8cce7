package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.text.FixtureCorpus

/** The FixtureOracleSql mirrors rest on corpus and generator invariants;
  * this spec pins them so a future testdata regeneration or generator
  * edit fails HERE, loudly, instead of as an opaque oracle hash mismatch.
  *
  * Corpus invariants (drive the closed-form section/chunker mirrors):
  *  - words are pure lowercase a-z: no commas/semicolons (comma breaks
  *    can't occur), no uppercase (every capitalized boundary word is a
  *    sentence break), no '#'/'<' (no fake headings or tags), no
  *    whitespace beyond the split separators.
  * Generator invariants:
  *  - the `emitted % 40` paragraph branch is dead code: a page body is
  *    one unbroken line (after-iteration counts skip all multiples of 8);
  *  - word emission overshoots to total+1 exactly when total % 8 == 0.
  */
class FixtureOracleAssumptionsSpec extends SparkSpecBase {

  test("corpus words are pure lowercase a-z at the spec scale") {
    val bad = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .where(col("text").isNull ||
        col("text").rlike("[^a-z ]") || !col("text").rlike("^[a-z]"))
      .count()
    assert(bad == 0L, s"$bad docs violate the lowercase-words invariant")
  }

  test("page bodies are single lines: the %40 paragraph branch is dead") {
    // newlines in a page may only be: after the heading ("\n\n"), the
    // final ".\n", and the even-page list block — never inside the body
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 80,
      "a bb ccc dddd eeeee ffffff ggggggg " * 40,
      "word " * 700)
    for (d <- 0L to 27L; t <- texts) {
      FixtureCorpus.pages(d, t).foreach { p =>
        val body = p.content
          .split("\n\n", 2)(1) // drop the heading
        val beforeList = body.split("\n\n", 2)(0) // drop a list block
        assert(!beforeList.dropRight(2).contains("\n"),
          s"doc $d page ${p.page_number}: newline inside the body")
      }
    }
  }

  test("capitalized-boundary count matches the closed form ⌊(E−1)/8⌋") {
    // caps land at emission positions e ≡ 1 (mod 8), e > 1, e ≤ E with
    // E = total + (total % 8 == 0): each contributes exactly ONE uppercase
    // char to an otherwise-lowercase page (the mirror's overshoot rule)
    for (d <- 0L to 34L) {
      val total = if (d % 7 == 0) 700 else 60 + (d % 5).toInt * 30
      val e = total + (if (total % 8 == 0) 1 else 0)
      val p = FixtureCorpus.pages(d, "one two three four five six").head
      val body = p.content.split("\n\n", 2)(1)
      val nUpper = body.count(_.isUpper)
      assert(nUpper == (e - 1) / 8,
        s"doc $d: $nUpper caps, expected ${(e - 1) / 8} (total $total)")
    }
  }
}
