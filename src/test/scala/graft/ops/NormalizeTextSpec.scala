package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.functions.GraftFunctions

/** NFC expression + normalizeText composite: composition, the
  * already-normalized fast path, control/format strip, collapse, and
  * SQL-path registration. All non-ASCII is written as unicode escapes —
  * composed vs decomposed forms are invisible in source text. */
class NormalizeTextSpec extends SparkSpecBase {

  private def normOf(s: String): String = {
    import spark.implicits._
    Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n"))
      .collect().head.getString(0)
  }

  private def nfcOf(s: String): String = {
    import spark.implicits._
    Seq(Tuple1(s)).toDF("t").select(GraftFunctions.nfc(col("t")).as("n"))
      .collect().head.getString(0)
  }

  test("NFC composes combining sequences and is idempotent") {
    // e + COMBINING ACUTE (U+0301) -> U+00E9
    assert(nfcOf("cafe\u0301") == "caf\u00e9")
    assert(nfcOf("caf\u00e9") == "caf\u00e9")
    assert(nfcOf("") == "")
    // Hangul jamo compose too (a non-Latin NFC case)
    assert(nfcOf("\u1100\u1161") == "\uac00")
    assert(nfcOf("plain ascii") == "plain ascii")
  }

  test("normalizeText strips controls/format chars, collapses, trims") {
    // TAB and BEL are Cc -> spaces; runs collapse; ends trim
    assert(normOf("  a\tb\u0007c  ") == "a b c")
    // ZERO WIDTH JOINER (U+200D) is Cf
    assert(normOf("x\u200dy") == "x y")
    assert(normOf("plain ascii text") == "plain ascii text")
    // composition happens inside the same projection
    assert(normOf("cafe\u0301 ok") == "caf\u00e9 ok")
  }

  test("null propagates; SQL path resolves graft_nfc") {
    import spark.implicits._
    GraftFunctions.install(spark)
    Seq(Tuple1(null.asInstanceOf[String]), Tuple1("cafe\u0301"))
      .toDF("t").createOrReplaceTempView("norm_in")
    val rows = spark.sql(
      "SELECT graft_nfc(t) AS n FROM norm_in ORDER BY n NULLS FIRST")
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getString(0) == "caf\u00e9")
  }
}
