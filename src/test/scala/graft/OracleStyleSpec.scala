package graft

import org.scalatest.funsuite.AnyFunSuite

/** String-level lint for the oracle SQL corpus — the authoring-time half of
  * `tools/oracle_style.md`. DuckDB widens `SUM` over integers to HUGEINT
  * (int128), which the driver's serialized-value hash distinguishes from
  * Spark's int64 even when the numbers match (the round-5 escape:
  * q_corpus_pack / q_corpus_budget_select / q_corpus_line_dedup). Rule:
  * any `SUM(` in the final top-level projection, and any windowed
  * `SUM(...) OVER` anywhere (cumulative sums poison derived columns
  * downstream), must be enclosed in a `CAST(...)`. `COUNT` is exempt —
  * DuckDB's COUNT is always BIGINT. The runtime half (actual result types
  * via `con.sql(q).types`) lives in `tools/verify_local.py`.
  */
class OracleStyleSpec extends AnyFunSuite {

  private val sumRe = """(?i)(?<![A-Za-z0-9_])SUM\s*\(""".r

  /** The last `SELECT ... FROM` at paren depth 0 — the emitted projection. */
  private def finalProjection(sql: String): String = {
    val up = sql.toUpperCase
    var depth = 0
    var lastSel = -1
    for (i <- sql.indices) sql(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case _ =>
        if (depth == 0 && up.startsWith("SELECT", i) &&
          (i == 0 || !up(i - 1).isLetterOrDigit)) lastSel = i
    }
    assert(lastSel >= 0, "no top-level SELECT found")
    depth = 0
    var end = sql.length
    var j = lastSel
    while (j < sql.length && end == sql.length) {
      sql(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith("FROM", j) &&
            !up(j - 1).isLetterOrDigit &&
            (j + 4 >= sql.length || !up(j + 4).isLetterOrDigit)) end = j
      }
      j += 1
    }
    sql.substring(lastSel, end)
  }

  /** Is the token at `pos` inside some enclosing `CAST( ... )`? Walks
    * outward through every enclosing paren and checks the identifier
    * before each. */
  private def insideCast(s: String, pos: Int): Boolean = {
    var depth = 0
    var i = pos - 1
    while (i >= 0) {
      s(i) match {
        case ')' => depth += 1
        case '(' =>
          if (depth == 0) {
            var k = i - 1
            while (k >= 0 && s(k).isWhitespace) k -= 1
            var st = k
            while (st >= 0 && (s(st).isLetterOrDigit || s(st) == '_')) st -= 1
            if (s.substring(st + 1, k + 1).equalsIgnoreCase("CAST")) return true
          } else depth -= 1
        case _ =>
      }
      i -= 1
    }
    false
  }

  private def violations(sql: String): Seq[String] = {
    val proj = finalProjection(sql)
    val inFinal = sumRe.findAllMatchIn(proj).toSeq
      .filterNot(m => insideCast(proj, m.start))
      .map(m => s"bare SUM in final projection @${m.start}: " +
        proj.slice(m.start, math.min(m.start + 40, proj.length)).trim)
    val windowed = sumRe.findAllMatchIn(sql).toSeq.filter { m =>
      // SUM( ... ) OVER — find the matching close paren, then peek
      var depth = 0
      var i = sql.indexOf('(', m.start)
      var close = -1
      while (i < sql.length && close < 0) {
        sql(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      close > 0 && sql.drop(close + 1).dropWhile(_.isWhitespace)
        .toUpperCase.startsWith("OVER")
    }.filterNot(m => insideCast(sql, m.start))
      .map(m => s"uncast windowed SUM @${m.start}: " +
        sql.slice(m.start, math.min(m.start + 40, sql.length)).trim)
    inFinal ++ windowed
  }

  test("lint machinery: flags an intentionally uncast SUM") {
    val bad = "SELECT source, SUM(n) AS total FROM t GROUP BY source"
    assert(violations(bad).exists(_.contains("bare SUM")))
    val badWin =
      "WITH c AS (SELECT SUM(n) OVER (ORDER BY id) AS cum FROM t) " +
        "SELECT id, cum FROM c"
    assert(violations(badWin).exists(_.contains("windowed SUM")))
    val ok = "SELECT source, CAST(SUM(n) AS BIGINT) AS total FROM t GROUP BY 1"
    assert(violations(ok).isEmpty)
    val okWin =
      "WITH c AS (SELECT CAST(SUM(n) OVER (ORDER BY id) AS BIGINT) AS cum " +
        "FROM t) SELECT id, cum FROM c"
    assert(violations(okWin).isEmpty)
  }

  test("every oracle SQL casts SUM at the SELECT boundary") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => violations(sql).map(v => s"$name: $v")
    }
    assert(bad.isEmpty, "oracle style violations (see tools/oracle_style.md):\n" +
      bad.mkString("\n"))
  }
}
