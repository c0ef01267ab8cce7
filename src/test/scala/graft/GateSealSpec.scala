package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical enforcement of the no-late-landing rule (r11 VERDICT #2:
  * product code landed after the recorded close-out gate for the third
  * consecutive round — PlansSyncSpec pins only the QUERY surface, so
  * non-query source was unguarded). `tools/close_out.sh` runs the full
  * suite + two-SF correctness gate and seals GATE.json at that HEAD;
  * from then on, any COMMITTED source change (src/, build.sbt,
  * project/, tools/) makes this spec fail until the gate reruns and
  * re-seals. Consequences, by state:
  *   - no GATE.json, or sealed=false: pass (round in progress).
  *   - source files dirty in the working tree: pass (work under way is
  *     policed at COMMIT time, once it lands and the suite runs clean).
  *   - sealed + clean source tree + only non-source paths differ from
  *     the sealed commit: pass (artifact commits — recorded bench/
  *     verdict JSON, markdown, the driver's snapshot records — never
  *     trip the seal).
  *   - sealed + clean source tree + a SOURCE path differs: FAIL. The
  *     fix is never to hand-edit GATE.json: rerun tools/close_out.sh
  *     (re-verifying the new HEAD and re-sealing there), or, at round
  *     start, flip sealed to false in the same commit as the first
  *     source change (the unseal is itself a visible, committed act).
  */
class GateSealSpec extends AnyFunSuite {

  private def repoRoot: Option[java.io.File] = {
    var d = new java.io.File(".").getCanonicalFile
    while (d != null && !new java.io.File(d, ".git").exists())
      d = d.getParentFile
    Option(d)
  }

  private def git(root: java.io.File, args: String*): Option[String] =
    try {
      val p = new ProcessBuilder(("git" +: args): _*)
        .directory(root).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8")
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: Throwable => None }

  test("no source commit lands after a sealed gate") {
    val root = repoRoot.getOrElse(cancel("not inside a git repository"))
    val gateFile = new java.io.File(root, "GATE.json")
    if (!gateFile.exists()) cancel("no GATE.json — round in progress")
    val gate = new String(
      java.nio.file.Files.readAllBytes(gateFile.toPath), "UTF-8")
    val isSealed =
      """"sealed"\s*:\s*true""".r.findFirstIn(gate).isDefined
    if (!isSealed) cancel("GATE.json is unsealed — round in progress")
    val commit = """"commit"\s*:\s*"([0-9a-f]{7,40})"""".r
      .findFirstMatchIn(gate).map(_.group(1))
      .getOrElse(fail("GATE.json is sealed but carries no commit hash"))

    val sourcePaths = Seq("src", "build.sbt", "project", "tools")
    val dirty = git(root, ("status" +: "--porcelain" +: "--" +:
      sourcePaths): _*)
      .getOrElse(cancel("git status unavailable"))
    if (dirty.trim.nonEmpty)
      cancel("source working tree is dirty — seal is policed at commit time")

    val diff = git(root, ("diff" +: "--name-only" +: s"$commit..HEAD" +:
      "--" +: sourcePaths): _*)
      .getOrElse(fail(s"GATE.json seals commit $commit but git cannot " +
        "diff it against HEAD — the sealed commit must exist"))
    val landed = diff.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    assert(landed.isEmpty,
      s"SOURCE landed after the sealed gate ($commit): " +
        s"${landed.mkString(", ")} — rerun tools/close_out.sh to re-verify " +
        "and re-seal at the new HEAD (never hand-edit GATE.json)")
  }
}
