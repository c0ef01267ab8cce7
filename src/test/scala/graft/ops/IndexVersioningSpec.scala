package graft.ops

import graft.SparkSpecBase

/** The publish protocol's concurrency seam (r10 ADVICE): a version
  * number is CLAIMED atomically before any data is written, so two
  * racing publishers land in different v_<n> dirs instead of the
  * second overwriting the first's committed files; GC never touches a
  * live claim. AnnIndexSpec covers the reader-facing lifecycle
  * (resolve/retain/abort-sweep); this spec covers the writer-vs-writer
  * races that lifecycle test cannot reach.
  */
class IndexVersioningSpec extends SparkSpecBase {

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_ixver").toFile.getAbsolutePath

  private def publishMarker(dir: String, tag: String): Unit =
    IndexVersioning.publish(spark, dir) { vdir =>
      val d = new java.io.File(vdir)
      d.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(d, s"data_$tag").toPath, tag)
    }

  test("a foreign claim pushes the publisher to a fresh version") {
    val d = tmp()
    publishMarker(d, "a") // commits v_1
    // another writer holds v_2: claimed, not yet committed
    val held = new java.io.File(s"$d/v_2")
    held.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(held, "_CLAIMED").toPath, "")
    publishMarker(d, "b") // must NOT touch v_2
    assert(IndexVersioning.resolveDir(spark, d) == s"$d/v_3",
      "publisher must skip the held claim and commit past it")
    assert(held.isDirectory &&
      !new java.io.File(held, "_COMMITTED").exists(),
      "the in-flight claim must survive the other publisher's GC")
    assert(new java.io.File(s"$d/v_3/data_b").exists())
  }

  test("readers never resolve a claimed-but-uncommitted version") {
    val d = tmp()
    publishMarker(d, "a")
    val held = new java.io.File(s"$d/v_5")
    held.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(held, "_CLAIMED").toPath, "")
    assert(IndexVersioning.resolveDir(spark, d) == s"$d/v_1")
  }

  test("every publish claims before writing (abort leaves the claim)") {
    val d = tmp()
    publishMarker(d, "a")
    intercept[RuntimeException] {
      IndexVersioning.publish(spark, d) { vdir =>
        assert(new java.io.File(vdir, "_CLAIMED").exists(),
          "claim marker must exist before the write callback runs")
        throw new RuntimeException("simulated build failure")
      }
    }
    // the aborted claim is invisible to readers ...
    assert(IndexVersioning.resolveDir(spark, d) == s"$d/v_1")
    assert(new java.io.File(s"$d/v_2/_CLAIMED").exists())
    // ... survives the next publishes while its claim is FRESH (age is
    // the only thing separating it from a slow in-flight build) ...
    publishMarker(d, "b") // v_3 (v_2 still claimed)
    publishMarker(d, "c") // v_4; floor=3 sweeps committed v_1, not v_2
    assert(new java.io.File(s"$d/v_2/_CLAIMED").exists(),
      "a fresh claim must never be swept, even below the floor")
    assert(!new java.io.File(s"$d/v_1").exists(),
      "old committed version below the floor must be GC'd")
    // ... and is swept once the claim outlives the TTL
    backdateClaim(d, 2)
    publishMarker(d, "e")
    assert(!new java.io.File(s"$d/v_2").exists(),
      "an expired claim must be GC'd")
    assert(IndexVersioning.resolveDir(spark, d) == s"$d/v_5")
  }

  /** Age a claim past any TTL (mtime → epoch+1s). */
  private def backdateClaim(dir: String, v: Long): Unit =
    assert(new java.io.File(s"$dir/v_$v/_CLAIMED").setLastModified(1000L))

  test("a slow publisher survives TWO intervening commits (GC floor passes its claim)") {
    // the r11 ADVICE race: publisher A claims v_2; B and C each commit
    // while A's write is still running, raising the GC floor past A's
    // claim. The old number-only sweep (`v < floor`) deleted A's
    // in-flight dir mid-write; the marker-aware sweep must keep it, and
    // A's commit must then succeed with its data intact.
    val d = tmp()
    publishMarker(d, "a") // v_1
    IndexVersioning.publish(spark, d) { vdir =>
      java.nio.file.Files.writeString(
        new java.io.File(vdir, "data_slow").toPath, "slow")
      publishMarker(d, "b") // v_3; floor=1
      publishMarker(d, "c") // v_4; floor=3 — ABOVE our v_2 claim
      assert(new java.io.File(vdir, "_CLAIMED").exists(),
        "live claim below the floor must survive intervening GC")
      assert(new java.io.File(vdir, "data_slow").exists())
    }
    assert(new java.io.File(s"$d/v_2/_COMMITTED").exists(),
      "the slow publish must complete")
    assert(new java.io.File(s"$d/v_2/data_slow").exists())
    // readers still resolve the HIGHEST committed version
    assert(IndexVersioning.resolveDir(spark, d) == s"$d/v_4")
  }

  test("a publisher whose claim was TTL-swept fails loudly instead of committing") {
    val d = tmp()
    publishMarker(d, "a") // v_1
    val e = intercept[IllegalArgumentException] {
      IndexVersioning.publish(spark, d) { vdir =>
        java.nio.file.Files.writeString(
          new java.io.File(vdir, "data_slow").toPath, "slow")
        backdateClaim(d, 2) // simulate a build slower than the TTL
        publishMarker(d, "b") // its GC sweeps our expired claim
        // the parquet-writer analogue: the dir reappears mid-write
        new java.io.File(vdir).mkdirs()
        java.nio.file.Files.writeString(
          new java.io.File(vdir, "data_slow").toPath, "recreated")
      }
    }
    assert(e.getMessage.contains("vanished mid-write"))
    assert(!new java.io.File(s"$d/v_2/_COMMITTED").exists(),
      "a swept build must never become a committed version")
  }

  test("an abandoned claim ABOVE the floor is swept after the TTL") {
    // pre-TTL behavior let an above-floor aborted claim linger until
    // the floor passed it — which never happens if publishing stops
    val d = tmp()
    publishMarker(d, "a") // v_1
    val held = new java.io.File(s"$d/v_9")
    held.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(held, "_CLAIMED").toPath, "")
    backdateClaim(d, 9)
    publishMarker(d, "b") // v_2 (the foreign claim doesn't block it)
    assert(!held.exists(), "expired above-floor claim must be GC'd")
    assert(IndexVersioning.resolveDir(spark, d) == s"$d/v_2")
  }
}
