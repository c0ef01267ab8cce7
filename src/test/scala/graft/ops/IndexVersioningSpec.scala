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
    // ... and swept once a later commit raises the GC floor past it
    publishMarker(d, "b") // v_3 (v_2 still claimed)
    publishMarker(d, "c") // v_4; floor=3 sweeps v_2 and v_1
    assert(!new java.io.File(s"$d/v_2").exists(),
      "stale claim below the floor must be GC'd")
    assert(!new java.io.File(s"$d/v_1").exists())
    assert(IndexVersioning.resolveDir(spark, d) == s"$d/v_4")
  }
}
