package graft.ops

import org.apache.spark.sql.SparkSession

/** Shared publish discipline for persisted indexes (AnnIndex,
  * InvertedIndex): each build writes into a fresh `v_<n>` directory and
  * is published by CREATING a `_COMMITTED` marker — file creation is
  * the atomic point on HDFS and local filesystems, so a reader either
  * resolves a complete committed build or the previous one, never a
  * half-written mix. The previous committed version is retained one
  * rebuild window for in-flight readers; older and aborted (marker-less)
  * build dirs are garbage-collected at the next publish.
  */
object IndexVersioning {

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Committed version numbers under `dir`, ascending. */
  def committedVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, p) = fsOf(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v_"))
      .flatMap(s => s.getPath.getName.stripPrefix("v_").toLongOption
        .filter(_ => fs.exists(
          new org.apache.hadoop.fs.Path(s.getPath, "_COMMITTED"))))
      .sorted
  }

  /** The directory holding the CURRENT committed build: the highest
    * committed `v_<n>` when the versioned layout is present, else `dir`
    * itself (pre-versioning flat layout, still readable). Readers
    * resolve ONCE and pin the result for their whole read. */
  def resolveDir(spark: SparkSession, dir: String): String =
    committedVersions(spark, dir).lastOption
      .map(v => s"$dir/v_$v").getOrElse(dir)

  /** Run `write` against the next build directory, then atomically
    * publish it and GC all but the new build and its predecessor. If
    * `write` throws, the marker is never created and the partial dir is
    * swept by the next successful publish. */
  def publish(spark: SparkSession, dir: String)(write: String => Unit): Unit = {
    val (fs, p) = fsOf(spark, dir)
    // claim the version number BEFORE writing: an atomic `_CLAIMED`
    // create (overwrite=false) makes two concurrent publishers take
    // DIFFERENT v_<n> dirs instead of the second overwriting the
    // first's already-committed files mid-read (r10 ADVICE). A claim
    // without a later `_COMMITTED` is an aborted build — invisible to
    // readers and GC'd by the next successful publish.
    val prior = committedVersions(spark, dir)
    var next = prior.lastOption.getOrElse(0L) + 1
    var claimed = false
    var attempts = 0
    while (!claimed) {
      try {
        fs.mkdirs(p)
        fs.create(new org.apache.hadoop.fs.Path(s"$dir/v_$next/_CLAIMED"),
          false).close()
        claimed = true
      } catch {
        case _: java.io.IOException =>
          attempts += 1
          require(attempts < 1000,
            s"publish($dir): could not claim a version after $attempts tries")
          // someone else holds v_<next> (claimed or committed): skip past
          // every existing v_ dir and retry with a fresh number
          val taken = fs.listStatus(p).toSeq
            .flatMap(_.getPath.getName.stripPrefix("v_").toLongOption)
          next = math.max(next, taken.maxOption.getOrElse(0L)) + 1
      }
    }
    val vdir = s"$dir/v_$next"
    write(vdir)
    fs.create(new org.apache.hadoop.fs.Path(s"$vdir/_COMMITTED"),
      false).close() // atomic publish; `false` = fail loudly on a clash
    // GC: (a) everything below the PREVIOUS committed version — at or
    // above it live the retained predecessor, this build, and any
    // concurrent writer's in-flight claim (always numbered past the
    // last commit it saw); (b) marker-less dirs above the floor (a
    // crash between mkdir and the _CLAIMED create, or foreign junk) —
    // a live claim always carries _CLAIMED. Aborted CLAIMED builds
    // above the floor linger one window and are swept once a later
    // publish raises the floor past them.
    val floor = prior.lastOption.getOrElse(0L)
    fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v_"))
      .filter { s =>
        s.getPath.getName.stripPrefix("v_").toLongOption.exists { v =>
          v < floor || (v != next &&
            !fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_COMMITTED")) &&
            !fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_CLAIMED")))
        }
      }
      .foreach(s => fs.delete(s.getPath, true))
  }
}
