package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (local
    // iteration aid; the driver always passes exactly two args).
    // Two-staged oracles read SIBLING dumps via the outDir token — force-
    // include every referenced sibling so a filtered run never verifies
    // against a missing (confusing IO error) or stale (silent false
    // pass/fail) dump.
    // Expanded to a FIXED POINT: a sibling's oracle may itself reference
    // another sibling (two-staged chains), so one expansion level would
    // silently miss the transitive dump in a filtered run.
    val only = args.lift(2).map(_.split(',').toSet).map { sel0 =>
      val refRe = (java.util.regex.Pattern.quote(
        graft.queries.QueryModule.VerifyOutToken) + "/(\\w+)/").r
      def refsOf(names: Set[String]): Set[String] =
        SparkEntry.oracleSql.collect {
          case (name, sql) if names(name) =>
            refRe.findAllMatchIn(sql).map(_.group(1)).toSet
        }.flatten.toSet
      var sel = sel0
      var grown = true
      while (grown) {
        val next = sel ++ refsOf(sel)
        grown = next.size > sel.size
        sel = next
      }
      sel
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // On a failed dump the target directory is REMOVED: a leftover (stale
    // or partial) parquet from a previous run would let a two-staged
    // sibling oracle silently compare against old edges — a missing file
    // fails loudly instead.
    def deleteRecursively(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(p)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val target = Paths.get(s"$outDir/$name")
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(target.toString)
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        try deleteRecursively(target)
        catch { case c: Throwable => System.err.println(
          s"[verify] cleanup of stale $name dump failed: ${c.getMessage}") }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // two-staged oracles reference sibling query dumps via the outDir
    // token — resolve it to the absolute path the driver's DuckDB can read
    val absOut = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.queries.QueryModule.VerifyOutToken, absOut))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
