package graft

import org.apache.spark.sql.SparkSession

/** Focused re-measure utility: times ONE registered query N times under
  * the same session config as graft.Bench (local[32], AQE on, noop sink,
  * full materialization), printing one JSON line with every repetition so
  * outliers are visible individually instead of averaged away. Used to
  * adjudicate bench outliers against the documented ±25% host-noise band
  * (e.g. the round-5 q_pipe_chunks 3.26s-vs-1.5s driver reading).
  *
  * Usage: runMain graft.BenchOne <queryName> [reps=5] [sfDir=$SPARK_GRAFT_SF_DIR]
  * The first repetition is the cold (JIT-inclusive) number; the rest are
  * steady-state, matching Bench's "r4-cold+steady" methodology.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    LogProfiles.quietBench()
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: BenchOne <queryName> [reps] [sfDir]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = args.lift(2)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query: $name"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val steady = times.drop(1)
    println(s"""{"query":"$name","sf":"$sfDir","reps":$reps,""" +
      s""""times":[${times.map(f3).mkString(",")}],""" +
      s""""cold":${f3(times.head)},""" +
      s""""steady_min":${f3(steady.min)},"steady_median":${
        f3(steady.sorted.apply(steady.size / 2))}}""")
    spark.stop()
  }
}
