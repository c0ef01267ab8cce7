package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (optimization rounds): time a LIST of registered queries
  * in ONE session — cold + N steady reps each, per-query median/min —
  * so before/after comparisons don't pay a JVM+Spark startup per query
  * the way graft.BenchOne does. Methodology matches graft.Bench's steady
  * loop (noop sink, full materialization, AQE on, local[$SPARK_GRAFT_CPUS]).
  *
  * Usage: runMain graft.BenchSet <reps> <query1,query2,...> [sfDir]
  */
object BenchSet {
  def main(args: Array[String]): Unit = {
    LogProfiles.quietBench()
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.lift(1).map(_.split(',').toSeq).getOrElse(
      throw new IllegalArgumentException(
        "usage: BenchSet <reps> <q1,q2,...> [sfDir]"))
    val sfDir = args.lift(2)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    // dev A/B knob: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" applies
    // runtime-settable confs before timing (config experiments without
    // touching the Bench harness)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    spark.sparkContext.setLogLevel("WARN")
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val out = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      val times = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val steady = times.drop(1).sorted
      (name, times.head, steady(steady.size / 2), steady.head)
    }
    out.foreach { case (n, cold, med, mn) =>
      println(s"""{"query":"$n","cold":${f3(cold)},"median":${f3(med)},"min":${f3(mn)}}""")
    }
    println(s"""{"set_total_median":${f3(out.map(_._3).sum)},"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
