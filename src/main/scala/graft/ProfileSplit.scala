package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (optimization rounds): split one query's wall-clock into
  * construction (building the DataFrame), planning (analysis through
  * executedPlan), and execution (the noop action) — the triage that says
  * whether a slow query is driver-bound (plan size), scheduler-bound, or
  * actually computing. Reps after the first are steady-state.
  *
  * Usage: runMain graft.ProfileSplit <q1,q2,...> [reps=3] [sfDir]
  */
object ProfileSplit {
  def main(args: Array[String]): Unit = {
    LogProfiles.quietBench()
    val names = args.headOption.map(_.split(',').toSeq).getOrElse(
      throw new IllegalArgumentException(
        "usage: ProfileSplit <q1,q2,...> [reps] [sfDir]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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
    spark.sparkContext.setLogLevel("WARN")
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      val rows = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      rows.zipWithIndex.foreach { case ((c, p, e), i) =>
        println(s"""{"query":"$name","rep":$i,"construct":${f3(c)},""" +
          s""""plan":${f3(p)},"exec":${f3(e)},"total":${f3(c + p + e)}}""")
      }
    }
    spark.stop()
  }
}
