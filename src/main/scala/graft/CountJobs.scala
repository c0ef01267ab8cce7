package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev utility: count the Spark JOBS one registered query launches —
  * every blocking materialization (eager checkpoint, count(), collect)
  * is at least one job, so this is the host-noise-insensitive metric
  * for "how many sequential driver barriers does this operator pay".
  * Usage: runMain graft.CountJobs <queryName> [sfDir]. */
object CountJobs {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: CountJobs <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query: $name"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // listener bus is async (and private); settle before reading
    Thread.sleep(2000)
    println(s"""{"query":"$name","sf":"$sfDir","jobs":${jobs.get()}}""")
    spark.stop()
  }
}
