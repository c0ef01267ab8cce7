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
    val verbose = args.contains("-v")
    val jobs = new AtomicInteger(0)
    val sites = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("unknown")
          sites.merge(site, 1, (a, b) => a + b)
        }
      }
    })
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // the listener bus is async: stop() drains and flushes it, so the
    // counter is only exact AFTER stop — a fixed sleep undercounted on
    // a loaded host, skewing the very barrier metric this tool measures
    spark.stop()
    println(s"""{"query":"$name","sf":"$sfDir","jobs":${jobs.get()}}""")
    if (verbose) {
      import scala.jdk.CollectionConverters._
      sites.asScala.toSeq.sortBy(-_._2.intValue).foreach { case (s, n) =>
        println(s"  $n  $s") }
    }
  }
}
