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
    // flags and positionals may come in any order; a flag must never
    // be mistaken for the data directory
    val positional = args.filterNot(_.startsWith("-"))
    val name = positional.headOption.getOrElse(
      throw new IllegalArgumentException(
        "usage: CountJobs <queryName> [sfDir] [-v] [-p]"))
    val sfDir = positional.lift(1).getOrElse("/root/testdata/sf0.1")
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
    val profile = args.contains("-p")
    val jobsByExec = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val execLog = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, Long, Int, Int, Int)]()
    if (profile) {
      // per-execution profile: which action ran, how many exchanges its
      // executed plan carried, and (via spark.sql.execution.id on each
      // job) EXACTLY how many jobs the execution spawned — the ground
      // truth for where the barrier count lives
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val p = qe.executedPlan.toString
            val sh = "ShuffleQueryStage".r.findAllIn(p).length
            val reuse = "ReusedExchange|table cache".r.findAllIn(p).length
            val bc = "BroadcastQueryStage".r.findAllIn(p).length
            // job attribution is printed AFTER stop() (the async bus
            // may not have delivered this execution's job starts yet)
            execLog.add((qe.id, funcName, durationNs / 1000000, sh, bc, reuse))
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }
    val jobs = new AtomicInteger(0)
    val sites = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (profile) Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .foreach(id => jobsByExec.merge(id, 1, (a, b) => a + b))
        if (verbose) {
          // SQL-execution jobs carry no callSite property; the result
          // stage's name (RDD scope) is the best available label
          val site = js.stageInfos.lastOption.map(si =>
            s"${si.name.takeWhile(_ != ':')}(+${js.stageInfos.length - 1} stages)")
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
      // diagnostics go to stderr: stdout carries exactly one JSON line
      // (the same contract the bench establishes for its consumers)
      import scala.jdk.CollectionConverters._
      sites.asScala.toSeq.sortBy(-_._2.intValue).foreach { case (s, n) =>
        System.err.println(s"  $n  $s") }
    }
    if (profile) {
      import scala.jdk.CollectionConverters._
      execLog.asScala.toSeq.sortBy(_._1).foreach {
        case (id, fn2, ms, sh, bc, reuse) =>
          val nJobs = jobsByExec.getOrDefault(id.toString, 0)
          System.err.println(
            f"[prof] exec=$id%-4d $fn2%-16s ms=$ms%-6d jobs=$nJobs%-3d shuffleStages=$sh%-3d bcastStages=$bc%-3d reused=$reuse%-3d")
      }
    }
  }
}
