package graft.ops

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The keepPartitioning compile seam must be INVISIBLE to the parent
  * session: until r11 it flipped spark.sql.adaptive.enabled and
  * spark.sql.shuffle.partitions on the shared conf inside a lock (a
  * documented cross-thread visibility window — r9 ADVICE); it now
  * compiles in a cloned session, so a concurrent reader of the parent
  * conf can NEVER observe the pins, and the staged frame still carries
  * its partitioning into the parent's plans.
  */
class StageIsolationSpec extends SparkSpecBase {

  test("parent conf never shows the loop pins while stages compile") {
    import spark.implicits._
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val stop = new AtomicBoolean(false)
    val observedFlip = new AtomicBoolean(false)
    val polls = new AtomicInteger(0)
    val watcher = new Thread(() => {
      while (!stop.get()) {
        if (spark.conf.get("spark.sql.adaptive.enabled") != aqeBefore ||
            spark.conf.get("spark.sql.shuffle.partitions") != partsBefore)
          observedFlip.set(true)
        polls.incrementAndGet()
      }
    })
    watcher.start()
    try {
      (1 to 8).foreach { i =>
        val df = (1 to 200).map(j => (j.toLong * i, j % 7))
          .toDF("id", "g").groupBy(col("g")).agg(count(lit(1)).as("n"))
        val staged = Checkpoints.stage(df, eager = true,
          keepPartitioning = true, shufflePartitions = Some(3))
        assert(staged.count() === 7)
      }
    } finally {
      stop.set(true)
      watcher.join(10000)
    }
    assert(polls.get() > 1000, "watcher barely ran; test is vacuous")
    assert(!observedFlip.get(),
      "a concurrent thread observed the loop compile's conf pins on " +
        "the PARENT session — the cloned-session isolation regressed")
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqeBefore)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === partsBefore)
  }

  test("observe metrics survive the cloned compile (stageObserved)") {
    import spark.implicits._
    // the r11 battery hang: an Observation registers on the PARENT
    // session's listener bus, but the cached clone's bus predates it —
    // Observation.get blocked forever. stageObserved reads the
    // CollectMetrics accumulators off the executed plan instead, which
    // no session boundary can lose.
    val df = (1 to 100).map(j => (j.toLong, j % 5))
      .toDF("id", "g")
      .observe("iso_metric", count(lit(1)).as("n"),
        sum(col("id")).as("s"))
      .repartition(2, col("g"))
      .sortWithinPartitions(col("g"))
    val (staged, metrics) = Checkpoints.stageObserved(df,
      keepPartitioning = true, shufflePartitions = Some(2))
    assert(staged.count() === 100)
    val row = metrics("iso_metric")
    assert(row.getAs[Long]("n") === 100L)
    assert(row.getAs[Long]("s") === 5050L)
  }

  test("cloned compile still pins the staged layout (3 partitions)") {
    import spark.implicits._
    val df = (1 to 500).map(j => (j.toLong, j % 11))
      .toDF("id", "g").groupBy(col("g")).agg(count(lit(1)).as("n"))
    val staged = Checkpoints.stage(df, eager = true,
      keepPartitioning = true, shufflePartitions = Some(3))
    assert(staged.rdd.getNumPartitions === 3,
      "the shuffle-partition pin must reach the staged frame's layout")
    // and the frame is usable from the PARENT session's plans
    assert(staged.agg(sum(col("n"))).collect().head.getLong(0) === 500L)
  }
}
