package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (optimization rounds): stage-by-stage timing of the
  * adaptive LSH pair generator (Similarity.cosinePairsAdaptive) — the
  * shared front of every graph-family query. Attributes the cost to
  * the corpus count, the bucket projection, the candidate join+dedup,
  * and the exact verify. Usage: runMain graft.ProfilePairs [sfDir]
  */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    LogProfiles.quietBench()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pairs] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val noop = (df: org.apache.spark.sql.DataFrame) =>
      df.write.format("noop").mode("overwrite").save()
    // warm pass
    noop(graft.ops.Similarity.cosinePairsAdaptive(
      Tables.embeddings(spark, dir), 0.35, targetOccupancy = 64,
      targetRecall = 0.99, maxPlanes = 7))
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      graft.ops.Checkpoints.releaseTransients()
      val emb = Tables.embeddings(spark, dir)
      val n = time("count") { emb.count() }
      val base = time("base stage (eager)") {
        graft.ops.Checkpoints.stage(
          graft.ops.Similarity.withNorm(emb, "vec_id", "embedding"),
          eager = true) }
      time("full pairs noop") {
        noop(graft.ops.Similarity.cosinePairsAdaptive(
          emb, 0.35, targetOccupancy = 64, targetRecall = 0.99,
          maxPlanes = 7)) }
      time("pairs again (staged warm)") {
        noop(graft.ops.Similarity.cosinePairsAdaptive(
          emb, 0.35, targetOccupancy = 64, targetRecall = 0.99,
          maxPlanes = 7)) }
      val (cands, b, t, _) = time("candidate stats (pre-dedup count)") {
        graft.ops.Similarity.adaptiveCandidateStats(emb, 0.35,
          targetOccupancy = 64, targetRecall = 0.99, maxPlanes = 7) }
      println(s"n=$n candidates=$cands b=$b tables=$t base_staged=${base.count()}")
    }
    spark.stop()
  }
}
