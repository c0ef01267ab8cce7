package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (optimization rounds): stage-by-stage timing of the
  * persisted ANN index path (AnnIndex.save / upsert / topK) at one
  * scale dir, under the bench session config — attributes the
  * q_knn_*_index cost to quantizer training, encode, writes, and probes.
  * Usage: runMain graft.ProfileAnn [sfDir]
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    LogProfiles.quietBench()
    sys.props("graft.ann.profile") = "true"
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
      println(f"[ann] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val emb = Tables.embeddings(spark, dir)
    // warm pass (JIT + page cache)
    val warmDir = java.nio.file.Files.createTempDirectory("annprof_w").toString
    graft.ops.AnnIndex.save(emb, warmDir)
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val ixDir = java.nio.file.Files.createTempDirectory("annprof").toString
      time("save total") { graft.ops.AnnIndex.save(emb, ixDir) }
      val delta = emb.filter(col("vec_id") % 10 === 0)
      time("upsert total") { graft.ops.AnnIndex.upsert(delta, ixDir) }
      val q = emb.filter(col("vec_id") % 100 === 0)
      time("topK total") {
        graft.ops.AnnIndex.topK(spark, ixDir, emb, q, 5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
