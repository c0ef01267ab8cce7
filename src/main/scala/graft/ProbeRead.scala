package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: cost of constructing a parquet read (schema inference +
  * file index) vs a schema-supplied read, per table. */
object ProbeRead {
  def main(args: Array[String]): Unit = {
    LogProfiles.quietBench()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    for (n <- Seq("lineitem", "orders", "documents", "embeddings", "events")) {
      val df = t(s"read $n (infer, cold)") {
        spark.read.parquet(s"$sfDir/$n.parquet") }
      val schema = df.schema
      t(s"read $n (infer, warm)") { spark.read.parquet(s"$sfDir/$n.parquet") }
      t(s"read $n (schema)") {
        spark.read.schema(schema).parquet(s"$sfDir/$n.parquet") }
      t(s"read $n (schema x10)") {
        (1 to 10).foreach(_ =>
          spark.read.schema(schema).parquet(s"$sfDir/$n.parquet")) }
      t(s"read $n (infer x10)") {
        (1 to 10).foreach(_ => spark.read.parquet(s"$sfDir/$n.parquet")) }
    }
    spark.stop()
  }
}
