package graft

import org.apache.spark.sql.functions._

/** Cross-engine literal-parity probe (not part of the driver
  * contract): dumps every DeterministicEnricher embedding component of
  * every document text through the EXACT export rendering
  * (DbExport.componentLiteral's scale-15 integer assembly), so a DuckDB
  * mirror can re-validate byte equality whenever the rendering or the
  * enricher changes. This experiment is what cleared the full-export
  * oracle: 0 mismatches over all components at sf0.001/0.01/0.1
  * (32k/32k/320k values). Usage: runMain graft.ProbeEmb <sfDir> <outDir>
  */
object ProbeEmb {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val enricher = new graft.enrich.DeterministicEnricher(64)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
    val emb = docs.map { case (id, text) =>
      (id, enricher.embedBatch(Seq(text)).head)
    }.toDF("doc_id", "embedding")
    val x = col("x")
    val u = round(x.cast("double") * lit(1.0e15)).cast("long")
    val pad = lpad(abs(u).cast("string"), 16, "0")
    val s = concat(when(u < 0, lit("-")).otherwise(lit("")),
      substring(pad, 1, 1), lit("."), substring(pad, 2, 15))
    emb.select(col("doc_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("doc_id"), col("dim"), s.as("s"))
      .orderBy(col("doc_id"), col("dim"))
      .coalesce(1).write.mode("overwrite").option("header", "false").csv(outFile)
    println(s"[probe] wrote $outFile")
    spark.stop()
  }
}
