package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the document pipeline at one
  * scale dir (pages → sections → +correct → chunks). Not part of the
  * driver contract; used to attribute q_pipe_* cost to stages. */
object ProfilePipe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def pages = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) => graft.text.FixtureCorpus.pages(id, text) }

    def time(name: String)(df: => org.apache.spark.sql.Dataset[_]): Unit = {
      val t0 = System.nanoTime()
      df.toDF().write.format("noop").mode("overwrite").save()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    // warm-up
    pages.toDF().write.format("noop").mode("overwrite").save()
    for (_ <- 1 to 2) {
      time("pages")(pages)
      time("sections")(graft.ops.DocPipeline.pagesToSections(pages))
      time("sections+correct")(graft.ops.DocPipeline.correctSectionPages(
        graft.ops.DocPipeline.pagesToSections(pages)))
      time("chunks")(graft.ops.DocPipeline.sectionsToChunks(
        graft.ops.DocPipeline.pagesToSections(pages)))
    }
    spark.stop()
  }
}
