package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** S6/S7 (typed master-CSV round trip) and S11/P8 (file-listing source with
  * hidden/temp-file predicate) against real local files. */
class SourcesSpec extends SparkSpecBase {

  test("S6/S7: master CSV writes and reads back typed (UTC timestamps)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mastercsv").toString + "/m"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("file_name", StringType),
      StructField("file_size", LongType),
      StructField("date_last_modified", TimestampType)))
    val df = Seq(
      (1L, "a.pdf", 100L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00")),
      (2L, "b.pdf", 200L, java.sql.Timestamp.valueOf("2024-06-15 23:59:59")))
      .toDF("id", "file_name", "file_size", "date_last_modified")
    df.write.option("header", true).mode("overwrite").csv(dir)
    val back = spark.read.schema(schema).option("header", true).csv(dir)
    assert(back.schema == schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("S11/P8: binaryFile listing exposes metadata; hidden/temp filtered") {
    val dir = Files.createTempDirectory("listing")
    Files.write(dir.resolve("doc1.pdf"), "payload-1".getBytes)
    Files.write(dir.resolve("doc2.pdf"), "payload-two".getBytes)
    Files.write(dir.resolve(".hidden.pdf"), "x".getBytes)
    Files.write(dir.resolve("~$temp.pdf"), "y".getBytes)
    val listing = spark.read.format("binaryFile")
      .load(dir.toString)
      .select(element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length"), col("modificationTime"))
      .filter(!col("file_name").startsWith(".") &&
        !col("file_name").startsWith("~$"))
    val rows = listing.collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("doc1.pdf", "doc2.pdf"))
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("doc1.pdf" -> 9L, "doc2.pdf" -> 11L))
  }
}
