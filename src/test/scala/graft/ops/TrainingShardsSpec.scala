package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Training-shard sink: layout, manifest agreement, reload round-trip,
  * and id-stability of the shard assignment. */
class TrainingShardsSpec extends SparkSpecBase {

  test("write → audit round-trip: manifest matches a fresh rescan") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    val manifest = TrainingShards.write(docs, "doc_id", "text", out, 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val audit = TrainingShards.audit(spark, out, "doc_id", "text")
      .select(col("split"), col("shard").cast("long"), col("n_docs"),
        col("n_tokens"), col("checksum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(manifest.toSet === audit.toSet)
    assert(manifest.map(_._3).sum === docs.count())
    // manifest file exists and parses as a JSON array with one entry per row
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "_manifest.json"))
    assert(json.trim.startsWith("[") &&
      json.count(_ == '{') === manifest.size)
    // directory layout: split=<s>/shard=<k>
    val splits = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(splits.contains("split=train"))
  }

  test("shard assignment is id-stable: a rewritten subset agrees") {
    val out1 = java.nio.file.Files.createTempDirectory("shards1").toString
    val out2 = java.nio.file.Files.createTempDirectory("shards2").toString
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    TrainingShards.write(docs, "doc_id", "text", out1, 4)
    TrainingShards.write(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", out2, 4)
    val full = spark.read.parquet(out1)
      .select(col("doc_id"), col("split"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val half = spark.read.parquet(out2)
      .select(col("doc_id"), col("split"), col("shard").cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(half.nonEmpty)
    assert(half.forall { case (id, sp) => full(id) === sp })
  }
}
