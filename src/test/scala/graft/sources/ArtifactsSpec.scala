package graft.sources

import graft.SparkSpecBase
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}

/** S4/S7/V7/V10: single-file publishers, flag files, deployment metadata. */
class ArtifactsSpec extends SparkSpecBase {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-artifacts").toString

  private def df = {
    import spark.implicits._
    Seq((3L, "c", 30.5), (1L, "a", 10.0), (2L, "b", null.asInstanceOf[Double]))
      .toDF("id", "name", "score")
  }

  test("publishMasterCsv: master + backup + deployment, identical bytes, single files") {
    val dir = tmpDir()
    val r = Artifacts.publishMasterCsv(df, Seq("id"), dir,
      masterName = "master", deploymentPrefix = "deploy",
      timestamp = "2026-08-12_00-00-00")
    val master = Paths.get(new java.net.URI(r.master).getPath)
    val backup = Paths.get(new java.net.URI(r.backup).getPath)
    val deploy = Paths.get(new java.net.URI(r.deployment).getPath)
    Seq(master, backup, deploy).foreach { p =>
      assert(Files.isRegularFile(p), s"$p must be a single file")
    }
    val bytes = Files.readAllBytes(master)
    assert(bytes.sameElements(Files.readAllBytes(backup)))
    assert(bytes.sameElements(Files.readAllBytes(deploy)))
    val lines = new String(bytes, "UTF-8").split("\n").toSeq
    assert(lines.head == "id,name,score")
    assert(lines(1).startsWith("1,a"))
    assert(lines.length == 4)
    // rewrite keeps old backup, replaces master atomically
    val r2 = Artifacts.publishMasterCsv(df.limit(1), Seq("id"), dir,
      "master", "deploy", "2026-08-12_01-00-00")
    assert(Files.isRegularFile(backup), "old backup retained")
    assert(Files.readAllLines(master).size() == 2)
    assert(r2.backup != r.backup)
  }

  test("publishMasterCsv retries transient failures, gives up after max") {
    var slept = List.empty[Int]
    // target parent is a FILE → mkdirs/rename fails every attempt
    val dir = tmpDir()
    val blocker = Paths.get(dir, "blocked")
    Files.write(blocker, "x".getBytes)
    intercept[Exception] {
      Artifacts.publishMasterCsv(df, Seq("id"), blocker.toString,
        "master", "deploy", "t", maxRetries = 3, sleep = s => slept ::= s)
    }
    assert(slept.sorted == List(5, 10), "progressive waits between attempts")
  }

  test("writeJsonArray: one pretty-printed ordered array, atomic replace") {
    val dir = tmpDir()
    val target = s"$dir/pages.json"
    Artifacts.writeJsonArray(df, Seq("id"), target)
    val text = new String(Files.readAllBytes(Paths.get(target)), "UTF-8")
    assert(text.startsWith("[\n  {"), "pretty array layout")
    assert(text.endsWith("\n]"))
    val node = new ObjectMapper().readTree(text)
    assert(node.isArray && node.size == 3)
    assert(node.get(0).get("id").asLong == 1L)
    assert(node.get(2).get("id").asLong == 3L)
    // republish overwrites in place
    Artifacts.writeJsonArray(df.limit(1), Seq("id"), target)
    assert(new ObjectMapper().readTree(
      Files.readAllBytes(Paths.get(target))).size == 1)
  }

  test("readJsonArray: round-trips writeJsonArray, rejects non-arrays") {
    val dir = tmpDir()
    val target = s"$dir/artifact.json"
    Artifacts.writeJsonArray(df, Seq("id"), target)
    val back = Artifacts.readJsonArray(spark, target)
    assert(back.count() == 3)
    assert(back.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    val bad = Paths.get(dir, "not-array.json")
    Files.write(bad, """{"id": 1}""".getBytes)
    intercept[IllegalArgumentException] {
      Artifacts.readJsonArray(spark, bad.toString)
    }
  }

  test("binary split/merge round-trips bytes through grouped reassembly") {
    import spark.implicits._
    import graft.ops.BinaryDocs
    val rng = new scala.util.Random(11)
    val docs = (1L to 8L).map { id =>
      val n = if (id == 1) 0 else rng.nextInt(2000)
      (id, Array.fill(n)(rng.nextInt().toByte))
    }
    val ds = docs.toDS()
    val pages = BinaryDocs.splitPages(ds)
    // page sizing: ceil(n/256) pages, all but last exactly 256 bytes
    val byDoc = pages.collect().groupBy(_.getLong(0))
    docs.foreach { case (id, bytes) =>
      val expect = (bytes.length + 255) / 256
      assert(byDoc.getOrElse(id, Array.empty).length == expect, s"doc $id")
    }
    val merged = BinaryDocs.mergeGroups(pages, Seq("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("merged")).toMap
    docs.filter(_._2.nonEmpty).foreach { case (id, bytes) =>
      assert(merged(id).sameElements(bytes), s"doc $id bytes differ")
    }
  }

  test("token cache: fetch once per ttl window, failures not cached") {
    var now = 0L
    var calls = 0
    val cache = new graft.enrich.TokenCache(1000L,
      () => { calls += 1; if (calls == 2) None else Some(s"tok$calls") },
      () => now)
    assert(cache.get().contains("tok1"))
    assert(cache.get().contains("tok1"), "cached within ttl")
    assert(calls == 1)
    now = 1000L // expired
    assert(cache.get().isEmpty, "failed fetch propagates None")
    assert(cache.get().contains("tok3"), "failure was not cached")
    assert(calls == 3)
    cache.invalidate()
    assert(cache.get().contains("tok4"))
    assert(cache.fetchCount == 4)
  }

  test("flag files: skip iff no work, refresh per mode, consumers see them") {
    val dir = tmpDir()
    Artifacts.manageFlags(df, dir, nToProcess = 0, nToDelete = 0,
      fullRefresh = false)
    assert(Artifacts.shouldSkip(df, dir))
    assert(!Artifacts.isFullRefresh(df, dir))
    Artifacts.manageFlags(df, dir, nToProcess = 5, nToDelete = 0,
      fullRefresh = true)
    assert(!Artifacts.shouldSkip(df, dir), "skip flag removed when work found")
    assert(Artifacts.isFullRefresh(df, dir))
    Artifacts.manageFlags(df, dir, nToProcess = 0, nToDelete = 2,
      fullRefresh = false)
    assert(!Artifacts.shouldSkip(df, dir), "deletes alone are work")
  }

  test("archiveRun zips a run directory deterministically") {
    val dir = tmpDir()
    Files.createDirectories(Paths.get(dir, "sub"))
    Files.write(Paths.get(dir, "a.json"), "[1,2]".getBytes)
    Files.write(Paths.get(dir, "sub", "b.csv"), "x,y\n1,2\n".getBytes)
    val zip1 = s"$dir-run1.zip"
    val zip2 = s"$dir-run2.zip"
    assert(Artifacts.archiveRun(df, dir, zip1) == 2)
    assert(Artifacts.archiveRun(df, dir, zip2) == 2)
    val b1 = Files.readAllBytes(Paths.get(zip1))
    assert(b1.sameElements(Files.readAllBytes(Paths.get(zip2))),
      "archive must be byte-deterministic")
    val zf = new java.util.zip.ZipFile(zip1)
    try {
      import scala.jdk.CollectionConverters._
      val entries = zf.entries().asScala.map(_.getName).toSet
      assert(entries == Set("a.json", "sub/b.csv"))
      val in = zf.getInputStream(zf.getEntry("sub/b.csv"))
      assert(new String(in.readAllBytes(), "UTF-8") == "x,y\n1,2\n")
    } finally zf.close()
  }

  test("deployment metadata: counts, hashes, delete query, status") {
    val meta = Artifacts.deploymentMetadata(df, df.limit(2),
      "2026-08-12_00-00-00", Seq("srcA", "srcB"))
    val node = new ObjectMapper().readTree(meta)
    assert(node.get("file_info").get("catalog_records").asLong == 3)
    assert(node.get("file_info").get("content_records").asLong == 2)
    assert(node.get("file_info").get("catalog_hash").asText.nonEmpty)
    assert(node.get("instructions").get("delete_query").asText ==
      "DELETE FROM apg_catalog WHERE document_source IN ('srcA', 'srcB'); " +
        "DELETE FROM apg_content WHERE document_source IN ('srcA', 'srcB');")
    assert(node.get("summary").get("status").asText == "SUCCESS")
    assert(node.get("schema_info").get("catalog_columns").size == 3)
    val warn = Artifacts.deploymentMetadata(df, df, "t", Seq("s"),
      validationIssues = Seq("catalog: missing ids"))
    assert(new ObjectMapper().readTree(warn)
      .get("summary").get("status").asText == "WARNING")
    // content hash is order-independent (distributed reformulation)
    assert(Artifacts.contentHash(df.orderBy("name")) ==
      Artifacts.contentHash(df.orderBy(org.apache.spark.sql.functions.col("name").desc)))
  }
}
