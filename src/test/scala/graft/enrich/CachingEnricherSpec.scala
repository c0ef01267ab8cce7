package graft.enrich

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Counting wrapper: tallies every inner call so specs can assert
  * replay-vs-recompute exactly. Static counters survive closure
  * serialization in local mode (all tasks share the JVM). */
class CountingEnricher(dims: Int = 16,
    failAfter: Int = Int.MaxValue) extends Enricher {
  private val inner = new DeterministicEnricher(dims)
  private def tick(): Unit = {
    val n = CountingEnricher.calls.incrementAndGet()
    if (n > failAfter)
      throw new RuntimeException(s"injected failure after $failAfter calls")
  }
  override def embeddingDims: Int = dims
  override def chapterSegmentSummary(seg: String, prev: Option[String],
      fin: Boolean): String = { tick(); inner.chapterSegmentSummary(seg, prev, fin) }
  override def sectionSummary(c: String, ch: String, h: String,
      p: Seq[String]): String = { tick(); inner.sectionSummary(c, ch, h, p) }
  override def describeDocument(d: String): (String, String) =
    { tick(); inner.describeDocument(d) }
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    { texts.foreach(_ => tick()); inner.embedBatch(texts) }
  override def ocrPage(img: Array[Byte], n: Int): String =
    { tick(); inner.ocrPage(img, n) }
  override def visionAnalyze(p: String, pr: String, img: Array[Byte]): String =
    { tick(); inner.visionAnalyze(p, pr, img) }
  override def visionSynthesize(d: Seq[(String, String)], n: Int): String =
    { tick(); inner.visionSynthesize(d, n) }
}

object CountingEnricher {
  val calls = new AtomicInteger(0)
}

/** The replay-cache contract: a cached re-run makes ZERO inner calls,
  * a killed run resumes from the records already on disk, and the
  * cache replays — never transforms — results. */
class CachingEnricherSpec extends SparkSpecBase {

  private def freshDir() =
    Files.createTempDirectory("graft-enrich-cache").toString

  private def resetCalls(): Unit = CountingEnricher.calls.set(0)

  test("every call type replays from cache with zero inner calls") {
    val dir = freshDir()
    val counted = new CountingEnricher(dims = 8)
    val cached = new CachingEnricher(counted, dir)
    def driveAll(e: Enricher): Seq[Any] = Seq(
      e.chapterSegmentSummary("seg one. more.", None, isFinal = false),
      e.chapterSegmentSummary("seg one. more.", Some("prev."), isFinal = true),
      e.sectionSummary("content.", "chapsum", "A > B", Seq("s1", "s2")),
      e.describeDocument("doc body with several sentences. two. three."),
      e.embedBatch(Seq("alpha", "beta")).map(_.toSeq),
      e.ocrPage(Array[Byte](1, 2, 3), 4),
      e.visionAnalyze("text_content", "prompt", Array[Byte](9, 8)),
      e.visionSynthesize(Seq("a" -> "ra", "b" -> "rb"), 7))
    resetCalls()
    val first = driveAll(cached)
    val firstCalls = CountingEnricher.calls.get()
    assert(firstCalls > 0)
    resetCalls()
    val second = driveAll(cached)
    assert(CountingEnricher.calls.get() === 0,
      "cached re-run still reached the inner enricher")
    assert(second === first, "replayed results differ from computed ones")
    // and the replay equals the UNcached computation (cache never transforms)
    assert(first === driveAll(new DeterministicEnricher(8)))
  }

  test("argument framing: adjacent-argument content never collides") {
    val dir = freshDir()
    val e = new CachingEnricher(new DeterministicEnricher(8), dir)
    // same concatenation, different boundaries
    val a = e.sectionSummary("ab", "c", "h", Nil)
    val b = e.sectionSummary("a", "bc", "h", Nil)
    val plain = new DeterministicEnricher(8)
    assert(a === plain.sectionSummary("ab", "c", "h", Nil))
    assert(b === plain.sectionSummary("a", "bc", "h", Nil))
    val s1 = e.chapterSegmentSummary("x. y.", Some("p."), isFinal = false)
    val s2 = e.chapterSegmentSummary("x. y.", None, isFinal = false)
    assert(s1 === plain.chapterSegmentSummary("x. y.", Some("p."), isFinal = false))
    assert(s2 === plain.chapterSegmentSummary("x. y.", None, isFinal = false))
  }

  test("embedBatch replays per text across different batch compositions") {
    val dir = freshDir()
    val cached = new CachingEnricher(new CountingEnricher(dims = 8), dir)
    resetCalls()
    cached.embedBatch(Seq("t1", "t2", "t3"))
    assert(CountingEnricher.calls.get() === 3)
    resetCalls()
    // re-batched differently + one new text: only the miss is computed,
    // and index alignment holds for the mixed hit/miss batch
    val out = cached.embedBatch(Seq("t3", "t4", "t1"))
    assert(CountingEnricher.calls.get() === 1)
    val plain = new DeterministicEnricher(8)
    assert(out.map(_.toSeq) ===
      plain.embedBatch(Seq("t3", "t4", "t1")).map(_.toSeq))
  }

  test("concurrent writers on the same keys never corrupt a record") {
    // the tmp+atomic-rename contract under real contention: many
    // threads racing the same keys must all read back exact results,
    // and no .tmp debris may remain
    val dir = freshDir()
    val cached = new CachingEnricher(new DeterministicEnricher(8), dir)
    val plain = new DeterministicEnricher(8)
    val texts = (1 to 8).map(i => s"contended text $i")
    val expected = texts.map(t => plain.embedBatch(Seq(t)).head.toSeq)
    // failures inside worker threads must surface on the test thread
    val firstError =
      new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        try (1 to 5).foreach { _ =>
          val out = cached.embedBatch(texts).map(_.toSeq)
          if (out != expected)
            throw new AssertionError(s"corrupted replay: $out")
        } catch { case t: Throwable => firstError.compareAndSet(null, t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(firstError.get() === null,
      s"worker thread failed: ${Option(firstError.get()).map(_.toString)}")
    // re-read pure from cache and sweep for leftover tmp files
    assert(cached.embedBatch(texts).map(_.toSeq) === expected)
    val walk = Files.walk(java.nio.file.Paths.get(dir))
    val tmps = try walk.filter(p =>
      p.getFileName.toString.endsWith(".tmp")).count() finally walk.close()
    assert(tmps === 0, s"$tmps tmp files left behind by the write race")
  }

  test("a Spark re-run of the embed stage makes zero inner calls") {
    import spark.implicits._
    val dir = freshDir()
    val chunks = graft.ops.DocPipeline.sectionsToChunks(
      graft.ops.DocPipeline.pagesToSections(
        graft.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (id, t) => graft.text.FixtureCorpus.pages(id, t) }))
    def run(e: Enricher) = graft.ops.EnrichStages.embedChunks(chunks, e)
      .toDF().select(col("document_id"), col("chunk_number"),
        md5(concat_ws(",", col("embedding"))).as("fp"))
      .orderBy(col("document_id"), col("chunk_number"))
      .collect().toSeq
    resetCalls()
    val first = run(new CachingEnricher(new CountingEnricher(dims = 8), dir))
    val firstCalls = CountingEnricher.calls.get()
    assert(firstCalls > 0)
    resetCalls()
    val second = run(new CachingEnricher(new CountingEnricher(dims = 8), dir))
    assert(CountingEnricher.calls.get() === 0,
      s"re-run reached the inner enricher (first run made $firstCalls calls)")
    assert(second === first)
  }

  test("killed mid-run, the next run resumes from the cached prefix") {
    val dir = freshDir()
    val texts = (1 to 20).map(i => s"text number $i")
    resetCalls()
    val failing = new CachingEnricher(
      new CountingEnricher(dims = 8, failAfter = 7), dir)
    // drive one text per call so exactly 7 records land before the crash
    val crashed = intercept[RuntimeException] {
      texts.foreach(t => failing.embedBatch(Seq(t)))
    }
    assert(crashed.getMessage.contains("injected failure"))
    resetCalls()
    val resumed = new CachingEnricher(new CountingEnricher(dims = 8), dir)
    val out = texts.map(t => resumed.embedBatch(Seq(t)).head)
    // only the un-cached tail is recomputed: 20 - 7 = 13 inner calls
    assert(CountingEnricher.calls.get() === 13,
      s"resume recomputed ${CountingEnricher.calls.get()} of 20")
    val plain = new DeterministicEnricher(8)
    assert(out.map(_.toSeq) ===
      texts.map(t => plain.embedBatch(Seq(t)).head.toSeq))
  }

  test("conf-key wiring: q_enrich_embedding_audit output is cache-invariant") {
    val dir = freshDir()
    val q = graft.SparkEntry.queries("q_enrich_embedding_audit")
    val bare = q(spark, sfDir).collect().toSeq
    spark.conf.set(CachingEnricher.DirKey, dir)
    try {
      val cachedRun = q(spark, sfDir).collect().toSeq
      assert(cachedRun === bare)
      val walk = Files.walk(java.nio.file.Paths.get(dir))
      val records =
        try walk.filter(Files.isRegularFile(_)).count() finally walk.close()
      assert(records > 0, "conf key set but no cache records written")
      // second run replays byte-identically
      assert(q(spark, sfDir).collect().toSeq === bare)
    } finally spark.conf.unset(CachingEnricher.DirKey)
  }
}
