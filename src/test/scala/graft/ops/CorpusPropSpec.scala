package graft.ops

import graft.{PropCheck, SparkSpecBase}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the round-5 corpus operators: packing tiles any
  * token stream exactly; the as-of match is always the maximum eligible
  * right row. Random cases run through the REAL Spark operators on
  * small frames (deterministic seed via PropCheck). */
class CorpusPropSpec extends SparkSpecBase with PropCheck {
  import spark.implicits._

  private val docsGen: Gen[List[Int]] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 40)))

  test("packSequences: tiles any stream — spans abut, indices consistent") {
    forAll(docsGen, n = 25) { lens =>
      val df = lens.zipWithIndex.map { case (l, i) =>
        (i.toLong, "s", Seq.fill(l)("w").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val out = CorpusFilters.packSequences(df, "doc_id", "source", "text", 16)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
      // (n_toks, cum_start, first_seq, last_seq, seq_offset, n_splits)
      var expectStart = 0L
      out.foreach { case (n, start, first, last, off, splits) =>
        assert(start === expectStart)
        assert(first === start / 16)
        assert(last === math.max(start + n - 1, start) / 16)
        assert(off === start % 16)
        assert(splits === last - first)
        expectStart = start + n
      }
    }
  }

  private case class AsofCase(rights: List[(Long, Long)], lefts: List[(Long, Long)])

  private val asofGen: Gen[AsofCase] = for {
    nr <- Gen.chooseNum(0, 8)
    nl <- Gen.chooseNum(1, 8)
    rts <- Gen.listOfN(nr, Gen.chooseNum(0L, 30L))
    lts <- Gen.listOfN(nl, Gen.chooseNum(0L, 30L))
  } yield AsofCase(
    rts.zipWithIndex.map { case (t, i) => (100L + i, t) },
    lts.zipWithIndex.map { case (t, i) => (200L + i, t) })

  private val corpusGen: Gen[List[String]] = {
    // tiny vocabulary forces cross-doc tile collisions
    val word = Gen.oneOf("a", "b", "c", "d")
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 10).flatMap(l =>
        Gen.listOfN(l, word).map(_.mkString(" ")))))
  }

  test("dropDuplicatedSubstrings: agrees with an in-memory first-seen fold") {
    forAll(corpusGen, n = 25) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = CorpusFilters.dropDuplicatedSubstrings(df, "doc_id", "text", 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      // reference model: global first-seen over (doc, tile) in order
      val seen = scala.collection.mutable.Set[String]()
      texts.zipWithIndex.foreach { case (t, i) =>
        val tiles = t.split("\\s+").grouped(3).map(_.mkString(" ")).toSeq
        val kept = tiles.filter(g => seen.add(g))
        val fp = java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString(" ").getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        assert(out(i.toLong) === ((tiles.length.toLong, kept.length.toLong, fp)),
          s"doc $i of $texts")
      }
    }
  }

  test("dropDuplicatedSubstrings: one adversarially long doc streams through") {
    // One 30k-word doc (10k tiles, heavy within-doc repetition from the
    // 4-word vocabulary) among normal docs: the rebuild must stream the
    // giant doc through the sorted iterator — this case would blow a
    // per-group collect_list buffer quadratically before r8's rewrite —
    // and still agree with the in-memory first-seen model.
    val rnd = new scala.util.Random(42)
    val vocab = Array("a", "b", "c", "d")
    val giant = Seq.fill(30000)(vocab(rnd.nextInt(4))).mkString(" ")
    val texts = Seq("a b c d a b", giant, "d c b a", "a a a b b b c c c")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = CorpusFilters.dropDuplicatedSubstrings(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val seen = scala.collection.mutable.Set[String]()
    texts.zipWithIndex.foreach { case (t, i) =>
      val tiles = t.split("\\s+").grouped(3).map(_.mkString(" ")).toSeq
      val kept = tiles.filter(g => seen.add(g))
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(out(i.toLong) === ((tiles.length.toLong, kept.length.toLong, fp)),
        s"doc $i")
    }
  }

  test("asofJoin: match is exactly the max eligible (ts, id) right row") {
    forAll(asofGen, n = 25) { c =>
      def mk(rows: List[(Long, Long)]) =
        rows.toDF("event_id", "secs")
          .select(col("event_id"), lit(1L).as("user_id"),
            to_timestamp(col("secs")).as("ts"))
      val out = AsofJoin.asofJoin(mk(c.lefts), mk(c.rights), "user_id", "ts",
        Seq("event_id"), "event_id", "r_")
        .select("event_id", "r_event_id")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      c.lefts.foreach { case (lid, lts) =>
        val eligible = c.rights.filter(_._2 <= lts)
        val expected =
          if (eligible.isEmpty) None
          else Some(eligible.maxBy { case (rid, rts) => (rts, rid) }._1)
        assert(out(lid) === expected,
          s"left $lid@$lts: got ${out(lid)}, want $expected of $eligible")
      }
    }
  }
}
