package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Scale-ladder contracts for the OTHER near-dup pair generators
  * (AdaptiveLshSpec pins the cosine family): candidate-join volume for
  * the MinHash-LSH, SimHash-band, and winnowing-fingerprint generators
  * must grow sub-quadratically when the corpus' true near-dup structure
  * is linear — the regression this catches is banding/bucketing
  * collapsing to effectively-constant keys (the r3 trap: 8-bit simhash
  * bands, frozen LSH depth), where random bucket collisions — the
  * birthday term — dominate and candidate growth goes quadratic no
  * matter what the data looks like.
  *
  * Two corpora are used deliberately:
  *  - The FIXTURE ladder (sf0.01 → sf0.1) works for MinHash, whose
  *    2×64-bit band keys have effectively unbounded cardinality, so
  *    pair selectivity falls as the corpus grows. It is NOT a valid
  *    sub-quadratic probe for simhash/winnow: the fixture plants
  *    template families whose size scales with the corpus, so the TRUE
  *    pair structure (shared 16-bit bands at hamming 9–20; shared
  *    winnow grams) is itself quadratic-in-family-size — measured
  *    candidate selectivity is flat at ~1.5% (simhash) and the raw fp
  *    join carries multiple rows per real pair (winnow). Output-bound
  *    candidates are the correct behavior there (AdaptiveLshSpec's
  *    birthday-share check pins it); a generator cannot emit fewer
  *    candidates than true structure.
  *  - The SYNTHETIC ladder plants LINEAR structure — one near-dup
  *    partner per 10 docs over a 50k-word vocabulary, so cross-doc
  *    collisions happen only via the planted pairs — and asserts
  *    candidates grow ≤ 3× the corpus ratio (quadratic would be
  *    ratio² = 25×). Constant-cardinality keys fail this by an order
  *    of magnitude: e.g. 8-bit simhash bands put the birthday term at
  *    ~2.8k candidates already at n=600 and ~70k at n=3000, a 25×
  *    jump. Each family also proves it still FINDS the planted pairs,
  *    so vacuous selectivity (no candidates at all) cannot pass.
  */
class PairScaleLadderSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfS = "/root/testdata/sf0.01"
  private val sfL = "/root/testdata/sf0.1"

  // ---- fixture ladder (minhash only; see scaladoc) ----

  test("minhash LSH banding: fixture-ladder selectivity falls with scale") {
    def stats(dir: String): (Long, Long) = {
      val sig = Dedup.minhashSignature(
        graft.Tables.documents(spark, dir), "doc_id", "text")
      val n = sig.count()
      val cand = bandJoinRows(sig)
      (n, cand)
    }
    val (nS, candS) = stats(sfS)
    val (nL, candL) = stats(sfL)
    val selS = candS.toDouble / (nS.toDouble * (nS - 1) / 2)
    val selL = candL.toDouble / (nL.toDouble * (nL - 1) / 2)
    info(f"minhash fixture: n=$nS cand=$candS sel=$selS%.6f -> n=$nL cand=$candL sel=$selL%.6f")
    assert(nL >= nS * 5, s"fixture ladder collapsed ($nS -> $nL)")
    assert(selL < selS * 0.9,
      f"selectivity $selS%.6f -> $selL%.6f — minhash band keys are " +
        "no longer splitting the corpus (constant-key trap)")
  }

  // ---- synthetic ladder: linear planted structure, all 3 families ----

  /** n docs of 30 random 6-letter words; every 10th doc gets a near-dup
    * partner (id + 1_000_000) differing in ONE word. True near-dup
    * structure is exactly n/10 pairs — linear in n. Words are random
    * letter strings (not "w<int>") so documents share no character
    * 8-grams by accident — cross-doc collisions happen only via the
    * planted pairs, keeping the ladder's expected growth exactly
    * linear for all three fingerprint families. */
  private def planted(n: Int, seed: Int): (DataFrame, Long) = {
    val rnd = new scala.util.Random(seed)
    def word(): String = Array.fill(6)(('a' + rnd.nextInt(26)).toChar).mkString
    val rows = (0 until n).flatMap { i =>
      val words = Array.fill(30)(word())
      val doc = (i.toLong, words.mkString(" "))
      if (i % 10 == 0) {
        val dup = words.clone(); dup(17) = word()
        Seq(doc, (i.toLong + 1000000L, dup.mkString(" ")))
      } else Seq(doc)
    }
    (rows.toDF("doc_id", "text"), n.toLong / 10)
  }

  /** Raw band-join candidate rows for an 8-perm minhash signature frame. */
  private def bandJoinRows(sig: DataFrame): Long = {
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        col(s"m${b * 2}").as("v0"), col(s"m${b * 2 + 1}").as("v1"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.v0").as("v0"), col("bs.v1").as("v1"))
    banded.select(col("doc_id").as("id_a"), col("band"), col("v0"), col("v1"))
      .join(banded.select(col("doc_id").as("id_b"),
        col("band"), col("v0"), col("v1")), Seq("band", "v0", "v1"))
      .filter(col("id_a") < col("id_b")).count()
  }

  private def simhashBandRows(docs: DataFrame): Long = {
    val s = Dedup.simhash64(docs, "doc_id", "text")
    val banded = s.select(col("doc_id"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("k"),
          shiftrightunsigned(col("simhash"), 16 * k)
            .bitwiseAND(lit(65535L)).as("band"))): _*)).as("b"))
      .select(col("doc_id"), col("b.k").as("k"), col("b.band").as("band"))
    banded.select(col("doc_id").as("id_a"), col("k"), col("band"))
      .join(banded.select(col("doc_id").as("id_b"), col("k"), col("band")),
        Seq("k", "band"))
      .filter(col("id_a") < col("id_b")).count()
  }

  private def winnowJoinRows(docs: DataFrame): Long = {
    val fps = docs.select(col("doc_id"),
      explode(array_distinct(
        graft.functions.GraftFunctions.winnow(col("text"), 8, 8))).as("fp"))
    fps.select(col("doc_id").as("id_a"), col("fp"))
      .join(fps.select(col("doc_id").as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") < col("id_b")).count()
  }

  /** Planted pairs found by a candidate-pair frame (id_a, id_b). */
  private def foundPlanted(pairs: DataFrame): Long =
    pairs.filter(col("id_b") === col("id_a") + 1000000L).count()

  private def ladder(name: String, rows: DataFrame => Long,
      found: DataFrame => Long, minRecall: Double): Unit = {
    val (small, plantedS) = planted(600, seed = 7)
    val (big, plantedL) = planted(3000, seed = 11)
    val candS = rows(small)
    val candL = rows(big)
    val scale = 3000.0 / 600.0
    info(s"$name synthetic: n=600 cand=$candS (planted $plantedS) -> " +
      s"n=3000 cand=$candL (planted $plantedL)")
    // sub-quadratic: 5x corpus with linear structure -> ≤ 15x candidates
    // (quadratic / constant-key banding gives ~25x and far larger
    // absolute counts). max(..,50) keeps tiny-count ratios meaningful.
    assert(candL <= math.max(candS, 50L) * scale * 3,
      s"$name: $candS -> $candL candidates at ${scale}x corpus with " +
        "linear planted structure — bucketing has gone quadratic")
    // non-vacuous: the generator still finds the planted near-dups
    // (bound once — assert's clue string is eager, and found() runs a
    // full Spark pair-generation job)
    val foundL = found(big)
    assert(foundL >= (plantedL * minRecall).toLong,
      s"$name: found $foundL of $plantedL planted pairs")
  }

  test("minhash LSH banding: synthetic-ladder growth is sub-quadratic") {
    ladder("minhash",
      docs => bandJoinRows(Dedup.minhashSignature(docs, "doc_id", "text")),
      docs => foundPlanted(
        Dedup.lshPairs(
          Dedup.minhashSignature(docs, "doc_id", "text"), "doc_id")),
      // 1-of-30-words edit: E[sig match per band] keeps recall high but
      // not 1.0; require a solid majority
      minRecall = 0.5)
  }

  test("simhash 16-bit banding: synthetic-ladder growth is sub-quadratic") {
    ladder("simhash", simhashBandRows,
      docs => {
        val s = Dedup.simhash64(docs, "doc_id", "text")
        val banded = s.select(col("doc_id"),
          explode(array((0 until 4).map(k =>
            struct(lit(k).as("k"),
              shiftrightunsigned(col("simhash"), 16 * k)
                .bitwiseAND(lit(65535L)).as("band"))): _*)).as("b"))
          .select(col("doc_id"), col("b.k").as("k"), col("b.band").as("band"))
        foundPlanted(banded.select(col("doc_id").as("id_a"), col("k"), col("band"))
          .join(banded.select(col("doc_id").as("id_b"), col("k"), col("band")),
            Seq("k", "band"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct())
      },
      minRecall = 0.5)
  }

  test("winnow fingerprint join: synthetic-ladder growth is sub-quadratic") {
    ladder("winnow", winnowJoinRows,
      docs => {
        val fps = docs.select(col("doc_id"),
          explode(array_distinct(
            graft.functions.GraftFunctions.winnow(col("text"), 8, 8))).as("fp"))
        foundPlanted(fps.select(col("doc_id").as("id_a"), col("fp"))
          .join(fps.select(col("doc_id").as("id_b"), col("fp")), Seq("fp"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct())
      },
      minRecall = 0.9)
  }

  /** Planted mentions: md5-distinct 19-char base + one '@' substitution
    * partner per mention — true distance-≤1 structure is exactly n
    * pairs, cross-base signature collisions essentially none. */
  private def erPlanted(n: Int): DataFrame = {
    val key = col("id")
    val base = concat(lit("m-"), substring(md5(key.cast("string")), 1, 10),
      lit("-"), lpad(pmod(key, lit(1000000)).cast("string"), 6, "0"))
    val pos = (pmod(key, lit(19)) + 1).cast("int")
    spark.range(n).select(explode(array(
      struct(key.as("doc_id"), base.as("name")),
      struct((key + 1000000L).as("doc_id"),
        concat(base.substr(lit(1), pos - 1), lit("@"),
          base.substr(pos + 1, lit(19))).as("name")))).as("m"))
      .select(col("m.doc_id").as("doc_id"), col("m.name").as("name"))
  }

  test("ER 1-deletion signature join: linear growth, recall exactly 1") {
    def cand(m: DataFrame): Long = {
      val sigs = EntityResolution.signatureFrame(m, "doc_id", "name")
      sigs.select(col("_h"), col("_id").as("id_a"))
        .join(sigs.select(col("_h"), col("_id").as("id_b")), Seq("_h"))
        .filter(col("id_a") < col("id_b")).count()
    }
    val candS = cand(erPlanted(600))
    val candL = cand(erPlanted(3000))
    val scale = 3000.0 / 600.0
    info(s"er-signatures synthetic: n=600 cand=$candS -> n=3000 cand=$candL")
    assert(candL <= math.max(candS, 50L) * scale * 3,
      s"er-signatures: $candS -> $candL candidate rows at ${scale}x corpus " +
        "with linear planted structure — the signature join grew a hot block")
    // the 1-deletion family is a THEOREM at k=1, so unlike the sketch
    // generators recall is exactly 1.0, not a lower bound
    val found = EntityResolution.edOnePairs(erPlanted(3000), "doc_id", "name")
      .filter(col("id_b") === col("id_a") + 1000000L).count()
    assert(found == 3000L,
      s"er-signatures: found $found of 3000 planted pairs — exactness broken")
  }
}
