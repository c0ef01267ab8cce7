package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The 1-deletion-neighborhood fuzzy join must equal brute-force
  * Levenshtein-≤1 all-pairs EXACTLY (the signature family is a theorem:
  * ed(s,t) ≤ 1 ⟺ sig(s) ∩ sig(t) ≠ ∅), and the contracted entity path
  * must be semantics-preserving under exact-duplicate name skew.
  */
class EntityResolutionSpec extends SparkSpecBase {
  import spark.implicits._

  // equal pair, substitution, deletion, insertion, transposition (=2),
  // distance-2 substitutions, short strings, single chars
  private val names = Seq(
    1L -> "alpha", 2L -> "alpha", // equal (lev 0)
    3L -> "alpht", // substitution of 1
    4L -> "alph", // deletion of 1
    5L -> "alphas", // insertion on 1
    6L -> "lapha", // transposition of 1 → lev 2, must NOT match 1
    7L -> "alpXY", // two substitutions → lev 2 vs 1
    8L -> "b", 9L -> "c", // lev 1 (single-char sub)
    10L -> "", // empty: lev 1 vs single chars
    11L -> "zeta", 12L -> "zelda") // lev 2, must not match

  private def brutePairs = {
    val m = names.toDF("id", "name")
    val a = m.select(col("id").as("id_a"), col("name").as("name_a"))
    val b = m.select(col("id").as("id_b"), col("name").as("name_b"))
    a.crossJoin(b) // test-only oracle: 12×12
      .where(col("id_a") < col("id_b"))
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("lev") <= 1)
      .select("id_a", "id_b", "lev")
  }

  test("edOnePairs equals brute-force all-pairs at distance <= 1") {
    val got = EntityResolution
      .edOnePairs(names.toDF("id", "name"), "id", "name")
      .select("id_a", "id_b", "lev")
    val expect = brutePairs
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      s"signature join diverged from brute force:\n got=${got.collect().toSeq
        .sortBy(r => (r.getLong(0), r.getLong(1)))}\n exp=${expect.collect()
        .toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))}")
  }

  test("covers substitution, deletion, insertion; excludes distance 2") {
    val got = EntityResolution
      .edOnePairs(names.toDF("id", "name"), "id", "name")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 3L)), "substitution pair missing")
    assert(got.contains((1L, 4L)), "deletion pair missing")
    assert(got.contains((1L, 5L)), "insertion pair missing")
    assert(got.contains((1L, 2L)), "exact-equal pair missing")
    assert(!got.contains((1L, 6L)), "transposition is distance 2 — must not match")
    assert(!got.contains((1L, 7L)), "double substitution must not match")
    assert(!got.contains((11L, 12L)), "zeta/zelda is distance 2")
  }

  test("resolveEntities: canonical min id, sizes count mentions, dup-name contraction") {
    // two entities: {alpha×2, alpht, alph, alphas} and {b, c};
    // empty-string and single chars chain: "" matches b and c → {8,9,10}
    // merges with nothing else; zeta/zelda singletons
    val out = EntityResolution
      .resolveEntities(names.toDF("id", "name"), "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq.sortBy(_._1)
    val byId = out.map(t => t._1 -> t).toMap
    // entity of mention 1 holds 1,2,3,4,5 (lapha is lev2 from alpha)
    assert(byId(1L)._2 == 1L && byId(1L)._3 == 5L && byId(1L)._4)
    assert(byId(2L)._2 == 1L && !byId(2L)._4,
      "exact-duplicate mention must join entity 1 via name contraction")
    assert(byId(5L)._2 == 1L)
    assert(byId(6L)._2 == 6L && byId(6L)._3 == 1L, "lapha is its own entity")
    // "", "b", "c" all within distance 1 of each other's members
    assert(byId(8L)._2 == 8L && byId(8L)._3 == 3L)
    assert(byId(10L)._2 == 8L)
    assert(byId(11L)._2 == 11L && byId(12L)._2 == 12L)
  }

  // PassJoin k=2 fixture: length >= 3 (the documented floor), mixed
  // lengths, pairs at distance 0/1/2 and negatives at 3+
  private val names2 = Seq(
    1L -> "alphabet", 2L -> "alphabet", // equal
    3L -> "alphabXt", // 1 sub
    4L -> "alphaXYt", // 2 subs
    5L -> "alphabe", // 1 del
    6L -> "alphab", // 2 dels
    7L -> "alphabets", // 1 ins
    8L -> "alphabetsz", // 2 ins
    9L -> "laphabet", // transposition = 2
    10L -> "alpXYZet", // 3 subs — must NOT match 1 (lev 3)
    11L -> "zebra", 12L -> "zebr", 13L -> "zbr", // chain of dels
    14L -> "abc", 15L -> "axc", 16L -> "xyc") // short strings

  test("passJoinPairs equals brute-force all-pairs at distance <= 2") {
    val m = names2.toDF("id", "name")
    val got = EntityResolution.passJoinPairs(m, "id", "name", k = 2)
      .select("id_a", "id_b", "lev")
    val a = m.select(col("id").as("id_a"), col("name").as("name_a"))
    val b = m.select(col("id").as("id_b"), col("name").as("name_b"))
    val expect = a.crossJoin(b) // test-only oracle: 16×16
      .where(col("id_a") < col("id_b"))
      .withColumn("lev",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("lev") <= 2)
      .select("id_a", "id_b", "lev")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      s"PassJoin diverged from brute force:\n got=${got.collect().toSeq
        .sortBy(r => (r.getLong(0), r.getLong(1)))}\n exp=${expect.collect()
        .toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))}")
    val pairs = got.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 9L)), "transposition (lev 2) must match at k=2")
    assert(!pairs.contains((1L, 10L)), "lev-3 pair must not match")
    assert(pairs.contains((11L, 13L)), "two deletions across lengths must match")
  }

  test("admitMentions: min-entity tie rule and novel minting") {
    val dict = Seq(10L -> "aa", 20L -> "ab").toDF("id", "name")
    val inc = Seq(5L -> "ac", 6L -> "zz").toDF("id", "name")
    val out = EntityResolution.admitMentions(dict, inc, "id", "name")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(5L) == (10L, false),
      "ambiguous hit must take the MINIMUM entity id")
    assert(out(6L) == (6L, true), "unmatched mention must mint itself")
  }

  test("deletion signatures: count and content") {
    val sig = names.toDF("id", "name").where(col("id") === 3L)
      .select(explode(EntityResolution.deletionSignatures(col("name")))
        .as("s")).as[String].collect().toSeq
    assert(sig == Seq("alpht", "lpht", "apht", "alht", "alpt", "alph"))
  }
}
