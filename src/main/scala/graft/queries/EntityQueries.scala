package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.EntityResolution

/** Entity-resolution battery: fuzzy mention matching (edit distance ≤ 1
  * via the exact 1-deletion-neighborhood join) and the canonical-entity
  * clustering it feeds — the identity layer a training pipeline runs
  * before per-entity quotas or per-author dedup.
  *
  * Fixture: the customer table's names are uniform (`Customer#…`, every
  * neighbor one digit apart — a degenerate match graph), so dirty
  * mentions are synthesized deterministically in BOTH engines from
  * c_custkey (the q_corpus_pii_redact convention): an md5-derived base
  * name (high inter-customer distance), a substitution variant ('@' at a
  * key-derived position — '@' is outside the base alphabet, so distance
  * is exactly 1), a deletion variant for keys ≡0 (mod 4), and an exact
  * duplicate for keys ≡0 (mod 5) that exercises the name-level
  * contraction in [[graft.ops.EntityResolution.resolveEntities]].
  * Everything is integer/string arithmetic — both engines build
  * byte-identical mentions, and `levenshtein` (classic unit-cost edit
  * distance in both) decides ground truth identically.
  *
  * The q_er_entities mirror is deliberately the NON-contracted
  * formulation — a recursive transitive closure over the mention-level
  * pair dump (two-staged, the q_sim_clusters convention) — so agreement
  * checks that the distinct-name contraction is semantics-preserving,
  * not just that two copies of the same shortcut agree.
  */
object EntityQueries extends QueryModule {

  private val BaseLen = 20

  /** base = 'cust-' || md5(lpad(key,12,'0'))[1..8] || '-' || lpad(key,6,'0')
    * — 20 ASCII chars, unique per key, distance ≥ 2 between keys with
    * overwhelming (and in any case engine-identical) certainty. */
  private def baseName(key: Column): Column =
    concat(lit("cust-"),
      substring(md5(lpad(key.cast("string"), 12, "0")), 1, 8),
      lit("-"), lpad(key.cast("string"), 6, "0"))

  /** (c_custkey → key, base, sub1, del1): the shared deterministic
    * variant columns — base, '@'-substitution at pos = key%20, deletion
    * at pos2 = 7·key%20. */
  private def withVariants(spark: SparkSession, dir: String): DataFrame = {
    val key = col("c_custkey")
    val base = baseName(key)
    val pos = (pmod(key, lit(20)) + 1).cast("int")
    val pos2 = (pmod(key * 7, lit(20)) + 1).cast("int")
    val posB = (pmod(key + 7, lit(20)) + 1).cast("int")
    Tables.customer(spark, dir).select(key.as("key"), base.as("base"),
      concat(base.substr(lit(1), pos - 1), lit("@"),
        base.substr(pos + 1, lit(BaseLen))).as("sub1"),
      concat(base.substr(lit(1), pos2 - 1),
        base.substr(pos2 + 1, lit(BaseLen))).as("del1"),
      posB.as("posB"))
      // double substitution: '#' into sub1 at posB = (key+7)%20+1 —
      // always a DIFFERENT position than sub1's '@' at key%20+1, so
      // dsub is exactly distance 2 from base and 1 from sub1
      .withColumn("dsub", concat(col("sub1").substr(lit(1), col("posB") - 1),
        lit("#"), col("sub1").substr(col("posB") + 1, lit(BaseLen))))
      .drop("posB")
  }

  /** Deterministic mention table: up to 4 mentions per customer.
    * mention_id = 4·key + j; j=0 canonical, j=1 substitution at
    * pos = key%20, j=2 deletion at pos2 = 7·key%20 (keys ≡0 mod 4),
    * j=3 exact duplicate of the base (keys ≡0 mod 5). */
  private[queries] def mentions(spark: SparkSession, dir: String): DataFrame = {
    val key = col("key")
    val base = col("base")
    val sub1 = col("sub1")
    val del1 = col("del1")
    val variants = array(
      struct((key * 4).as("mention_id"), base.as("name"),
        lit(true).as("keep")),
      struct((key * 4 + 1).as("mention_id"), sub1.as("name"),
        lit(true).as("keep")),
      struct((key * 4 + 2).as("mention_id"), del1.as("name"),
        (pmod(key, lit(4)) === 0).as("keep")),
      struct((key * 4 + 3).as("mention_id"), base.as("name"),
        (pmod(key, lit(5)) === 0).as("keep")))
    withVariants(spark, dir)
      .select(explode(variants).as("m"))
      .where(col("m.keep"))
      .select(col("m.mention_id").as("mention_id"), col("m.name").as("name"))
  }

  /** All mention pairs within edit distance 1 — the blocked fuzzy join. */
  def erPairs(spark: SparkSession, dir: String): DataFrame =
    orderedSmall(
      EntityResolution.edOnePairs(mentions(spark, dir), "mention_id", "name"),
      col("id_a"), col("id_b"))

  /** The k=2 fixture: base + substitution always; the distance-2 double
    * substitution for even keys; the deletion (length 19 — exercises
    * the cross-length probe legs) for keys ≡0 mod 3. */
  def mentions2(spark: SparkSession, dir: String): DataFrame = {
    val key = col("key")
    val variants = array(
      struct((key * 4).as("mention_id"), col("base").as("name"),
        lit(true).as("keep")),
      struct((key * 4 + 1).as("mention_id"), col("sub1").as("name"),
        lit(true).as("keep")),
      struct((key * 4 + 2).as("mention_id"), col("dsub").as("name"),
        (pmod(key, lit(2)) === 0).as("keep")),
      struct((key * 4 + 3).as("mention_id"), col("del1").as("name"),
        (pmod(key, lit(3)) === 0).as("keep")))
    withVariants(spark, dir)
      .select(explode(variants).as("m"))
      .where(col("m.keep"))
      .select(col("m.mention_id").as("mention_id"), col("m.name").as("name"))
  }

  /** All mention pairs within edit distance 2 — PassJoin segment
    * blocking, the general-k scale path next to q_er_pairs' k=1
    * signature fast path. */
  def erPairsK2(spark: SparkSession, dir: String): DataFrame =
    orderedSmall(
      EntityResolution.passJoinPairs(mentions2(spark, dir),
        "mention_id", "name", k = 2),
      col("id_a"), col("id_b"))

  /** Canonical entities from the match graph (contracted CC path). */
  def erEntities(spark: SparkSession, dir: String): DataFrame =
    EntityResolution.resolveEntities(mentions(spark, dir),
      "mention_id", "name")
      .orderBy(col("mention_id"))

  /** Daily-refresh admission: the published dictionary is every
    * customer's canonical mention (entity_id = 4·key); today's arrivals
    * (keys ≡7 mod 10) are the substitution variant (id 4·key+1 — must
    * match its canonical at distance 1) and a '-x'-suffixed novel name
    * (id 4·key+2, length 22 vs the dictionary's 20 → distance ≥ 2 from
    * EVERYTHING, must mint). */
  def erAdmission(spark: SparkSession, dir: String): DataFrame = {
    val v = withVariants(spark, dir)
    val dict = v.select((col("key") * 4).as("mention_id"),
      col("base").as("name"))
    val inc = v.where(pmod(col("key"), lit(10)) === 7)
      .select(explode(array(
        struct((col("key") * 4 + 1).as("mention_id"),
          col("sub1").as("name")),
        struct((col("key") * 4 + 2).as("mention_id"),
          concat(col("base"), lit("-x")).as("name")))).as("m"))
      .select(col("m.mention_id").as("mention_id"),
        col("m.name").as("name"))
    EntityResolution.admitMentions(dict, inc, "mention_id", "name")
      .transform(orderedSmall(_, col("mention_id")))
  }

  private val SnWindow = 6

  /** Sorted-neighborhood blocking over the same mention fixture —
    * two passes (name, reversed name), window 6, verified at
    * distance ≤ 1. The budgeted alternative to q_er_pairs' exact
    * signature join: candidates are a hard 2·5·N, recall rides the
    * sort keys (the reversed pass recovers early-position edits the
    * forward sort scatters). */
  def erPairsSn(spark: SparkSession, dir: String): DataFrame =
    EntityResolution.sortedNeighborhoodPairs(mentions(spark, dir),
      "mention_id", "name", window = SnWindow, maxDist = 1,
      keys = Seq(identity, reverse))
      .transform(orderedSmall(_, col("id_a"), col("id_b")))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_er_pairs" -> erPairs,
    "q_er_pairs_sn" -> erPairsSn,
    "q_er_pairs_k2" -> erPairsK2,
    "q_er_entities" -> erEntities,
    "q_er_admission" -> erAdmission)

  /** The variant CTE, mirrored clause for clause (md5/lpad/substr are
    * byte-identical across engines; % on the non-negative key ≡ pmod). */
  private val variantsCte: String =
    """variants AS (
      |  SELECT c_custkey, base, sub1, del1,
      |    substr(sub1, 1, posB - 1) || '#' || substr(sub1, posB + 1) AS dsub
      |  FROM (
      |    SELECT c_custkey, base,
      |      substr(base, 1, pos - 1) || '@' || substr(base, pos + 1) AS sub1,
      |      substr(base, 1, pos2 - 1) || substr(base, pos2 + 1) AS del1,
      |      CAST((c_custkey + 7) % 20 + 1 AS INTEGER) AS posB
      |    FROM (
      |      SELECT c_custkey,
      |        'cust-' ||
      |          substr(md5(lpad(CAST(c_custkey AS VARCHAR), 12, '0')), 1, 8) ||
      |          '-' || lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS base,
      |        CAST(c_custkey % 20 + 1 AS INTEGER) AS pos,
      |        CAST((c_custkey * 7) % 20 + 1 AS INTEGER) AS pos2
      |      FROM customer)))""".stripMargin

  private val mentionsCte: String = variantsCte + """,
      |mentions AS (
      |  SELECT mention_id, name FROM (
      |    SELECT c_custkey * 4 + v.j AS mention_id,
      |      CASE v.j WHEN 1 THEN sub1 WHEN 2 THEN del1 ELSE base END AS name,
      |      CASE v.j WHEN 2 THEN c_custkey % 4 = 0
      |               WHEN 3 THEN c_custkey % 5 = 0
      |               ELSE TRUE END AS keep
      |    FROM variants,
      |    (SELECT unnest([0, 1, 2, 3]) AS j) v)
      |  WHERE keep)""".stripMargin

  private def erPairsSql: String =
    s"""WITH $mentionsCte,
       |sigs AS (
       |  SELECT mention_id, name, md5(name) AS h FROM mentions
       |  UNION ALL
       |  SELECT mention_id, name,
       |    md5(substr(name, 1, i - 1) || substr(name, i + 1)) AS h
       |  FROM (SELECT mention_id, name,
       |          unnest(generate_series(1, length(name))) AS i
       |        FROM mentions)),
       |cand AS (
       |  SELECT DISTINCT a.mention_id AS id_a, b.mention_id AS id_b,
       |    a.name AS name_a, b.name AS name_b
       |  FROM sigs a JOIN sigs b ON a.h = b.h
       |  WHERE a.mention_id < b.mention_id)
       |SELECT id_a, id_b, name_a, name_b,
       |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev
       |FROM cand
       |WHERE levenshtein(name_a, name_b) <= 1
       |ORDER BY id_a, id_b""".stripMargin

  /** Two-staged (reads the PRE-VERIFIED q_er_pairs dump — its own oracle
    * row independently rebuilds the signature join), then recomputes the
    * clustering as a recursive reach over MENTION-level pairs: the
    * un-contracted ground truth the contracted Spark path must equal. */
  private def erEntitiesSql: String =
    s"""WITH RECURSIVE $mentionsCte,
       |prs AS (
       |  SELECT CAST(id_a AS BIGINT) AS a, CAST(id_b AS BIGINT) AS b
       |  FROM read_parquet('${QueryModule.VerifyOutToken}/q_er_pairs/*.parquet')),
       |sym AS (SELECT a AS s, b AS d FROM prs
       |        UNION SELECT b, a FROM prs),
       |reach AS (
       |  SELECT mention_id AS src, mention_id AS dst FROM mentions
       |  UNION
       |  SELECT r.src, e.d FROM reach r JOIN sym e ON e.s = r.dst),
       |lab AS (
       |  SELECT src AS mention_id, MIN(dst) AS entity_id
       |  FROM reach GROUP BY src),
       |sz AS (
       |  SELECT entity_id, COUNT(*) AS entity_size FROM lab GROUP BY 1)
       |SELECT m.mention_id, m.name, l.entity_id, s.entity_size,
       |  m.mention_id = l.entity_id AS is_canonical
       |FROM mentions m
       |JOIN lab l USING (mention_id)
       |JOIN sz s USING (entity_id)
       |ORDER BY mention_id""".stripMargin

  /** Self-contained (non-recursive) admission mirror: same dictionary,
    * same arrivals, same signature join, same min-entity tie rule. */
  private def erAdmissionSql: String =
    s"""WITH $variantsCte,
       |dict AS (
       |  SELECT c_custkey * 4 AS entity_id, base AS name FROM variants),
       |inc AS (
       |  SELECT c_custkey * 4 + 1 AS mention_id, sub1 AS name
       |  FROM variants WHERE c_custkey % 10 = 7
       |  UNION ALL
       |  SELECT c_custkey * 4 + 2, base || '-x'
       |  FROM variants WHERE c_custkey % 10 = 7),
       |dsig AS (
       |  SELECT entity_id, name, md5(name) AS h FROM dict
       |  UNION ALL
       |  SELECT entity_id, name,
       |    md5(substr(name, 1, i - 1) || substr(name, i + 1)) AS h
       |  FROM (SELECT entity_id, name,
       |          unnest(generate_series(1, length(name))) AS i
       |        FROM dict)),
       |isig AS (
       |  SELECT mention_id, name, md5(name) AS h FROM inc
       |  UNION ALL
       |  SELECT mention_id, name,
       |    md5(substr(name, 1, i - 1) || substr(name, i + 1)) AS h
       |  FROM (SELECT mention_id, name,
       |          unnest(generate_series(1, length(name))) AS i
       |        FROM inc)),
       |hits AS (
       |  SELECT DISTINCT i.mention_id, i.name AS iname,
       |    d.entity_id, d.name AS dname
       |  FROM isig i JOIN dsig d ON i.h = d.h),
       |matched AS (
       |  SELECT mention_id, MIN(entity_id) AS m FROM hits
       |  WHERE levenshtein(iname, dname) <= 1 GROUP BY 1)
       |SELECT i.mention_id, i.name,
       |  COALESCE(t.m, i.mention_id) AS entity_id,
       |  t.m IS NULL AS is_new
       |FROM inc i LEFT JOIN matched t USING (mention_id)
       |ORDER BY mention_id""".stripMargin

  /** PassJoin mirror: the same even segment partition, probe windows as
    * constant ±2 offset series (no laterals), candidate canonicalization
    * and exact verify — independent only in dialect, so the SPEC-level
    * brute-force equality (EntityResolutionSpec) is the semantic anchor
    * and this mirror checks the engines execute the same algorithm on
    * the same fixture. */
  private def erPairsK2Sql: String =
    s"""WITH $variantsCte,
       |mentions2 AS (
       |  SELECT mention_id, name FROM (
       |    SELECT c_custkey * 4 + v.j AS mention_id,
       |      CASE v.j WHEN 1 THEN sub1 WHEN 2 THEN dsub
       |               WHEN 3 THEN del1 ELSE base END AS name,
       |      CASE v.j WHEN 2 THEN c_custkey % 2 = 0
       |               WHEN 3 THEN c_custkey % 3 = 0
       |               ELSE TRUE END AS keep
       |    FROM variants,
       |    (SELECT unnest([0, 1, 2, 3]) AS j) v)
       |  WHERE keep),
       |m AS (SELECT mention_id, name, length(name) AS lent
       |      FROM mentions2 WHERE length(name) >= 3),
       |segs AS (
       |  SELECT mention_id AS id_a, name AS name_a, lent AS l, i.i AS i,
       |    i.i * (lent // 3) + least(i.i, lent % 3) + 1 AS start,
       |    md5(substr(name, i.i * (lent // 3) + least(i.i, lent % 3) + 1,
       |      (lent // 3) + CASE WHEN i.i < lent % 3 THEN 1 ELSE 0 END)) AS h
       |  FROM m, (SELECT unnest(generate_series(0, 2)) AS i) i),
       |probe_li AS (
       |  SELECT mention_id AS id_b, name AS name_b, lent,
       |    lent + dl.dl AS l, i.i AS i,
       |    ((lent + dl.dl) // 3)
       |      + CASE WHEN i.i < (lent + dl.dl) % 3 THEN 1 ELSE 0 END AS seglen,
       |    i.i * ((lent + dl.dl) // 3)
       |      + least(i.i, (lent + dl.dl) % 3) + 1 AS start
       |  FROM m,
       |    (SELECT unnest(generate_series(-2, 2)) AS dl) dl,
       |    (SELECT unnest(generate_series(0, 2)) AS i) i),
       |probes AS (
       |  SELECT id_b, name_b, l, i, start + d.d AS p,
       |    md5(substr(name_b, start + d.d, seglen)) AS h
       |  FROM probe_li, (SELECT unnest(generate_series(-2, 2)) AS d) d
       |  WHERE seglen >= 1 AND start + d.d >= 1
       |    AND start + d.d + seglen - 1 <= lent),
       |cand AS (
       |  SELECT DISTINCT
       |    least(s.id_a, p.id_b) AS id_a, greatest(s.id_a, p.id_b) AS id_b,
       |    CASE WHEN s.id_a < p.id_b THEN s.name_a ELSE p.name_b END AS name_a,
       |    CASE WHEN s.id_a < p.id_b THEN p.name_b ELSE s.name_a END AS name_b
       |  FROM segs s JOIN probes p ON s.l = p.l AND s.i = p.i AND s.h = p.h
       |  WHERE s.id_a <> p.id_b AND abs(p.p - s.start) <= 2)
       |SELECT id_a, id_b, name_a, name_b,
       |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev
       |FROM cand WHERE levenshtein(name_a, name_b) <= 2
       |ORDER BY id_a, id_b""".stripMargin

  /** SN mirror: two ROW_NUMBER passes (name / reversed name, id
    * tiebreak — MintRank's exact total order), window join on rank
    * distance 1..5, UNION de-dup, exact levenshtein verify. */
  private def erPairsSnSql: String = {
    def pass(orderKey: String) =
      s"""  SELECT LEAST(a.mention_id, b.mention_id) AS id_a,
         |    GREATEST(a.mention_id, b.mention_id) AS id_b,
         |    CASE WHEN a.mention_id < b.mention_id THEN a.name ELSE b.name END AS name_a,
         |    CASE WHEN a.mention_id < b.mention_id THEN b.name ELSE a.name END AS name_b
         |  FROM (SELECT mention_id, name,
         |          ROW_NUMBER() OVER (ORDER BY $orderKey, name, mention_id) AS rnk
         |        FROM mentions) a
         |  JOIN (SELECT mention_id, name,
         |          ROW_NUMBER() OVER (ORDER BY $orderKey, name, mention_id) AS rnk
         |        FROM mentions) b
         |    ON b.rnk > a.rnk AND b.rnk <= a.rnk + ${SnWindow - 1}""".stripMargin
    s"""WITH $mentionsCte,
       |cand AS (
       |${pass("name")}
       |  UNION
       |${pass("reverse(name)")})
       |SELECT id_a, id_b, name_a, name_b,
       |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev
       |FROM cand
       |WHERE levenshtein(name_a, name_b) <= 1
       |ORDER BY id_a, id_b""".stripMargin
  }

  override def oracle: Map[String, String] = Map(
    "q_er_pairs" -> erPairsSql,
    "q_er_pairs_sn" -> erPairsSnSql,
    "q_er_pairs_k2" -> erPairsK2Sql,
    "q_er_entities" -> erEntitiesSql,
    "q_er_admission" -> erAdmissionSql)
}
