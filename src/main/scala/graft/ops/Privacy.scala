package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-preserving release primitives — the scrubbing stage between
  * raw user-event data and anything that leaves the boundary (training
  * corpora, dashboards, partner exports). Complements the PII layer in
  * [[CorpusFilters]] (which rewrites text): these operators bound
  * re-identification risk of AGGREGATES.
  *
  * Reference behavior anchor: the reference exports per-document
  * catalogs verbatim (iris-project-database-refresh has no privacy
  * layer); this module is part of the beyond-reference training-
  * pipeline surface.
  */
object Privacy {

  /** k-anonymous aggregate release with a two-level generalization
    * ladder (Sweeney 2002, Samarati 2001 — public literature): the
    * quasi-identifier is (type, value bucket); a cell is released only
    * when ≥ k DISTINCT users contribute to it. Cells failing at the
    * fine bucket width generalize to the coarse width; cells failing
    * there fall into one per-type suppressed remainder whose counts
    * are themselves NULLed unless the remainder reaches k — so NO
    * emitted count describes fewer than k users (KAnonSpec pins the
    * invariant, plus conservation: released + suppressed events = all
    * events, nothing counted twice).
    *
    * Scale posture: two (type, bucket) aggregates with map-side
    * partial counts, two anti-joins on the released cell keys (cell
    * cardinality ≪ event cardinality — it is bounded by the bucketed
    * value domain), one per-type rollup. All equi-joins; no windows,
    * no driver state. countDistinct is exact here because the release
    * decision must be exact — at 100 TB the PRE-screen can use the HLL
    * sketch family to skip obviously-releasable cells, but the final
    * gate stays exact (an approximate k is not k-anonymity).
    *
    * Output: (typeCol, level ∈ fine|coarse|suppressed, bucket_lo —
    * NULL for suppressed, n_users, n_events — NULL when the suppressed
    * remainder is under k). */
  def kAnonRelease(events: DataFrame, typeCol: String, userCol: String,
      valueCol: String, k: Int, fineWidth: Double = 10.0,
      coarseWidth: Double = 100.0): DataFrame = {
    require(k >= 2, s"kAnonRelease: k must be >= 2, got $k")
    require(coarseWidth > fineWidth && fineWidth > 0,
      s"kAnonRelease: need coarseWidth > fineWidth > 0, " +
        s"got $coarseWidth / $fineWidth")
    def bucket(width: Double) =
      (floor(col(valueCol) / width).cast("double") * width).as("_b")
    val e = events.select(col(typeCol).as("_t"), col(userCol).as("_u"),
      bucket(fineWidth), bucket(coarseWidth).as("_bc"))

    def release(df: DataFrame, bucketCol: String) =
      df.groupBy(col("_t"), col(bucketCol).as("_bucket"))
        .agg(countDistinct(col("_u")).as("n_users"),
          count(lit(1)).as("n_events"))
    val fine = release(e, "_b")
    val fineOk = fine.where(col("n_users") >= k)
    val rest = e.join(fineOk.select(col("_t"), col("_bucket").as("_b")),
      Seq("_t", "_b"), "left_anti")
    val coarse = release(rest, "_bc")
    val coarseOk = coarse.where(col("n_users") >= k)
    val rest2 = rest.join(
      coarseOk.select(col("_t"), col("_bucket").as("_bc")),
      Seq("_t", "_bc"), "left_anti")
    val supp = rest2.groupBy(col("_t"))
      .agg(countDistinct(col("_u")).as("_nu"), count(lit(1)).as("_ne"))
      .select(col("_t"), lit(null).cast("double").as("_bucket"),
        when(col("_nu") >= k, col("_nu")).as("n_users"),
        when(col("_nu") >= k, col("_ne")).as("n_events"))

    fineOk.select(col("_t"), lit("fine").as("level"), col("_bucket"),
        col("n_users"), col("n_events"))
      .unionByName(coarseOk.select(col("_t"), lit("coarse").as("level"),
        col("_bucket"), col("n_users"), col("n_events")))
      .unionByName(supp.select(col("_t"), lit("suppressed").as("level"),
        col("_bucket"), col("n_users"), col("n_events")))
      .select(col("_t").as(typeCol), col("level"),
        col("_bucket").as("bucket_lo"), col("n_users"), col("n_events"))
  }

  /** Deterministic salted pseudonym: sha256(salt ':' id) as lowercase
    * hex — the identity-scrubbing transform that PRESERVES joinability
    * (equal ids map to equal tokens across every table pseudonymized
    * with the same salt, so downstream sessionization/retention/joins
    * still work) while the raw id never leaves the boundary. The salt
    * is the secret: without it the token is not invertible by
    * dictionary attack over the id space. Pure projection — scan
    * speed, codegen'd sha2, no shuffle; ≡ DuckDB
    * sha256(salt || ':' || id), so the oracle replays it exactly. */
  def pseudonym(id: org.apache.spark.sql.Column, salt: String)
      : org.apache.spark.sql.Column =
    sha2(concat_ws(":", lit(salt), id.cast("string")), 256)
}
